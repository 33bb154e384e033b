"""Substring-tier unit tests: LCS correctness, sampling guarantee."""

from __future__ import annotations

import random

from duplicate_image_detector_spark.config import PipelineConfig
from duplicate_image_detector_spark.operators.substring import (
    py_longest_common_substring,
    py_select_fingerprints,
    substring_pairs,
)


def test_lcs_known_answers():
    assert py_longest_common_substring("abcdef", "zabcq") == 3  # "abc"
    assert py_longest_common_substring("aaaa", "aaaa") == 4
    assert py_longest_common_substring("abc", "xyz") == 0
    assert py_longest_common_substring("", "abc") == 0
    a = "x" * 100 + "SHARED SPAN HERE" + "y" * 50
    b = "q" * 30 + "SHARED SPAN HERE" + "r" * 80
    assert py_longest_common_substring(a, b) == len("SHARED SPAN HERE")


def test_fingerprints_detect_shared_span():
    """Two texts sharing a >= L span share at least one selected
    fingerprint (content-defined selection is position-independent)."""
    cfg = PipelineConfig()
    rng = random.Random(1)
    span = "".join(rng.choice("abcdefgh ") for _ in range(cfg.substring_min_len + 50))
    t1 = "".join(rng.choice("ijklmnop ") for _ in range(1000)) + span
    t2 = span + "".join(rng.choice("qrstuvwx ") for _ in range(1000))
    f1 = py_select_fingerprints(t1, cfg.substring_gram, cfg.substring_mod)
    f2 = py_select_fingerprints(t2, cfg.substring_gram, cfg.substring_mod)
    assert f1 & f2, "shared span selected no common fingerprint"


def test_fingerprints_no_false_sharing():
    rng = random.Random(2)
    t1 = "".join(rng.choice("abcdefgh ") for _ in range(2000))
    t2 = "".join(rng.choice("abcdefgh ") for _ in range(2000))
    cfg = PipelineConfig()
    f1 = py_select_fingerprints(t1, cfg.substring_gram, cfg.substring_mod)
    f2 = py_select_fingerprints(t2, cfg.substring_gram, cfg.substring_mod)
    assert not (f1 & f2)


def test_anchored_span_matches_automaton():
    """The anchored-extension verifier agrees with the exact suffix-
    automaton LCS whenever the optimal span contains a selected gram —
    the stage's own sampling guarantee (misses are the budgeted
    (1-1/s)^(L-k+1) event, not an algorithmic error)."""
    from duplicate_image_detector_spark.operators.substring import (
        py_anchored_span,
        py_select_fingerprint_positions,
    )

    cfg = PipelineConfig()
    k, mod = cfg.substring_gram, cfg.substring_mod
    rng = random.Random(9)

    def rnd(n, alpha="abcdefghij "):
        return "".join(rng.choice(alpha) for _ in range(n))

    for _ in range(25):
        span = rnd(rng.randrange(380, 1500))
        ta = rnd(rng.randrange(500, 3000)) + span + rnd(rng.randrange(0, 2000))
        tb = rnd(rng.randrange(0, 2000)) + span + rnd(rng.randrange(500, 3000))
        fa = py_select_fingerprint_positions(ta, k, mod)
        fb = py_select_fingerprint_positions(tb, k, mod)
        assert py_anchored_span(ta, tb, fa, fb, k) == py_longest_common_substring(ta, tb)


def test_substring_pairs_end_to_end(spark, cfg):
    rng = random.Random(3)
    span = " ".join(f"tok{rng.randrange(5000):04d}" for _ in range(80))
    mk = lambda: " ".join(f"tok{rng.randrange(5000):04d}" for _ in range(300))
    rows = [
        (1, mk() + " " + span),
        (2, span + " " + mk()),
        (3, mk()),
        (4, mk()),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in substring_pairs(df, cfg).collect()
    }
    assert got == {(1, 2)}
