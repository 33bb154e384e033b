"""MinHash unbiasedness, SimHash parity, banding collision behavior."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from duplicate_image_detector_spark.config import PipelineConfig
from duplicate_image_detector_spark.functions.hashing import (
    band_structs_col,
    hamming_col,
    minhash_col,
    py_md5_60bit,
    py_simhash,
    shingle_md5_60bit_col,
    simhash_col,
)


def test_md5_60bit_parity(spark):
    """Spark conv(md5) == python int(md5 hex[:15],16) == duckdb hex cast."""
    words = ["alpha beta", "gamma", "x 1 2 3", ""]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = dict(
        df.select(
            "s",
            F.element_at(
                shingle_md5_60bit_col(F.array(F.col("s"))), 1
            ).alias("h"),
        ).collect()
    )
    import duckdb

    for w in words:
        expected = py_md5_60bit(w)
        assert got[w] == expected
        duck = duckdb.sql(
            f"select ('0x' || substr(md5('{w}'),1,15))::BIGINT"
        ).fetchone()[0]
        assert duck == expected


def test_simhash_parity_and_hamming(spark, cfg):
    hashes = [py_md5_60bit(f"sh{i}") for i in range(40)]
    expected = py_simhash(hashes, cfg.simhash_bits)
    df = spark.createDataFrame([(hashes,)], "h array<bigint>")
    got = df.select(simhash_col("h", cfg).alias("s")).collect()[0]["s"]
    assert got == expected
    # hamming of a fingerprint with itself is 0; with one flipped bit, 1
    d2 = spark.createDataFrame([(expected, expected ^ 1)], "a long, b long")
    r = d2.select(
        hamming_col(F.col("a"), F.col("a")).alias("h0"),
        hamming_col(F.col("a"), F.col("b")).alias("h1"),
    ).collect()[0]
    assert (r["h0"], r["h1"]) == (0, 1)


def test_minhash_estimates_jaccard(spark):
    """E[fraction of matching signature slots] == Jaccard (within noise)."""
    cfg = PipelineConfig()
    base = [f"shingle-{i}" for i in range(200)]
    # sets with known jaccard: share 150 of (200 + 50) => j = 150/250 = 0.6
    sa = base
    sb = base[:150] + [f"other-{i}" for i in range(50)]
    ha = [py_md5_60bit(s) for s in sa]
    hb = [py_md5_60bit(s) for s in sb]
    df = spark.createDataFrame([(ha, hb)], "a array<bigint>, b array<bigint>")
    row = df.select(
        minhash_col(F.col("a"), cfg).alias("ma"),
        minhash_col(F.col("b"), cfg).alias("mb"),
    ).collect()[0]
    matches = sum(1 for x, y in zip(row["ma"], row["mb"]) if x == y)
    est = matches / cfg.n_perm
    assert abs(est - 0.6) < 0.15, est


def test_band_structs(spark, cfg):
    sig = list(range(cfg.n_perm))
    df = spark.createDataFrame([(sig,), (sig,)], "m array<int>")
    rows = df.select(
        F.explode(band_structs_col(F.col("m"), cfg)).alias("b")
    ).select("b.band_id", "b.band_hash").collect()
    assert len(rows) == 2 * cfg.bands
    # identical signatures -> identical band hashes, band ids 0..bands-1
    by_band: dict[int, set[int]] = {}
    for r in rows:
        by_band.setdefault(r["band_id"], set()).add(r["band_hash"])
    assert sorted(by_band) == list(range(cfg.bands))
    assert all(len(v) == 1 for v in by_band.values())


def test_identical_sets_always_collide(spark, cfg):
    """Two docs with equal shingle sets share every band -> always a
    candidate, regardless of banding parameters."""
    hs = [py_md5_60bit(f"s{i}") for i in range(30)]
    df = spark.createDataFrame([(1, hs), (2, hs)], "doc_id long, h array<bigint>")
    sigs = df.select("doc_id", minhash_col(F.col("h"), cfg).alias("minhash"))
    p = (
        sigs.select("doc_id", F.explode(band_structs_col(F.col("minhash"), cfg)).alias("b"))
        .groupBy("b")
        .count()
    )
    assert p.where(F.col("count") == 2).count() == cfg.bands


# ---------------------------------------------------------------------------
# plan_lsh (S-curve banding planner)
# ---------------------------------------------------------------------------

def test_plan_lsh_steepens_with_threshold():
    from duplicate_image_detector_spark.functions.hashing import plan_lsh

    rows = [plan_lsh(t)["rows_per_band"] for t in (0.3, 0.5, 0.7, 0.86, 0.95)]
    assert rows == sorted(rows), rows          # higher t -> steeper curve
    assert rows[0] < rows[-1]


def test_plan_lsh_s50_tracks_threshold():
    from duplicate_image_detector_spark.functions.hashing import plan_lsh

    for t in (0.4, 0.6, 0.86):
        got = plan_lsh(t)
        assert abs(got["s50"] - t) < 0.08, (t, got)
        assert got["n_perm_used"] <= 128
        assert 0.0 < got["p_at_threshold"] < 1.0
        assert got["p_at_half_threshold"] < got["p_at_threshold"]


def test_plan_lsh_recall_bias_flattens_curve():
    from duplicate_image_detector_spark.functions.hashing import plan_lsh

    sym = plan_lsh(0.86)
    biased = plan_lsh(0.86, weight_fn=20.0)
    assert biased["rows_per_band"] < sym["rows_per_band"]
    assert biased["p_at_threshold"] > sym["p_at_threshold"]
    # heavy recall bias approaches the repo's shipped 16x8 shape: at
    # least as many bands as the pinned config needs for recall 1.0
    assert biased["bands"] >= 8


def test_plan_lsh_validates_inputs():
    import pytest as _pytest

    from duplicate_image_detector_spark.functions.hashing import plan_lsh

    with _pytest.raises(ValueError):
        plan_lsh(0.0)
    with _pytest.raises(ValueError):
        plan_lsh(1.0)
    with _pytest.raises(ValueError):
        plan_lsh(0.5, n_perm=1)
