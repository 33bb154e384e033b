"""Repeated-line removal: hand-built fixtures with known answers, the
idempotence invariants both modes claim, corrupt-row tolerance, and the
no-quadratic plan audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from duplicate_image_detector_spark.operators.linedup import (
    line_stats,
    remove_repeated_lines,
)

BOILER = "COOKIE BANNER"
DOCS = [
    # (doc_id, text): docs 1-3 share the banner; doc 2 has a blank line
    # and an indented copy of the banner (trim-identity); doc 3 repeats
    # its own body line twice (within-doc duplicate for 'first' mode)
    (1, f"{BOILER}\nalpha content one"),
    (2, f"beta content two\n\n  {BOILER}  "),
    (3, f"{BOILER}\ngamma content\ngamma content"),
    (4, "delta content only"),
    (5, None),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _by_id(out):
    return {r["doc_id"]: r for r in out.collect()}


def test_line_stats(spark):
    got = {
        r["line"]: (r["df"], r["n_occurrences"])
        for r in line_stats(_df(spark), min_df=2).collect()
    }
    # banner: 3 docs, one occurrence each (doc 2's is indented but
    # trim-identical); 'gamma content': 1 doc, 2 occ -> df threshold
    # excludes it
    assert got == {BOILER: (3, 3)}


def test_df_cap_removal(spark):
    out = _by_id(remove_repeated_lines(_df(spark), max_df=2, mode="df_cap"))
    assert out[1]["text"] == "alpha content one"
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (2, 1)
    # blank line survives; original (untrimmed) bytes of kept lines kept
    assert out[2]["text"] == "beta content two\n"
    assert out[2]["n_removed"] == 1
    # within-doc repetition is NOT df_cap's business (df('gamma')=1)
    assert out[3]["text"] == "gamma content\ngamma content"
    assert out[4]["text"] == "delta content only"
    assert out[4]["n_removed"] == 0
    # null text -> empty doc, still present (M6 tolerance)
    assert (out[5]["text"], out[5]["n_lines"]) == ("", 1)


def test_first_mode_keeps_global_first(spark):
    out = _by_id(remove_repeated_lines(_df(spark), mode="first"))
    # banner's first occurrence is (doc 1, line 0): doc 1 keeps it
    assert out[1]["text"] == f"{BOILER}\nalpha content one"
    # doc 2's indented copy dropped (trim identity), blank kept
    assert out[2]["text"] == "beta content two\n"
    # doc 3: banner dropped (doc 1 was first), second 'gamma content'
    # dropped (its own line 1 was the global first)
    assert out[3]["text"] == "gamma content"
    assert out[3]["n_removed"] == 2


def test_both_modes_idempotent(spark):
    for mode in ("df_cap", "first"):
        once = remove_repeated_lines(_df(spark), max_df=2, mode=mode)
        twice = remove_repeated_lines(
            once.select("doc_id", "text"), max_df=2, mode=mode
        )
        a = {(r["doc_id"], r["text"]) for r in once.collect()}
        b = {(r["doc_id"], r["text"]) for r in twice.collect()}
        assert a == b, mode
        assert all(r["n_removed"] == 0 for r in twice.collect()), mode


def test_every_doc_survives_even_all_boilerplate(spark):
    docs = spark.createDataFrame(
        [(i, "SAME LINE") for i in range(10)], "doc_id long, text string"
    )
    out = _by_id(remove_repeated_lines(docs, max_df=3, mode="df_cap"))
    assert len(out) == 10
    assert all(v["text"] == "" and v["n_removed"] == 1 for v in out.values())


def test_plan_has_no_cartesian(spark):
    for mode in ("df_cap", "first"):
        plan = remove_repeated_lines(
            _df(spark), max_df=2, mode=mode
        )._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, mode
        assert "BroadcastNestedLoopJoin" not in plan, mode


# ---------------------------------------------------------------------------
# paragraph unit (RefinedWeb/Dolma repeated-paragraph removal)
# ---------------------------------------------------------------------------

PBOILER = "Subscribe to our newsletter.\nGet updates weekly."
PDOCS = [
    # the boilerplate PARAGRAPH contains a single newline — line mode
    # would see two lines, paragraph mode one unit; docs 1-3 share it
    (1, f"{PBOILER}\n\nreal body one\nwith a second line"),
    (2, f"real body two\n\n\n  {PBOILER}  "),   # 3-newline gap + padding
    (3, f"{PBOILER}\n\nreal body three\n\nreal body three"),
    (4, "only body\n\nanother paragraph"),
    (5, None),
]


def _pdf(spark):
    return spark.createDataFrame(PDOCS, "doc_id long, text string")


def test_paragraph_stats(spark):
    got = {
        r["line"]: (r["df"], r["n_occurrences"])
        for r in line_stats(_pdf(spark), unit="paragraph").collect()
    }
    # default min_df=2: only the cross-doc boilerplate paragraph — the
    # within-doc repeat in doc 3 has df=1 and is excluded
    assert got == {PBOILER: (3, 3)}
    got1 = {
        r["line"]: (r["df"], r["n_occurrences"])
        for r in line_stats(_pdf(spark), min_df=1, unit="paragraph").collect()
    }
    assert got1[PBOILER] == (3, 3)
    assert got1["real body three"] == (1, 2)


def test_paragraph_df_cap_removal(spark):
    out = _by_id(
        remove_repeated_lines(_pdf(spark), max_df=2, unit="paragraph")
    )
    assert out[1]["text"] == "real body one\nwith a second line"
    assert out[2]["text"] == "real body two"
    # doc 3: boilerplate stripped, both body copies kept (df_cap is
    # cross-doc), separator normalized to one blank line
    assert out[3]["text"] == "real body three\n\nreal body three"
    assert out[4]["text"] == "only body\n\nanother paragraph"
    assert out[5]["text"] == ""
    assert out[1]["n_removed"] == 1 and out[4]["n_removed"] == 0


def test_paragraph_first_mode(spark):
    out = _by_id(
        remove_repeated_lines(_pdf(spark), mode="first", unit="paragraph")
    )
    # global first occurrence of the boilerplate is (doc 1, pos 0); the
    # within-doc repeat in doc 3 keeps only its first copy
    assert out[1]["text"].startswith(PBOILER)
    assert PBOILER not in out[2]["text"]
    assert out[3]["text"].count("real body three") == 1


def test_paragraph_modes_idempotent(spark):
    for mode in ("df_cap", "first"):
        once = remove_repeated_lines(
            _pdf(spark), max_df=2, mode=mode, unit="paragraph"
        ).select("doc_id", "text")
        twice = remove_repeated_lines(
            once, max_df=2, mode=mode, unit="paragraph"
        ).select("doc_id", "text")
        a = {r["doc_id"]: r["text"] for r in once.collect()}
        b = {r["doc_id"]: r["text"] for r in twice.collect()}
        assert a == b, mode


def test_paragraph_matches_python_oracle(spark):
    # pure-Python re-implementation of df_cap paragraph removal
    import re
    from collections import Counter

    split = {i: re.split(r"\n{2,}", t or "") for i, t in PDOCS}
    df = Counter()
    for i, parts in split.items():
        for p in {p.strip() for p in parts if p.strip()}:
            df[p] += 1
    max_df = 2
    want = {
        i: "\n\n".join(p for p in parts if df[p.strip()] <= max_df or not p.strip())
        for i, parts in split.items()
    }
    out = _by_id(
        remove_repeated_lines(_pdf(spark), max_df=max_df, unit="paragraph")
    )
    for i in want:
        assert out[i]["text"] == want[i], i
