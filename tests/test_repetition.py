"""Within-doc repetition stats: hand-computed fixtures (exact integer
ratios), degenerate docs score 0.0 and survive, plan audit."""

from __future__ import annotations

import math

from duplicate_image_detector_spark.operators.repetition import (
    doc_repetition_stats,
)

DOCS = [
    (1, "aa\nbbb\naa"),      # repeated line; words [aa,bbb,aa]
    (2, "x y x y x"),        # repeated 2/3-grams, single line
    (3, "hello"),            # too short for any gram
    (4, None),               # corrupt row
    (5, "a a a a a a"),      # 6 identical words: repeated 5-grams
]

EXPECT = {
    #        dup_line  dup_line_char  top_2gram  top_3gram  dup_5gram
    1: (1 / 3, 2 / 7, 6 / 12, 9 / 9, 0.0),
    2: (0.0, 0.0, 6 / 12, 10 / 15, 0.0),
    3: (0.0, 0.0, 0.0, 0.0, 0.0),
    4: (0.0, 0.0, 0.0, 0.0, 0.0),
    5: (0.0, 0.0, 15 / 15, 16 / 16, 1 / 2),
}

COLS = [
    "dup_line_frac", "dup_line_char_frac", "top_2gram_char_frac",
    "top_3gram_char_frac", "dup_5gram_frac",
]


def test_hand_computed_fixture(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = doc_repetition_stats(df, top_ns=(2, 3), dup_n=5)
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == set(EXPECT)  # every doc survives, incl. null text
    for doc_id, want in EXPECT.items():
        for col, w in zip(COLS, want):
            g = got[doc_id][col]
            assert math.isclose(g, w, rel_tol=0, abs_tol=0), (
                f"doc {doc_id} {col}: {g} != {w}"
            )


def test_plan_has_no_cartesian(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        doc_repetition_stats(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
