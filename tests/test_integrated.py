"""Integrated metadata-bonus scoring (ref duplicate-detector.py:1438-1530):
triple-predicate truth table + end-to-end pipeline mode."""

from __future__ import annotations

from duplicate_image_detector_spark.operators.integrated import (
    integrated_pairs,
    metadata_key_col,
)
from pyspark.sql import functions as F


def test_triple_predicate_truth_table(spark):
    # (id_a, id_b, sim) with meta keys chosen to hit each clause
    pairs = spark.createDataFrame(
        [
            (1, 2, 0.87),   # match=1: integrated 0.8895 >= 0.88 -> accept (bonus)
            (3, 4, 0.87),   # match=0: plain 0.87 >= 0.86        -> accept
            (5, 6, 0.85),   # match=0: 0.85 < 0.86, int 0.7225    -> reject
            (7, 8, 0.86),   # match=1: int 0.881 >= 0.88          -> accept (bonus)
            (9, 10, 0.91),  # match=1: 0.91 >= 0.90               -> accept (bonus)
            (11, 12, 0.84), # match=1: int 0.864 < 0.88, 0.84<0.90 -> reject
            (13, 14, 0.87), # key null on one side -> match=0     -> accept plain
        ],
        "id_a long, id_b long, jaccard double",
    )
    same = [(i, "en|siteA") for i in (1, 2, 7, 8, 9, 10, 11, 12, 13)]
    diff = [(3, "en|siteA"), (4, "de|siteB"), (5, "en|siteA"), (6, "fr|siteC")]
    nul = [(14, None)]
    meta = spark.createDataFrame(same + diff + nul, "doc_id long, meta_key string")
    got = {
        (r["id_a"], r["id_b"]): (r["metadata_match"], r["has_metadata_bonus"])
        for r in integrated_pairs(pairs, meta).collect()
    }
    assert set(got) == {(1, 2), (3, 4), (7, 8), (9, 10), (13, 14)}
    assert got[(1, 2)] == (1.0, True)
    assert got[(3, 4)] == (0.0, False)
    assert got[(7, 8)] == (1.0, True)
    assert got[(9, 10)] == (1.0, True)
    assert got[(13, 14)] == (0.0, False)


def test_metadata_key_null_propagation(spark):
    df = spark.createDataFrame(
        [("en", "a.com"), (None, "a.com"), ("en", None), (None, None)],
        "lang string, host string",
    )
    rows = df.select(
        metadata_key_col(F.col("lang"), F.col("host")).alias("k")
    ).collect()
    assert [r["k"] is None for r in rows] == [False, True, True, True]


def test_pipeline_integrated_mode(spark, tiny_pages_df, cfg, tmp_path):
    from duplicate_image_detector_spark.plans.pipeline import run_pipeline

    c = cfg.with_recall_banding()
    plain = run_pipeline(spark, tiny_pages_df, c, enable_substring=False)
    integ = run_pipeline(
        spark, tiny_pages_df, c, enable_substring=False, mode="integrated"
    )
    n_plain = plain.pairs.where(F.col("tier") == "near").count()
    n_integ = integ.pairs.where(F.col("tier") == "near").count()
    # integrated mode can only widen the accepted near set (metadata bonus
    # lowers the effective floor; nothing above 0.86 is ever dropped when
    # metadata matches or is absent) -- on the fixture corpus (same lang,
    # same host scheme) it must be a superset
    assert n_integ >= n_plain > 0
    # integrated near edges carry the weighted score, bounded by the rule
    s = integ.pairs.where(F.col("tier") == "near").agg(
        F.min("score").alias("lo"), F.max("score").alias("hi")
    ).collect()[0]
    assert s["lo"] >= 0.85 * 0.8 and s["hi"] <= 1.0


def test_partial_meta_table_not_dropped(spark):
    """A pair endpoint with NO meta row at all behaves like a null key
    (match=0, plain clause applies) — not silently dropped."""
    pairs = spark.createDataFrame(
        [(1, 2, 0.95)], "id_a long, id_b long, jaccard double"
    )
    meta = spark.createDataFrame([(1, "en|a")], "doc_id long, meta_key string")
    got = integrated_pairs(pairs, meta).collect()
    assert len(got) == 1
    assert got[0]["metadata_match"] == 0.0
