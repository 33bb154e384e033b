"""P3 candidate-space pruning equivalence (the reference's 'both' mode,
/root/reference/duplicate-detector.py:1798-1810): excluding exact-group
members from the near stage must not change final clusters."""

from __future__ import annotations

from duplicate_image_detector_spark.plans.pipeline import run_pipeline


def _cluster_sets(result):
    rows = result.clusters.select("url", "cluster_id").collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["url"])
    return {frozenset(v) for v in by_cluster.values()}


def test_exclude_exact_same_clusters(spark, tiny_pages_df, cfg):
    c = cfg.with_recall_banding()
    full = run_pipeline(spark, tiny_pages_df, c, enable_substring=True)
    pruned = run_pipeline(
        spark, tiny_pages_df, c, enable_substring=True, exclude_exact=True
    )
    assert _cluster_sets(full) == _cluster_sets(pruned)


def test_exclude_exact_shrinks_near_input(spark, tiny_pages_df, cfg):
    c = cfg.with_recall_banding()
    full = run_pipeline(spark, tiny_pages_df, c, enable_substring=False)
    pruned = run_pipeline(
        spark, tiny_pages_df, c, enable_substring=False, exclude_exact=True
    )
    assert pruned.signatures.count() < full.signatures.count()
