"""Exact-duplicate tier: byte-identical text grouped by sha256.

Analog of the reference's metadata-key grouping
(/root/reference/duplicate-detector.py:1346-1383): hash-group by a cheap
exact key, keep groups of size >= 2 (MIN_GROUP_SIZE=2, ref :99).

One shuffle (hash aggregate on the 64-hex key); cluster_id = min(doc_id) of
the group — deterministic under any partitioning, unlike the reference's
enumeration counter ids (ref :1932).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duplicate_image_detector_spark.config import PipelineConfig
from duplicate_image_detector_spark.functions.text import text_sha256_col


def exact_clusters(
    docs: DataFrame,
    cfg: PipelineConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_col: Column | None = None,
    tier: str = "exact",
) -> DataFrame:
    """docs -> (doc_id, cluster_id, tier='exact') for duplicated texts.

    ``key_col`` overrides the grouping key (default: sha256 of the full
    text) — e.g. a prefix hash for coarser "same lead paragraph" grouping;
    the plan is identical either way.

    GroupBy + join-back instead of a ``Window.partitionBy(text_sha256)``
    (and instead of groupBy+collect_list): the partial-aggregating groupBy
    counts a pathological million-row exact group (common in webtext: empty
    pages, error pages) map-side in parallel, where the window would route
    the whole group through one task; no per-group array ever materializes
    (SURVEY §2.4 A1 scale note).  The stats side holds only duplicated
    hashes, so AQE broadcasts it and the join back never shuffles the
    corpus-side rows.
    """
    key = key_col if key_col is not None else text_sha256_col(F.col(text_col))
    keyed = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        key.alias("text_sha256"),
    )
    stats = (
        keyed.groupBy("text_sha256")
        .agg(F.min("doc_id").alias("cluster_id"), F.count("*").alias("_n"))
        .where(F.col("_n") >= 2)
    )
    return keyed.join(stats, "text_sha256").select(
        "doc_id", "cluster_id", F.lit(tier).alias("tier")
    )


def exact_pair_edges(exact: DataFrame) -> DataFrame:
    """Exact clusters as star edges (doc -> group min) for unified CC."""
    return (
        exact.where(F.col("doc_id") != F.col("cluster_id"))
        .select(
            F.col("cluster_id").alias("id_a"),
            F.col("doc_id").alias("id_b"),
        )
    )
