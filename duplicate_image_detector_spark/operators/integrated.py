"""Integrated metadata-bonus scoring — the reference's 'integrated' mode.

Transplant of /root/reference/duplicate-detector.py:1438-1530
(``find_integrated_candidates``): each candidate pair gets

    metadata_match   = 1.0 iff both sides carry a non-null metadata key
                       and the keys are equal (ref :1492-1499)
    integrated_score = sscd_weight * sim + metadata_weight * metadata_match
                       (ref :1501-1505; weights 0.85 / 0.15, ref :395-396)

and survives iff ANY of the triple predicate holds (ref :1506-1511):

    (metadata_match AND sim >= threshold_with_metadata)     # 0.90
    OR (NOT metadata_match AND sim >= threshold)            # 0.86
    OR (integrated_score >= integrated_threshold)           # 0.88

For webtext, ``sim`` is the exact shingle Jaccard and the metadata key is
any equality-comparable column set (the gate uses (lang, source); the
pipeline uses (lang, url host) — the analog of the reference's camera/EXIF
key, ref :1366-1383).

All column arithmetic post-join: no shuffle beyond the two metadata hash
joins (broadcast when the metadata projection is small), bit-exact
cross-engine (sim is integer-derived, the weights are exact binary
fractions' sums of IEEE products evaluated in the same order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SSCD_WEIGHT = 0.85          # ref :395 sscd_weight
METADATA_WEIGHT = 0.15      # ref :396 metadata_weight
THRESHOLD = 0.86            # ref :392 sscd_threshold
THRESHOLD_WITH_METADATA = 0.90   # ref :393 sscd_threshold_with_metadata
INTEGRATED_THRESHOLD = 0.88      # ref :397 integrated_threshold


def metadata_key_col(*cols: Column) -> Column:
    """Composite metadata key: null if ANY part is null (the reference
    treats missing metadata as 'no key', ref :1494-1496), else the parts
    joined with an unambiguous separator."""
    key = F.concat_ws("\x1f", *cols)
    any_null = None
    for c in cols:
        cond = c.isNull()
        any_null = cond if any_null is None else (any_null | cond)
    return F.when(any_null, F.lit(None).cast("string")).otherwise(key)


def integrated_pairs(
    pairs: DataFrame,
    meta: DataFrame,
    sim_col: str = "jaccard",
    id_col: str = "doc_id",
    key_col: str = "meta_key",
    sscd_weight: float = SSCD_WEIGHT,
    metadata_weight: float = METADATA_WEIGHT,
    threshold: float = THRESHOLD,
    threshold_with_metadata: float = THRESHOLD_WITH_METADATA,
    integrated_threshold: float = INTEGRATED_THRESHOLD,
) -> DataFrame:
    """pairs(id_a, id_b, sim) x meta(doc_id, meta_key) -> accepted pairs
    with (metadata_match, integrated_score, has_metadata_bonus).

    ``pairs`` must be PRE-thresholded no higher than the integrated mode's
    effective floor (integrated_threshold - metadata_weight) / sscd_weight
    — e.g. 0.8588 at the pinned constants — or metadata-bonus pairs are
    lost before scoring.
    """
    a = meta.select(
        F.col(id_col).alias("id_a"), F.col(key_col).alias("_ka")
    )
    b = meta.select(
        F.col(id_col).alias("id_b"), F.col(key_col).alias("_kb")
    )
    sim = F.col(sim_col)
    match = F.when(
        F.col("_ka").isNotNull()
        & F.col("_kb").isNotNull()
        & (F.col("_ka") == F.col("_kb")),
        F.lit(1.0),
    ).otherwise(F.lit(0.0))
    # LEFT joins: a pair whose endpoint has no meta row is metadata_match=0
    # (the reference's "missing metadata = no key", ref :1494-1496), never
    # silently dropped — callers may pass partial meta tables
    scored = (
        pairs.join(a, "id_a", "left")
        .join(b, "id_b", "left")
        .withColumn("metadata_match", match)
        .withColumn(
            "integrated_score",
            F.lit(sscd_weight) * sim
            + F.lit(metadata_weight) * F.col("metadata_match"),
        )
    )
    accept = (
        ((F.col("metadata_match") == 1.0) & (sim >= F.lit(threshold_with_metadata)))
        | ((F.col("metadata_match") == 0.0) & (sim >= F.lit(threshold)))
        | (F.col("integrated_score") >= F.lit(integrated_threshold))
    )
    return scored.where(accept).select(
        "id_a",
        "id_b",
        sim.alias(sim_col),
        "metadata_match",
        "integrated_score",
        (F.col("metadata_match") > 0.0).alias("has_metadata_bonus"),
    )
