"""LSH candidate generation: band explode -> bucket equi-self-join.

Replaces (not ports) the reference's O(n²) blocked all-pairs similarity
theta-join (/root/reference/duplicate-detector.py:1385-1436, the blocked
``np.dot`` at :1404-1415): MinHash signatures are banded, documents sharing
any (band_id, band_hash) bucket become candidate pairs, canonicalized to
``id_a < id_b`` (the reference's upper-triangle enumeration, ref :1420) and
de-duplicated across bands (a pair can collide in several bands; the
reference never double-counts because it enumerates pairs exactly once).

Skew (SURVEY §4 custom-logic item 1): boilerplate/template pages put huge
document sets into one bucket, and the join output grows O(|bucket|²) —
AQE's skew-join split bounds per-task input, not that quadratic output.  The
engine therefore computes bucket sizes first and routes:

  * size <= max_bucket  -> full within-bucket self-join (AQE skew split
    handles residual partition imbalance),
  * size >  max_bucket  -> pivot pairing: every member pairs with the
    bucket's min doc_id only (O(|bucket|) pairs).  Members of such a bucket
    agree on an entire signature band, i.e. they are near-identical; the
    verify + connected-components stages recover the full cluster through
    the pivot.  The recall cost of this cap is part of the 0.99 budget and
    is measured in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duplicate_image_detector_spark.config import PipelineConfig
from duplicate_image_detector_spark.functions.hashing import band_structs_col


def explode_bands(sig: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """signatures -> (doc_id, band_id, band_hash), one row per band."""
    return sig.select(
        "doc_id",
        F.explode(band_structs_col(F.col("minhash"), cfg)).alias("b"),
    ).select("doc_id", F.col("b.band_id"), F.col("b.band_hash"))


def lsh_candidate_pairs(
    sig: DataFrame,
    cfg: PipelineConfig,
    cache_registry: list | None = None,
) -> DataFrame:
    """signatures -> distinct candidate (id_a, id_b), id_a < id_b.

    Bucket stats come from a partial-aggregating ``groupBy`` joined back to
    the band rows — NOT a ``Window.partitionBy(band_id, band_hash)``: the
    window routes every row of a hot bucket (a 50M-row boilerplate bucket at
    webtext scale) through ONE task just to be counted, while the groupBy
    counts map-side in parallel and the (small: multi-member buckets only)
    stats table broadcasts back under AQE.

    The joined band rows for multi-member buckets — a tiny fraction of the
    corpus — are persisted eagerly so the within-bucket self-join reads a
    cached table instead of recomputing the band explode + stats join on
    both sides (measured 45s -> ~8s at 500k docs); the cache is dropped
    before returning (the output itself is persisted instead, and callers
    that checkpoint it may ``unpersist()`` afterwards).
    """
    from pyspark.storagelevel import StorageLevel

    bands = explode_bands(sig, cfg)
    stats = (
        bands.groupBy("band_id", "band_hash")
        .agg(
            F.count("*").alias("bucket_size"),
            F.min("doc_id").alias("pivot_id"),
        )
        .where(F.col("bucket_size") >= 2)
    )
    multi = bands.join(stats, ["band_id", "band_hash"]).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    multi.count()  # eager: both self-join sides read the cache

    normal = multi.where(F.col("bucket_size") <= cfg.max_bucket)
    left = normal.select("band_id", "band_hash", F.col("doc_id").alias("id_a"))
    right = normal.select("band_id", "band_hash", F.col("doc_id").alias("id_b"))
    joined = left.join(right, ["band_id", "band_hash"]).where(
        F.col("id_a") < F.col("id_b")
    )

    pivoted = (
        multi.where(F.col("bucket_size") > cfg.max_bucket)
        .where(F.col("doc_id") != F.col("pivot_id"))
        .select(F.col("pivot_id").alias("id_a"), F.col("doc_id").alias("id_b"))
    )

    out = joined.select("id_a", "id_b").union(pivoted).dropDuplicates(
        ["id_a", "id_b"]
    )
    if cache_registry is not None:
        # deferred mode: the caller unions/filters this output and
        # materializes ONCE — skipping the per-arm persist+count saves a
        # whole job; the band cache is handed to the caller to release
        # after that materialization
        cache_registry.append(multi)
        return out
    out = out.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    multi.unpersist()
    return out
