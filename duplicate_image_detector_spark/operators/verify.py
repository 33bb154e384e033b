"""Verification stage: exact Jaccard + SimHash Hamming per candidate pair.

Analog of the reference's expensive geometric verification
(/root/reference/duplicate-detector.py:1237-1279, ORB+RANSAC in a process
pool at :1690-1742): candidates from the cheap stage are re-checked with the
exact metric before grouping — the staged cheap-filter-then-expensive-verify
ordering the reference hand-rolls (P1, ref :1421 -> :1237) is preserved
structurally here.

Unlike the reference (Python workers), verification is a pair of hash joins
pulling each side's distinct shingle-hash set plus an ``array_intersect``
size ratio — all JVM.  The reference's pure-function worker contract
(:1670-1688) has no Python analog left to honor: there is no Python at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duplicate_image_detector_spark.config import PipelineConfig
from duplicate_image_detector_spark.functions.hashing import hamming_col
from duplicate_image_detector_spark.operators.signatures import jaccard_col

#: candidate-pair count at or below which the batch pipeline BROADCASTS
#: the endpoint payload (shingle sets + simhash) into the verify joins
#: instead of materializing the shingle_sets stage as its own pass.
#: score_pairs joins the payload on both pair sides; Spark's exchange
#: reuse evaluates a broadcast subtree ONCE per job (verified
#: empirically: the payload kernel processes each row exactly once), so
#: the broadcast path folds the whole stage into the verify action — one
#: checkpoint-stage barrier fewer.  Sizing: endpoint rows carry the full
#: shingle array (~1-80 KB each); 2 x 20k rows stays well under typical
#: executor broadcast budgets even at the 80 KB tail.  Above the cap the
#: pipeline keeps the eager shingle_sets stage, which scales to
#: arbitrarily large candidate sets.  (incremental_near_pairs measured
#: the same fold as a NET LOSS at 10x corpus size — its payload pass is
#: not a stage barrier — and deliberately keeps the persisted path; see
#: the note there.)
PAYLOAD_BROADCAST_PAIRS = 20_000


def score_pairs(pairs: DataFrame, sig: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """(id_a, id_b) -> + (jaccard double, hamming int).

    Two hash joins (J4 analog, ref :1251-1252); sort-merge at scale, AQE
    picks broadcast when the signature projection is small.
    """
    a = sig.select(
        F.col("doc_id").alias("id_a"),
        F.col("shingle_hashes").alias("_ha"),
        F.col("simhash").alias("_sa"),
    )
    b = sig.select(
        F.col("doc_id").alias("id_b"),
        F.col("shingle_hashes").alias("_hb"),
        F.col("simhash").alias("_sb"),
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            jaccard_col(F.col("_ha"), F.col("_hb")).alias("jaccard"),
            hamming_col(F.col("_sa"), F.col("_sb")).cast("int").alias("hamming"),
        )
    )


def verify_pairs(pairs: DataFrame, sig: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Candidates -> verified near-dup pairs.

    Admission rule (SURVEY §7.0 pinned config): exact Jaccard >=
    ``cfg.jaccard_threshold`` OR SimHash Hamming distance <=
    ``cfg.simhash_hamming_max`` ("near-exact") — the OR arm admits
    near-identical docs whose Jaccard dips below the threshold (e.g. short
    docs where one substitution moves k shingles).  The Jaccard threshold
    is the reference's sscd_threshold 0.86 (ref :391); the candidate set
    must cover both arms (LSH buckets for Jaccard, pigeonhole banding for
    Hamming — ``plans/pipeline.py`` unions them).

    Output: (id_a, id_b, jaccard, hamming, tier='near').
    """
    scored = score_pairs(pairs, sig, cfg)
    return scored.where(
        (F.col("jaccard") >= cfg.jaccard_threshold)
        | (F.col("hamming") <= cfg.simhash_hamming_max)
    ).select("*", F.lit("near").alias("tier"))
