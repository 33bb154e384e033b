"""Signature stage: shingle hashes + MinHash + SimHash per document.

Analog of the reference's feature-extraction stage
(/root/reference/duplicate-detector.py:1024-1098): where the reference runs a
TorchScript model over image batches to get 1024-d vectors, we compute set
signatures over k-word shingles — entirely with built-in column expressions
(whole-stage codegen), no Python in the hot path.

Output schema (one row per doc that survives the min-length filter):
    doc_id BIGINT, n_tokens INT, n_shingles INT, text_sha256 STRING,
    shingle_hashes ARRAY<BIGINT> (distinct), minhash ARRAY<INT>,
    simhash BIGINT

``shingle_hashes`` is kept because the verify stage (exact Jaccard) needs
the sets — the analog of the reference keeping the feature matrix resident
for verification.  The heavy ``text`` column is projected away here so no
downstream shuffle carries it (SURVEY §4 column-pruning note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duplicate_image_detector_spark.config import PipelineConfig
from duplicate_image_detector_spark.functions.hashing import (
    minhash_col,
    shingle_md5_60bit_col,
    shingle_xxhash64_col,
    simhash_col,
)
from duplicate_image_detector_spark.functions.text import (
    shingles_col,
    text_sha256_col,
    words_col,
)


def compute_signatures(
    docs: DataFrame,
    cfg: PipelineConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_md5_hash: bool = False,
    keep_shingle_strings: bool = False,
) -> DataFrame:
    """docs(id, text) -> signatures.

    ``use_md5_hash=True`` switches the base shingle hash to the 60-bit md5
    variant that the DuckDB oracle can reproduce (slower; correctness gate
    and tests).  The default xxhash64 path is the at-scale choice.

    Rows with null/short text or fewer than one shingle are dropped (M2
    analog, ref :676-677 validity predicate) — never failed on (M6, ref
    :948-949).
    """
    w = words_col(F.col(text_col))
    base = docs.where(
        F.col(text_col).isNotNull()
        & (F.length(text_col) >= cfg.min_text_len)
    ).select(
        F.col(id_col).alias("doc_id"),
        text_sha256_col(F.col(text_col)).alias("text_sha256"),
        w.alias("words"),
        shingles_col(w, cfg.shingle_k).alias("shingles"),
    )
    hasher = shingle_md5_60bit_col if use_md5_hash else shingle_xxhash64_col
    hashed = base.where(F.size("shingles") > 0).select(
        "doc_id",
        "text_sha256",
        F.size("words").alias("n_tokens"),
        F.size("shingles").alias("n_shingles"),
        *( [F.col("shingles")] if keep_shingle_strings else [] ),
        F.array_distinct(hasher(F.col("shingles"))).alias("shingle_hashes"),
    )
    return hashed.select(
        "*",
        minhash_col(F.col("shingle_hashes"), cfg).alias("minhash"),
        simhash_col("shingle_hashes", cfg).alias("simhash"),
    )


def jaccard_col(hashes_a: Column, hashes_b: Column) -> Column:
    """Exact Jaccard between two distinct-element arrays (JVM-side)."""
    inter = F.size(F.array_intersect(hashes_a, hashes_b))
    union = F.size(hashes_a) + F.size(hashes_b) - inter
    return inter.cast("double") / union.cast("double")
