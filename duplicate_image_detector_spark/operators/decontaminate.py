"""Benchmark decontamination — flag training documents that share long
exact word n-grams with an evaluation/benchmark set, the standard
pre-training hygiene pass (GPT-3 appendix C / PaLM / Llama all report
n-gram-overlap decontamination; k in the 8-13 range).

Shape: corpus-side DISTINCT k-grams (the same ``shingles_col`` kernel
the MinHash tier uses) equi-joined against the benchmark's k-grams.
The benchmark side is an eval suite — thousands of documents, not
billions — so it is explicitly ``broadcast()``: the corpus-scale gram
stream never shuffles, each task filters its grams against the in-memory
benchmark map, and the only aggregation is the per-(doc, benchmark)
match count whose key cardinality is bounded by true contamination.  If
a benchmark ever outgrows broadcast (~10^8 grams), drop the broadcast
hint and let AQE shuffle on the gram — the plan stays an equi-join.

Output: one row per (doc_id, bench_id) with ``n_shared_grams`` >=
``min_shared`` distinct shared k-grams.  Callers anti-join the flagged
doc_ids away (T2/J6 shape) or review per-benchmark counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duplicate_image_detector_spark.functions.text import (
    shingles_col,
    words_col,
)


def _gram_rows(docs: DataFrame, id_col: str, k: int) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.explode(shingles_col(words_col(F.col("text")), k)).alias("gram"),
    )


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """docs(doc_id, text) x benchmark(bench_id, text) ->
    (doc_id, bench_id, n_shared_grams), n_shared_grams >= min_shared.
    Grams are distinct per document per side (``shingles_col``), so the
    count is the size of the shared distinct-gram set."""
    d = _gram_rows(docs, "doc_id", k)
    b = _gram_rows(benchmark, "bench_id", k)
    return (
        d.join(F.broadcast(b), "gram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_shared_grams"))
        .where(F.col("n_shared_grams") >= F.lit(min_shared))
    )
