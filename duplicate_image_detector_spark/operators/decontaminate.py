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
    from duplicate_image_detector_spark.partitioning import (
        ensure_min_parallelism,
    )

    # corpus-side parallelism floor: the gram explode is the interpreted
    # zip_with chain (~1 ms/KB — Catalyst does not codegen HOF lambdas), so
    # a 16 KB split already outweighs task overhead; a one-row-group input
    # would otherwise run the whole corpus on a single task (no-op on
    # already-parallel inputs).  Measured at sf0.1: 2.6 s -> 1.3 s steady
    # state, 7.8 s -> 1.6 s first run.
    d = _gram_rows(
        ensure_min_parallelism(docs, target_bytes=16 << 10), "doc_id", k
    )
    b = _gram_rows(benchmark, "bench_id", k)
    return (
        d.join(F.broadcast(b), "gram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_shared_grams"))
        .where(F.col("n_shared_grams") >= F.lit(min_shared))
    )
