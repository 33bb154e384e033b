"""Sequence packing — assign documents to fixed-token-budget training
sequences, the last step of an LLM data pipeline before tensorization.

Policy implemented: **concat-then-chunk** (the GPT/Pile convention):
documents are laid end-to-end in a deterministic order and the token
stream is cut every ``max_tokens``; a document's sequence is the chunk
its first token lands in.  This is expressible as pure window
arithmetic — an exclusive-prefix token sum per shard — so the whole
operator is one hash partition + one within-partition sort, no UDF, no
driver state, and bit-identical at any parallelism.

Scale shape: a GLOBAL prefix sum would serialize on one partition, so
the stream is sharded first (``pmod(doc_id, n_shards)``) and each shard
packs independently — shards are embarrassingly parallel and a training
job reads ``(shard, seq)`` as the sequence key.  ``n_shards`` trades
packing granularity for parallelism; at 10^12 docs you run 10^5 shards
and every executor owns complete shards.  The within-shard sort is by
``doc_id`` — at scale the ingest key (crawl order) — so packing is
reproducible run-to-run, which training-data lineage requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from duplicate_image_detector_spark.functions.text import words_col


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 2048,
    n_shards: int = 32,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """docs -> (id, n_tokens, shard, seq, offset_in_seq).

    ``seq`` = chunk index within the shard where the document STARTS
    (floor(exclusive-prefix-sum / max_tokens)); ``offset_in_seq`` = its
    first token's position inside that chunk.  A document longer than
    the remaining chunk budget spills into the next chunk(s) — that is
    the concat-then-chunk semantics, not a bug; callers wanting
    no-split packing filter on ``offset_in_seq + n_tokens``.

    ``tokens_col`` names a precomputed token-count column (e.g. from a
    real tokenizer); default derives whitespace/alnum token counts from
    ``text_col``.  All arithmetic is int64 — ``seq`` uses integer
    division (``div``), exact at ANY prefix-sum magnitude, not just
    below 2^53 as a double division would be.
    """
    tokens: Column = (
        F.col(tokens_col)
        if tokens_col
        else F.size(words_col(F.col(text_col)))
    ).cast("long")
    base = docs.select(
        F.col(id_col),
        tokens.alias("n_tokens"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("long").alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    # name the prefix sum so ``div`` (Spark's integral division) can
    # apply to it — (offset / max).cast('long') would route through a
    # double, inexact for prefix sums >= 2^53
    staged = base.select(id_col, "n_tokens", "shard", offset.alias("_off"))
    return staged.select(
        id_col,
        "n_tokens",
        "shard",
        F.expr(f"_off div {int(max_tokens)}").alias("seq"),
        F.pmod(F.col("_off"), F.lit(int(max_tokens))).cast("long").alias(
            "offset_in_seq"
        ),
    )
