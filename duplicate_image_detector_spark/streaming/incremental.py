"""Incremental signature ingest via Structured Streaming.

``readStream`` over a parquet landing directory -> the same JVM-side
signature expressions the batch stage uses (one code path, no drift) ->
``writeStream`` append to the signatures store.  Run with
``trigger(availableNow=True)`` for catch-up batches; the streaming
checkpoint supplies exactly-once appends, mirroring the batch stages'
config-hash checkpoint contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from duplicate_image_detector_spark.config import PipelineConfig
from duplicate_image_detector_spark.operators.signatures import (
    compute_signatures,
)

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def incremental_signatures(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: PipelineConfig,
    schema: StructType | str = PAGES_SCHEMA,
    include_shingles: bool = False,
    hash_kind: str = "poly",
):
    """Start an availableNow stream: pages parquet -> signatures parquet.

    Returns the StreamingQuery; caller awaits termination.  The transform
    is the *batch* signature stage applied to the streaming DataFrame —
    stateless per-row column expressions, so it is trivially
    streaming-compatible (no watermark needed).

    ``include_shingles``/``hash_kind`` DEFAULT TO THE BATCH PIPELINE'S
    signature options (slim rows, poly hash — plans/pipeline.py:123-128) so
    an incrementally-built store is schema- and value-compatible with batch
    LSH state; override both in lockstep with any custom run_pipeline call.
    """
    stream = (
        spark.readStream.schema(schema).parquet(input_dir)
        .where(F.col("text").isNotNull())
        .select(F.xxhash64("url").alias("doc_id"), "url", "text")
    )
    sigs: DataFrame = compute_signatures(
        stream, cfg, include_shingles=include_shingles, hash_kind=hash_kind
    )
    return (
        sigs.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
