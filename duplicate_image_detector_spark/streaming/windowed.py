"""Watermarked tumbling-window streaming aggregation.

Beyond-reference §2.10 surface (the reference is batch-only; task brief
asks for Structured Streaming with watermarks + windowed aggs for late
data): ``readStream`` over an events landing directory -> event-time
tumbling windows with a watermark -> append-mode parquet sink.

Append-mode semantics under watermarking (the part worth testing): a
window's row is emitted exactly once, only after the watermark passes the
window end — late rows inside the lateness bound still count; windows the
watermark has not passed stay buffered in state (with ``availableNow``
catch-up triggers they are emitted by a later run once newer data advances
the watermark).  This is the streaming analog of the engine's exactly-once
batch checkpoints: the streaming checkpoint dir carries both source
offsets and window state across runs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 minute",
    watermark: str = "10 minutes",
    schema: StructType | str = EVENTS_SCHEMA,
):
    """Start an availableNow stream: events parquet -> per-(window,
    event_type) counts + exact-decimal value sums, append mode.

    Returns the StreamingQuery; caller awaits termination.  Output schema:
    (window_start, window_end, event_type, n, sum_value).
    """
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
