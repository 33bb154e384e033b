"""Watermarked windowed streaming agg: emitted windows match the batch
aggregation restricted to watermark-closed windows; late-but-in-bound rows
are counted; a second availableNow run emits newly-closed windows only."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from duplicate_image_detector_spark.streaming.windowed import (
    windowed_event_counts,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _rows(minutes_offsets):
    return [
        (i, T0 + dt.timedelta(minutes=m, seconds=s), 1, et, 1.0, "{}")
        for i, (m, s, et) in enumerate(minutes_offsets)
    ]


def _write(spark, rows, path):
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("append").parquet(path)


def test_windowed_counts_with_watermark(spark, tmp_path):
    in_dir, out_dir, chk = (
        str(tmp_path / d) for d in ("landing", "out", "chk")
    )
    # batch 1: events in minutes 0,1,2 and a "future" event at minute 30
    # that advances the watermark to 30 - 10 = minute 20, closing windows
    # 0..2 (and everything below 20)
    batch1 = _rows(
        [
            (0, 10, "click"),
            (0, 40, "click"),
            (1, 5, "view"),
            (2, 59, "click"),
            (30, 0, "view"),  # watermark driver
        ]
    )
    _write(spark, batch1, in_dir)
    q = windowed_event_counts(
        spark, in_dir, out_dir, chk, window="1 minute", watermark="10 minutes"
    )
    q.awaitTermination(300)
    got = {
        (r["window_start"].minute, r["event_type"]): r["n"]
        for r in spark.read.parquet(out_dir).collect()
    }
    # windows 0 (2 clicks), 1 (1 view), 2 (1 click) closed; minute-30
    # window still open -> not emitted
    assert got == {(0, "click"): 2, (1, "view"): 1, (2, "click"): 1}

    # batch 2: a late-but-IN-BOUND click at minute 25 (>= the current
    # watermark 20, so it is accepted), a TOO-LATE click at minute 5
    # (< watermark 20 -> dropped), and a minute-60 event advancing the
    # watermark to 50, which closes windows 25 and 30
    batch2 = _rows([(25, 0, "click"), (5, 0, "click"), (60, 0, "view")])
    _write(spark, batch2, in_dir)
    q2 = windowed_event_counts(
        spark, in_dir, out_dir, chk, window="1 minute", watermark="10 minutes"
    )
    q2.awaitTermination(300)
    got2 = {
        (r["window_start"].minute, r["event_type"]): r["n"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got2[(25, "click")] == 1  # in-bound late row accepted + emitted
    assert got2[(30, "view")] == 1   # previously-open window now closed
    assert got2[(0, "click")] == 2   # no re-emit dup of closed windows
    # too-late minute-5 row dropped: window 5 never appears, and the
    # minute-0 count did not change; minute-60 window still open
    assert (5, "click") not in got2
    assert len(got2) == 5


def test_windowed_matches_batch_for_closed_windows(spark, tmp_path):
    """Emitted rows equal the batch groupBy over the same data restricted
    to windows the watermark has passed."""
    in_dir, out_dir, chk = (
        str(tmp_path / d) for d in ("landing2", "out2", "chk2")
    )
    rows = _rows(
        [(m, s, t) for m in range(5) for s, t in ((3, "click"), (30, "view"))]
        + [(40, 0, "click")]
    )
    _write(spark, rows, in_dir)
    q = windowed_event_counts(spark, in_dir, out_dir, chk)
    q.awaitTermination(300)
    got = spark.read.parquet(out_dir)

    batch = (
        spark.read.parquet(in_dir)
        .groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    max_ts = T0 + dt.timedelta(minutes=40)
    closed = batch.where(
        F.col("window_start") < F.lit(max_ts - dt.timedelta(minutes=10))
    )
    g = {(r["window_start"], r["event_type"]): r["n"] for r in got.collect()}
    w = {(r["window_start"], r["event_type"]): r["n"] for r in closed.collect()}
    assert g == w and len(w) == 10
