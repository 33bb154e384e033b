"""Stateful streaming sessionization: per-user state survives across
availableNow runs (session continuity), gaps start new sessions, and the
single-batch result matches the batch window-based sessionizer."""

from __future__ import annotations

import datetime as dt

from duplicate_image_detector_spark.streaming.sessions import (
    streaming_sessions,
)

T0 = dt.datetime(2024, 3, 1, 8, 0, 0)


def _write(spark, rows, path):
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("append").parquet(path)


def _ev(eid, minutes, user):
    return (eid, T0 + dt.timedelta(minutes=minutes), user, "click", 1.0, "{}")


def test_sessions_state_across_runs(spark, tmp_path):
    in_dir, out_dir, chk = (str(tmp_path / d) for d in ("in", "out", "chk"))

    # run 1: user 1 has two events 5 min apart (one session), then a 40-min
    # gap (gap_sec=1800 = 30 min) -> second session.  user 2: one event.
    _write(
        spark,
        [_ev(1, 0, 1), _ev(2, 5, 1), _ev(3, 45, 1), _ev(4, 0, 2)],
        in_dir,
    )
    q = streaming_sessions(spark, in_dir, out_dir, chk, gap_sec=1800)
    q.awaitTermination(300)
    got = {
        r["event_id"]: (r["user_id"], r["session_id"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {1: (1, 1), 2: (1, 1), 3: (1, 2), 4: (2, 1)}

    # run 2: user 1 continues 10 min after event 3 -> SAME session 2
    # (state carried through the checkpoint); then a 50-min gap -> session
    # 3.  user 3 is new -> session 1.
    _write(spark, [_ev(5, 55, 1), _ev(6, 105, 1), _ev(7, 0, 3)], in_dir)
    q2 = streaming_sessions(spark, in_dir, out_dir, chk, gap_sec=1800)
    q2.awaitTermination(300)
    got2 = {
        r["event_id"]: (r["user_id"], r["session_id"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got2[5] == (1, 2)   # continuity across availableNow runs
    assert got2[6] == (1, 3)   # new gap -> new session
    assert got2[7] == (3, 1)
    assert len(got2) == 7      # earlier assignments untouched


def test_sessions_match_batch_windows(spark, tmp_path):
    """One ingest batch: stateful assignments equal the batch lag/running-
    sum sessionizer used by the event_sessions gate."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    in_dir, out_dir, chk = (str(tmp_path / d) for d in ("in2", "out2", "chk2"))
    rows = [
        _ev(i, m, u)
        for i, (m, u) in enumerate(
            [(0, 1), (10, 1), (50, 1), (60, 1), (120, 1), (0, 2), (31, 2)]
        )
    ]
    _write(spark, rows, in_dir)
    q = streaming_sessions(spark, in_dir, out_dir, chk, gap_sec=1800)
    q.awaitTermination(300)
    got = {
        r["event_id"]: r["session_id"]
        for r in spark.read.parquet(out_dir).collect()
    }

    e = spark.read.parquet(in_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull() | ((F.col("ts") - prev) > F.expr("INTERVAL 1800 SECONDS")),
        1,
    ).otherwise(0)
    batch = e.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    want = {r["event_id"]: r["session_id"] for r in batch.collect()}
    assert got == want
