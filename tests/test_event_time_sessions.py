"""transformWithStateInPandas event-time sessionization: closed sessions
are computed in EVENT-TIME order regardless of arrival order — including
disorder across availableNow runs, the case the monotone
applyInPandasWithState sessionizer documents as a limitation."""

from __future__ import annotations

import datetime as dt

import pytest

from duplicate_image_detector_spark.streaming.event_sessions import (
    event_time_sessions,
    has_tws_support,
)

# applied per-test (NOT module-wide: the capability-gate test below must
# run exactly when this skip would fire)
needs_tws = pytest.mark.skipif(
    not has_tws_support(),
    reason="transformWithState needs google.protobuf (not in this container)",
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _rows(specs):
    # (event_id, minute, user_id)
    return [
        (eid, T0 + dt.timedelta(minutes=m), uid, "click", 1.0, "{}")
        for eid, m, uid in specs
    ]


def _write(spark, rows, path):
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("append").parquet(path)


def _run(spark, in_dir, out_dir, chk):
    q = event_time_sessions(
        spark, in_dir, out_dir, chk, gap_sec=300, watermark="30 minutes"
    )
    q.awaitTermination(300)


@needs_tws
def test_event_time_disorder_across_runs(spark, tmp_path):
    in_dir, out_dir, chk = (str(tmp_path / d) for d in ("in", "out", "chk"))

    # run A: user 1 event at minute 40; driver event (user 99) at minute 60
    # -> watermark 30; user 1's timer (40min + 5min gap = 45) is NOT due
    _write(spark, _rows([(1, 40, 1), (900, 60, 99)]), in_dir)
    _run(spark, in_dir, out_dir, chk)
    import glob

    files = glob.glob(out_dir + "/**/*.parquet", recursive=True)
    got = (
        {
            (r["user_id"], r["session_id"]): r
            for r in spark.read.parquet(out_dir).collect()
        }
        if files
        else {}
    )
    assert (1, 1) not in got  # nothing sealed for user 1 yet

    # run B: user 1 event at minute 31 arrives AFTER the minute-40 event
    # (cross-run disorder, inside the 30-minute lateness bound) plus a
    # driver at minute 120 -> watermark 90 seals user 1's buffer.
    # Event-time split at gap > 5 min: {31} and {40} are TWO sessions —
    # an arrival-order sessionizer would merge them into one.
    _write(spark, _rows([(2, 31, 1), (901, 120, 99)]), in_dir)
    _run(spark, in_dir, out_dir, chk)
    rows = spark.read.parquet(out_dir).collect()
    u1 = sorted(
        (r for r in rows if r["user_id"] == 1), key=lambda r: r["session_id"]
    )
    assert len(u1) == 2
    assert u1[0]["session_id"] == 1 and u1[0]["n_events"] == 1
    assert u1[0]["first_ts"] == T0 + dt.timedelta(minutes=31)
    assert u1[1]["session_id"] == 2
    assert u1[1]["first_ts"] == T0 + dt.timedelta(minutes=40)
    # user 99's own buffer is still open (timer at 125 > watermark 90)
    assert all(r["user_id"] == 1 for r in rows)


@needs_tws
def test_same_session_groups_and_ordinal_continuity(spark, tmp_path):
    in_dir, out_dir, chk = (str(tmp_path / d) for d in ("in2", "out2", "chk2"))
    # user 5: minutes 0,2,4 (one session), minutes 20,21 (second session);
    # driver at minute 60 -> watermark 30 > 21+5 so both sessions seal
    _write(
        spark,
        _rows([(10, 0, 5), (11, 2, 5), (12, 4, 5), (13, 20, 5), (14, 21, 5),
               (900, 60, 99)]),
        in_dir,
    )
    _run(spark, in_dir, out_dir, chk)
    u5 = sorted(
        (r for r in spark.read.parquet(out_dir).collect() if r["user_id"] == 5),
        key=lambda r: r["session_id"],
    )
    assert [(r["session_id"], r["n_events"]) for r in u5] == [(1, 3), (2, 2)]
    assert u5[0]["last_ts"] == T0 + dt.timedelta(minutes=4)

    # a later run with new user-5 events continues the ordinal at 3
    _write(spark, _rows([(15, 40, 5), (901, 120, 99)]), in_dir)
    _run(spark, in_dir, out_dir, chk)
    u5b = sorted(
        (r for r in spark.read.parquet(out_dir).collect() if r["user_id"] == 5),
        key=lambda r: r["session_id"],
    )
    assert [(r["session_id"], r["n_events"]) for r in u5b] == [
        (1, 3), (2, 2), (3, 1),
    ]


def test_gate_raises_without_protobuf(spark, tmp_path):
    """The capability gate itself is testable everywhere: without
    google.protobuf the operator must refuse loudly, not crash the
    streaming runner mid-query."""
    if has_tws_support():
        pytest.skip("protobuf installed: operator runs for real here")
    with pytest.raises(NotImplementedError, match="protobuf"):
        event_time_sessions(
            spark, str(tmp_path / "in"), str(tmp_path / "out"),
            str(tmp_path / "chk"),
        )
