"""TRUE event-time sessionization via ``transformWithStateInPandas``.

The ``applyInPandasWithState`` sessionizer (streaming/sessions.py) is
monotone in *arrival* order: an event that arrives after a later-timestamped
event of the same user is assigned to the CURRENT session (documented
limitation there).  This operator fixes that with the Spark 4 stateful API
(beyond-reference §2.10; no analog in /root/reference — the reference is
batch-only):

  * incoming events are BUFFERED in per-user ``ListState`` (never emitted
    immediately), so arrival order is irrelevant;
  * one event-time timer per user is kept at ``max(buffered ts) + gap``;
  * when the watermark passes that timer, NO future event can extend any
    buffered session: an accepted future event has ``ts >= watermark >
    max_ts + gap``, i.e. it always starts a new session.  The buffer is
    sorted by event time, split at > ``gap`` inactivity, and every session
    is emitted exactly once (append mode) with a per-user ordinal carried
    in ``ValueState`` across micro-batches and across ``availableNow``
    runs;
  * events older than the watermark are dropped by the engine (standard
    lateness bound) — within the bound, arbitrary disorder is handled.

Output: (user_id, session_id, n_events, first_ts, last_ts) — one row per
CLOSED session, the streaming analog of the batch ``event_sessions`` gate
restricted to sessions the watermark has sealed.

CAPABILITY GATE: Spark's transformWithState Python runner speaks protobuf
to its state server.  ``compat.ensure_protobuf`` makes a pip-installed OR
vendored pure-Python protobuf work (driver, streaming driver worker, and
executor workers — see compat.py); where neither exists,
``event_time_sessions`` raises a clear error and its tests skip.  The
default sessionizer remains streaming/sessions.py
(``applyInPandasWithState``), whose one documented limitation (monotone
arrival-order state) is exactly what this operator lifts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from duplicate_image_detector_spark.streaming.windowed import EVENTS_SCHEMA

SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_id bigint, n_events bigint, "
    "first_ts timestamp, last_ts timestamp"
)

_BUFFER_SCHEMA = "ts_ms long, event_id long"
_ORDINAL_SCHEMA = "next_session long"


def has_tws_support() -> bool:
    """transformWithState's Python state-server protocol requires
    google.protobuf on the driver and workers.  ``compat.ensure_protobuf``
    also accepts a vendored pure-Python copy (probed or via
    DEDUP_PROTOBUF_PATH) and exports the worker-side PYTHONPATH shim."""
    from duplicate_image_detector_spark.compat import ensure_protobuf

    return ensure_protobuf()


class _SessionProcessor(StatefulProcessor):
    def __init__(self, gap_sec: int):
        self.gap_ms = gap_sec * 1000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.buf = handle.getListState("events", _BUFFER_SCHEMA)
        self.ordinal = handle.getValueState("ordinal", _ORDINAL_SCHEMA)

    def _retime(self) -> None:
        """Keep exactly ONE timer: max buffered event time + gap."""
        rows = list(self.buf.get())
        if not rows:
            return
        target = max(int(r[0]) for r in rows) + self.gap_ms
        for t in self.handle.listTimers():
            # listTimers yields the registered expiry timestamps
            ts = int(t[0]) if isinstance(t, (tuple, list)) else int(t)
            if ts != target:
                self.handle.deleteTimer(ts)
        self.handle.registerTimer(target)

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        for pdf in rows:
            if len(pdf) == 0:
                continue
            ts_ms = (
                pd.to_datetime(pdf["ts"]).astype("int64") // 1_000_000
            ).tolist()
            for t, e in zip(ts_ms, pdf["event_id"].tolist()):
                self.buf.appendValue((int(t), int(e)))
        self._retime()
        return iter(())  # append mode: nothing emits until a timer fires

    def handleExpiredTimer(
        self, key, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = sorted(
            ((int(r[0]), int(r[1])) for r in self.buf.get())
        )
        if not rows:
            return iter(())
        nxt = int(self.ordinal.get()[0]) if self.ordinal.exists() else 0
        out: list[tuple[int, int, int, int, int]] = []
        start = prev = rows[0][0]
        n = 0
        for ts, _eid in rows:
            if ts - prev > self.gap_ms:
                nxt += 1
                out.append((int(user_id), nxt, n, start, prev))
                start, n = ts, 0
            n += 1
            prev = ts
        nxt += 1
        out.append((int(user_id), nxt, n, start, prev))
        self.ordinal.update((nxt,))
        self.buf.clear()
        df = pd.DataFrame(
            out,
            columns=["user_id", "session_id", "n_events", "first_ms", "last_ms"],
        )
        df["first_ts"] = pd.to_datetime(df.pop("first_ms"), unit="ms")
        df["last_ts"] = pd.to_datetime(df.pop("last_ms"), unit="ms")
        return iter([df])

    def close(self) -> None:
        pass


def event_time_sessions(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_sec: int = 1800,
    watermark: str = "10 minutes",
    schema=EVENTS_SCHEMA,
):
    """Start an availableNow stream: events parquet -> CLOSED event-time
    sessions (see module docstring), append-mode parquet sink."""
    if not has_tws_support():
        raise NotImplementedError(
            "transformWithStateInPandas requires google.protobuf, which is "
            "not installed in this environment; use "
            "streaming.sessions.streaming_sessions (applyInPandasWithState) "
            "instead, or install protobuf"
        )
    # transformWithState is implemented only on the RocksDB state store
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    stream = (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
        .select("user_id", "event_id", "ts")
    )
    sessions = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_SessionProcessor(gap_sec),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
    return (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
