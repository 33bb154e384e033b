"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

Beyond-reference §2.10 surface (task brief: "applyInPandasWithState for
custom stateful operators"): the streaming analog of the batch
``event_sessions`` gate (gap > ``gap_sec`` of inactivity per user starts a
new session).  Per-user state carries (next session ordinal, last event
timestamp) across micro-batches AND across ``availableNow`` runs (state
lives in the streaming checkpoint), so a user whose events straddle two
ingest batches keeps one continuous session numbering — the property the
batch window cannot give an incremental pipeline.

Output mode is ``update``: each batch emits the session assignment of the
events in that batch.  Late events older than the user's last seen
timestamp are assigned to the CURRENT session (state is monotone; a true
event-time re-sort would need transformWithState event-time timers, out of
scope for this operator).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from duplicate_image_detector_spark.streaming.windowed import EVENTS_SCHEMA

OUTPUT_SCHEMA = (
    "user_id bigint, event_id bigint, ts timestamp, session_id bigint"
)
STATE_SCHEMA = StructType(
    [
        StructField("next_session", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _sessionize(gap_sec: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            next_session, last_ts = state.get
            last_ts = pd.Timestamp(last_ts) if last_ts is not None else None
        else:
            next_session, last_ts = 0, None
        # a group larger than the Arrow batch size arrives as SEVERAL
        # chunks in shuffle order — concat and sort ONCE, or later chunks
        # with earlier timestamps would be mis-sessionized (memory bound:
        # one user's events per micro-batch)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            state.update(
                (
                    int(next_session),
                    last_ts.to_pydatetime() if last_ts is not None else None,
                )
            )
            return
        pdf = pdf.sort_values(["ts", "event_id"])
        sids = []
        for ts in pdf["ts"]:
            if last_ts is None or (ts - last_ts).total_seconds() > gap_sec:
                next_session += 1
            if last_ts is None or ts > last_ts:
                last_ts = ts
            sids.append(next_session)
        state.update((int(next_session), last_ts.to_pydatetime()))
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"].astype("int64"),
                "event_id": pdf["event_id"].astype("int64"),
                "ts": pdf["ts"],
                "session_id": pd.Series(sids, dtype="int64").values,
            }
        )

    return fn


def streaming_sessions(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_sec: int = 1800,
    schema=EVENTS_SCHEMA,
):
    """Start an availableNow stream: events parquet -> per-event session
    assignments, per-user state persisted in the streaming checkpoint."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    sessions = (
        stream.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize(gap_sec),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    # file sinks are append-only; update-mode output goes through
    # foreachBatch.  foreachBatch alone is at-least-once — an epoch can be
    # re-run after a crash between the write and the checkpoint commit —
    # so the write is made idempotent by keying it on epoch_id: a retry
    # OVERWRITES its own epoch directory instead of appending duplicates.
    import os

    def _write_batch(df, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(
            os.path.join(output_dir, f"epoch={epoch_id}")
        )

    return (
        sessions.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
