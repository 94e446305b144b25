"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the arbitrary-state path beyond built-in windows (SURVEY.md §2.B
"Streaming" row; no reference analog: its only state was the open-block
map, blockManager.go:56-63).

Operator: per-key running ingest stats (event count, value sum as exact
cents, last-seen timestamp) maintained across micro-batches with a
processing-time timeout — the streaming analog of the reference's
BlockManager bookkeeping, generalized to user-defined state.

Scale: state lives in the state store partitioned by key (RocksDB-backed
on a real cluster); each micro-batch touches only keys present in the
batch plus expiring timers. Arrow batches in/out — no row-at-a-time
Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("total_cents", LongType()),
    StructField("last_event_id", LongType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_cents", LongType()),
    StructField("last_event_id", LongType()),
])


def running_user_stats(events: DataFrame,
                       timeout_ms: int | None = None) -> DataFrame:
    """Streaming: cumulative per-user stats emitted each micro-batch.

    ``events`` must be a streaming DataFrame with (user_id, event_id,
    value). State per user: (n_events, total_cents, last_event_id);
    cents accumulation keeps the values exact (and testable against a
    batch groupBy twin).
    """

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, cents, last = (
            state.get if state.exists else (0, 0, -1)
        )
        for pdf in pdfs:
            n += len(pdf)
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
            last = max(last, int(pdf["event_id"].max()))
        state.update((n, cents, last))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({
            "user_id": [user_id],
            "n_events": [n],
            "total_cents": [cents],
            "last_event_id": [last],
        })

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, OUTPUT_SCHEMA, STATE_SCHEMA, "update", timeout
        )
    )
