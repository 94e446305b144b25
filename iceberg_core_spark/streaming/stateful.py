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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

# STATE-SCHEMA COMPATIBILITY: n_nonnull was ADDED in r12, a breaking
# change for any applyInPandasWithState checkpoint written with the
# older 3-field state — Spark does not migrate state rows, so a query
# restarted on an old checkpointLocation fails (or misreads state)
# rather than upgrading. The registered query is unaffected (fresh
# temp checkpoint per run); external callers holding long-lived
# checkpoints must start a NEW checkpointLocation when upgrading
# across this boundary (r12 ADVICE).
STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("total_cents", LongType()),
    # non-null contribution count: SUM over an all-NULL group is NULL
    # in SQL (the batch-twin oracle), never 0 — same distinction the
    # rollup store's nn_ columns preserve (r12 review)
    StructField("n_nonnull", LongType()),
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
        n, cents, nn, last = (
            state.get if state.exists else (0, 0, 0, -1)
        )
        for pdf in pdfs:
            n += len(pdf)
            # explicit half-up (floor(x*100 + 0.5)) — Series.round() is
            # half-to-even, which diverges from SQL round() when x*100
            # lands exactly on k+0.5; the oracle uses the same expression.
            # dropna first: a NULL value arrives as NaN, and
            # floor(NaN).astype(int64) is UNDEFINED garbage where SQL's
            # SUM simply skips the NULL
            vals = pdf["value"].dropna()
            nn += len(vals)
            cents += int(
                np.floor(vals * 100 + 0.5).astype("int64").sum()
            )
            last = max(last, int(pdf["event_id"].max()))
        state.update((n, cents, nn, last))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        # SUM semantics: a user whose every value is NULL has a NULL
        # sum (the batch-twin oracle's SUM), not an exact 0
        yield pd.DataFrame({
            "user_id": [user_id],
            "n_events": [n],
            "total_cents": pd.array([cents if nn else None],
                                    dtype="Int64"),
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


# ---------------------------------------------------------------------------
# registered query: real cross-micro-batch stateful aggregation whose
# final state is exactly reproducible by a batch GROUP BY (the oracle)
# ---------------------------------------------------------------------------

def stateful_stats(spark, sf: str):
    """Drive ``running_user_stats`` as a REAL streaming query: stage the
    events table as three files, stream them one file per micro-batch
    (``maxFilesPerTrigger=1``) so per-user state genuinely persists and
    accumulates across batches, drain with availableNow, then keep each
    user's final emission (the row with the highest running n_events —
    emissions are cumulative). Oracle: the batch GROUP BY twin."""
    import os
    import tempfile
    import uuid

    import duckdb
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    work = tempfile.mkdtemp(prefix="ice_stateful_q_")
    src_dir = os.path.join(work, "incoming")
    os.makedirs(src_dir)
    # ts is TIMESTAMP(NANOS) and unused — stage only the needed columns
    con = duckdb.connect()
    for k in range(3):
        con.sql(
            f"COPY (SELECT user_id, event_id, value "
            f"FROM '{os.path.join(sf, 'events.parquet')}' "
            f"WHERE event_id % 3 = {k} ORDER BY event_id) "
            f"TO '{src_dir}/part-{k}.parquet' (FORMAT PARQUET)"
        )
    con.close()

    schema = spark.read.parquet(src_dir).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = running_user_stats(src)
    qname = "stateful_stats_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("stateful_stats drain did not finish in 300s")

    emitted = spark.table(qname)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        emitted.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


STATEFUL_STATS_SQL = """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
       MAX(event_id) AS last_event_id
FROM events
GROUP BY user_id
"""

QUERIES = {
    "stateful_stats": (stateful_stats, STATEFUL_STATS_SQL),
}
