"""Declared streaming-surface queries. Event-time window operators are
batch/stream-agnostic DataFrame transforms, so their batch twins run
under the driver's DuckDB oracle; stream_ingest's oracle is the
strongest possible one: the full ingest pipeline (stream → partition →
cluster → manifest commit → manifest-pruned scan) must reproduce the
source table EXACTLY (SELECT * FROM events)."""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_core_spark.session import load_table
from iceberg_core_spark.streaming.ingest import (
    session_agg,
    sliding_counts,
    stream_ingest_to_table,
    tumbling_counts,
)
from iceberg_core_spark.table import IceTable


def win_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    return tumbling_counts(load_table(spark, sf, "events"))


WIN_TUMBLING_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS win_end,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2, 3
"""


def win_sliding(spark: SparkSession, sf: str) -> DataFrame:
    return sliding_counts(load_table(spark, sf, "events"))


WIN_SLIDING_SQL = """
SELECT win_start, win_start + INTERVAL '1 hour' AS win_end,
       COUNT(*) AS n_events
FROM (
  SELECT time_bucket(INTERVAL '30 minutes', ts) - to_minutes(30 * k) AS win_start
  FROM events, (SELECT unnest([0, 1]) AS k)
)
GROUP BY 1, 2
"""


def win_session(spark: SparkSession, sf: str) -> DataFrame:
    return session_agg(load_table(spark, sf, "events"))


# Gaps-and-islands twin of session_window semantics: a new session
# starts when the gap since the previous event is >= the gap duration
# (Spark's session end = last ts + gap, end-exclusive).
WIN_SESSION_SQL = """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '5 minutes'
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
)
SELECT MIN(ts) AS sess_start,
       MAX(ts) + INTERVAL '5 minutes' AS sess_end,
       user_id,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid
"""


def stream_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end streaming ingest (availableNow drain) of the events
    table through the full IceTable pipeline, then a manifest-backed
    scan. Oracle = the source table itself: the pipeline must be
    content-preserving."""
    work = tempfile.mkdtemp(prefix="ice_stream_q_")
    src_dir = os.path.join(work, "incoming")
    os.makedirs(src_dir)
    shutil.copy(os.path.join(sf, "events.parquet"),
                os.path.join(src_dir, "events.parquet"))
    table_root = os.path.join(work, "events_table")

    # ts handling is TYPE-DRIVEN: when events.parquet stores ts as
    # TIMESTAMP(NANOS) (older driver datasets), stream it as raw nanos
    # longs and normalize ns→µs in-stream (same truncation as
    # load_table, so the oracle sees identical values); when it is a
    # native timestamp type (current datasets: TIMESTAMP micros NTZ),
    # stream it as-is with no transform.
    from iceberg_core_spark.session import _nanos_columns

    src_file = os.path.join(src_dir, "events.parquet")
    nanos_cols = _nanos_columns(src_file)
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(src_file).schema
    transform = (
        (lambda s: s.withColumn("ts", F.expr("timestamp_micros(ts div 1000)")))
        if "ts" in nanos_cols else None
    )

    q = stream_ingest_to_table(
        spark, src_dir, table_root, raw_schema,
        partition_col="user_id", key_col="ts",
        trigger={"availableNow": True},
        checkpoint_dir=os.path.join(work, "ckpt"),
        transform=transform,
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("stream_ingest drain did not finish in 300s")

    return IceTable(spark, table_root).scan().select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


STREAM_INGEST_SQL = """
SELECT event_id, ts, user_id, event_type, value, props FROM events
"""


_SDEDUP_SRC_CACHE: dict[str, str] = {}


def _sdedup_src(sf: str) -> str:
    """Stage (once per corpus, like the _*_root builders) the two-file
    replay source: the full events table, then every 7th event again."""
    src_dir = _SDEDUP_SRC_CACHE.get(sf)
    if src_dir is not None and os.path.isdir(src_dir):
        return src_dir
    import duckdb

    src_dir = os.path.join(tempfile.mkdtemp(prefix="ice_sdedup_q_"),
                           "incoming")
    os.makedirs(src_dir)
    con = duckdb.connect()
    ev = os.path.join(sf, "events.parquet")
    con.sql(
        f"COPY (SELECT event_id, user_id, ts, value FROM '{ev}' "
        f"ORDER BY event_id) TO '{src_dir}/part-0.parquet' (FORMAT PARQUET)"
    )
    con.sql(
        f"COPY (SELECT event_id, user_id, ts, value FROM '{ev}' "
        f"WHERE event_id % 7 = 0 ORDER BY event_id) "
        f"TO '{src_dir}/part-1.parquet' (FORMAT PARQUET)"
    )
    con.close()
    _SDEDUP_SRC_CACHE[sf] = src_dir
    return src_dir


def stream_dedup_q(spark: SparkSession, sf: str) -> DataFrame:
    """REAL streaming exact-dedup (dropDuplicatesWithinWatermark):
    events are staged as two files — the full table, then every 7th
    event again (exact full-row duplicates, the at-least-once replay a
    training-data ingest must absorb) — streamed one file per
    micro-batch so the duplicate arrives in a LATER batch and is
    dropped by cross-batch state, not by in-batch distinct. The
    watermark horizon spans the dataset, so state covers every key and
    the result is exactly the distinct event set; the oracle is the
    source table itself. Output is order-insensitive to file ordering:
    whichever copy arrives first is emitted, and copies are identical
    rows.

    The staged source is cached per sf; the checkpoint must be FRESH
    per invocation (a reused availableNow checkpoint would consider
    the files already processed and emit nothing), so it lives in a
    per-run temp dir removed after the drain."""
    import uuid

    from iceberg_core_spark.streaming.ingest import stream_dedup

    src_dir = _sdedup_src(sf)
    ckpt_work = tempfile.mkdtemp(prefix="ice_sdedup_ckpt_")
    schema = spark.read.parquet(src_dir).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    # watermarks reject TIMESTAMP_NTZ; under the engine's pinned UTC
    # session timezone the cast preserves wall-clock values
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    out = stream_dedup(src, ["event_id"], ts_col="ts",
                       watermark="60 days")
    qname = "stream_dedup_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(ckpt_work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("stream_dedup drain did not finish in 300s")
    finally:
        shutil.rmtree(ckpt_work, ignore_errors=True)
    return spark.table(qname)


STREAM_DEDUP_SQL = """
SELECT event_id, user_id, ts, value FROM events
"""


def stream_join(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of the watermarked stream-stream band join (clicks
    within 30 min before each purchase, same user). The operator is
    batch/stream-agnostic; the streaming path is exercised in
    tests/test_streaming.py with real micro-batches."""
    from iceberg_core_spark.streaming.ingest import stream_stream_join

    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    joined = stream_stream_join(purchases, clicks, on="user_id",
                                max_lag="30 minutes")
    return joined.select(
        "user_id", "ts", "event_id",
        F.col("r_ts").alias("click_ts"),
        F.col("r_event_id").alias("click_id"),
    )


STREAM_JOIN_SQL = """
SELECT p.user_id, p.ts, p.event_id,
       c.ts AS click_ts, c.event_id AS click_id
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL '30 minutes'
 AND c.ts <= p.ts
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
"""


QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "win_tumbling": (win_tumbling, WIN_TUMBLING_SQL),
    "win_sliding": (win_sliding, WIN_SLIDING_SQL),
    "win_session": (win_session, WIN_SESSION_SQL),
    "stream_ingest": (stream_ingest, STREAM_INGEST_SQL),
    "stream_join": (stream_join, STREAM_JOIN_SQL),
    # r5 rotation lead (registered past this round's 50-slot window)
    "stream_dedup": (stream_dedup_q, STREAM_DEDUP_SQL),
}
