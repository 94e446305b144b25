"""Batch time-series operators over the events table: gap-based
sessionization and time-bucket gap-filling with last-observation-
carried-forward. The reference's scan surface is time-ordered blocks
(block.go:41 key ranges over time-keyed rows); these are the two
query shapes such a layout exists to serve — and the two every
event-analytics engine (sessionize) and every downsampling pipeline
(gapfill) needs.

Scale notes: both are single-shuffle plans. Sessionize partitions the
window by ``user_id`` — the natural high-cardinality key, so 1000
executors each own a disjoint user range and no state crosses
partitions; the island numbering is a running sum over each user's
own ordered events (no global ordering anywhere). Gapfill aggregates
to (event_type, hour) first — the grid that explodes afterward is
bounded by types x hours, orders of magnitude smaller than the input
— and the LOCF window partitions by ``event_type``. Skewed types
stay cheap because the window input is the bucketed aggregate, not
raw events. Timestamp arithmetic is integer microseconds on BOTH
engines (``unix_micros`` / ``epoch_us``) so session boundaries can
never drift on sub-second fractions; double sums go through the
house DECIMAL(18,2) pattern so the fold order cannot change the
result.
"""

from __future__ import annotations

from collections.abc import Callable
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_core_spark.session import load_table

# 30 wall-clock minutes, in integer microseconds (both engines compare
# integer µs, never fractional-second doubles)
SESSION_GAP_US = 30 * 60 * 1_000_000


def sessionize(df: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_us: int = SESSION_GAP_US,
               order_tiebreak: str = "event_id") -> DataFrame:
    """Assign gap-based session ids: a new session starts whenever a
    user's inter-event gap exceeds ``gap_us`` microseconds. Returns the
    input with a ``session_id`` column (1-based per user).

    The classic islands construction: flag session starts with a lag
    comparison, then running-sum the flags. One shuffle (hash on
    ``user_col``), both window passes share it.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    sess = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn("session_id", sess)


def events_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Registry query: sessionize events at a 30-minute gap and emit
    per-session rollups (bounds, event count, exact-decimal value sum
    cast to double — the deterministic-sum house pattern)."""
    e = load_table(spark, sf, "events")
    return (
        sessionize(e)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
             .alias("sum_value"),
        )
    )


EVENTS_SESSIONIZE_SQL = """
WITH lagged AS (
  SELECT user_id, event_id, ts, value,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
), flagged AS (
  -- tie-break MUST match the lag window: with ORDER BY ts alone a
  -- tied row could take the running sum before or after its tied
  -- neighbor's start flag, splitting the tie across two sessions
  SELECT user_id, ts, value,
         SUM(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id
  FROM lagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM flagged
GROUP BY user_id, session_id
"""


def gapfill_locf(df: DataFrame, key_col: str, bucket_col: str,
                 value_col: str, step_expr: str = "interval 1 hour"
                 ) -> DataFrame:
    """Densify a (key, bucket, value) frame to every bucket between each
    key's min and max, carrying the last observed value forward into
    the gaps. Emits ``was_gap`` (1 = synthesized bucket).

    The grid is generated from the AGGREGATED frame (bounded by
    keys x buckets), never from raw rows; the left join back is
    broadcast-able whenever the observed frame is small, and the LOCF
    window partitions by key so fill state never crosses executors.
    """
    rng = df.groupBy(key_col).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi"))
    grid = rng.select(
        key_col,
        F.explode(F.expr(f"sequence(__lo, __hi, {step_expr})"))
         .alias(bucket_col),
    )
    j = grid.join(df, [key_col, bucket_col], "left")
    w = (Window.partitionBy(key_col).orderBy(bucket_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return j.select(
        key_col, bucket_col,
        F.last(value_col, ignorenulls=True).over(w).alias(value_col),
        F.isnull(value_col).cast("int").alias("was_gap"),
    )


def events_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Registry query: hourly per-type averages (exact-decimal sum /
    non-null count), densified over each type's observed hour range
    with LOCF fill."""
    e = load_table(spark, sf, "events")
    hourly = (
        e.groupBy("event_type",
                  F.date_trunc("hour", "ts").alias("bucket"))
        .agg((F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
              / F.count("value")).alias("avg_value"))
    )
    return gapfill_locf(hourly, "event_type", "bucket", "avg_value")


EVENTS_GAPFILL_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(value) AS avg_value
  FROM events GROUP BY 1, 2
), rng AS (
  SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
  FROM hourly GROUP BY 1
), grid AS (
  SELECT event_type,
         unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM rng
)
SELECT g.event_type, g.bucket,
       last_value(h.avg_value IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.bucket
         ROWS UNBOUNDED PRECEDING) AS avg_value,
       CAST(h.avg_value IS NULL AS INT) AS was_gap
FROM grid g
LEFT JOIN hourly h
  ON g.event_type = h.event_type AND g.bucket = h.bucket
"""


def gapfill_interpolate(df: DataFrame, key_col: str, bucket_col: str,
                        value_col: str,
                        step_expr: str = "interval 1 hour") -> DataFrame:
    """Densify like :func:`gapfill_locf` but fill gaps by LINEAR
    interpolation between the neighboring observations. Interior gaps
    always have both neighbors (the grid spans each key's observed
    min..max), so no edge extrapolation is needed.

    The interpolation fraction is computed over exact integer
    microseconds and divided once in double — bit-identical IEEE
    arithmetic on any engine evaluating the same expression.
    """
    rng = df.groupBy(key_col).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi"))
    grid = rng.select(
        key_col,
        F.explode(F.expr(f"sequence(__lo, __hi, {step_expr})"))
         .alias(bucket_col),
    )
    j = grid.join(df, [key_col, bucket_col], "left")
    v = F.col(value_col)
    obs_t = F.when(v.isNotNull(), F.col(bucket_col))
    wp = (Window.partitionBy(key_col).orderBy(bucket_col)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wn = (Window.partitionBy(key_col).orderBy(bucket_col)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    pv = F.last(v, ignorenulls=True).over(wp)
    pt = F.unix_micros(F.last(obs_t, ignorenulls=True).over(wp))
    nv = F.first(v, ignorenulls=True).over(wn)
    nt = F.unix_micros(F.first(obs_t, ignorenulls=True).over(wn))
    tb = F.unix_micros(F.col(bucket_col))
    interp = pv + (nv - pv) * ((tb - pt).cast("double") / (nt - pt))
    return j.select(
        key_col, bucket_col,
        F.when(v.isNotNull(), v).otherwise(interp).alias(value_col),
        F.isnull(v).cast("int").alias("was_gap"),
    )


def events_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    """Registry query: hourly per-type averages with gaps filled by
    linear interpolation between the neighboring observed hours."""
    e = load_table(spark, sf, "events")
    hourly = (
        e.groupBy("event_type",
                  F.date_trunc("hour", "ts").alias("bucket"))
        .agg((F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
              / F.count("value")).alias("avg_value"))
    )
    return gapfill_interpolate(hourly, "event_type", "bucket", "avg_value")


EVENTS_INTERPOLATE_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(value) AS avg_value
  FROM events GROUP BY 1, 2
), rng AS (
  SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
  FROM hourly GROUP BY 1
), grid AS (
  SELECT event_type,
         unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM rng
), j AS (
  SELECT g.event_type, g.bucket, h.avg_value,
         last_value(h.avg_value IGNORE NULLS) OVER (
           PARTITION BY g.event_type ORDER BY g.bucket
           ROWS UNBOUNDED PRECEDING) AS pv,
         epoch_us(last_value(CASE WHEN h.avg_value IS NOT NULL
             THEN g.bucket END IGNORE NULLS) OVER (
           PARTITION BY g.event_type ORDER BY g.bucket
           ROWS UNBOUNDED PRECEDING)) AS pt,
         first_value(h.avg_value IGNORE NULLS) OVER (
           PARTITION BY g.event_type ORDER BY g.bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         epoch_us(first_value(CASE WHEN h.avg_value IS NOT NULL
             THEN g.bucket END IGNORE NULLS) OVER (
           PARTITION BY g.event_type ORDER BY g.bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS nt,
         epoch_us(g.bucket) AS tb
  FROM grid g
  LEFT JOIN hourly h
    ON g.event_type = h.event_type AND g.bucket = h.bucket
)
SELECT event_type, bucket,
       CASE WHEN avg_value IS NOT NULL THEN avg_value
            ELSE pv + (nv - pv) * (CAST(tb - pt AS DOUBLE) / (nt - pt))
       END AS avg_value,
       CAST(avg_value IS NULL AS INT) AS was_gap
FROM j
"""


def endpoint_key(us_col, tiebreak_col):
    """A fixed-width string key that totally orders (epoch-µs,
    tiebreak) over the full int64 × int64 domain, byte-identically in
    Spark and DuckDB: each half is biased into [0, 2**64) via exact
    DECIMAL(20,0) arithmetic, then zero-padded to exactly 20 chars —
    so negative values order correctly and nothing can outgrow the
    pad (lpad silently TRUNCATES over-width input in both engines,
    which is why a naive sign-carrying pad is not a total order)."""
    bias = F.lit(Decimal(2 ** 63)).cast("decimal(20,0)")

    def _pad20(c):
        return F.lpad((c.cast("decimal(20,0)") + bias).cast("string"),
                      20, "0")

    return F.concat(_pad20(us_col), _pad20(tiebreak_col))


def downsample_ohlc(df: DataFrame, key_col: str, ts_col: str,
                    value_col: str, tiebreak_col: str,
                    step_us: int) -> DataFrame:
    """Downsample a raw time series to fixed ``step_us`` buckets with
    the candlestick rollup every dashboard retention tier needs:
    open/close (first/last value by time), low/high, exact-decimal
    mean, and count. The bucket is integer-µs floor arithmetic
    (cross-engine exact, like the session boundaries), and open/close
    resolve through ``min_by``/``max_by`` on a fixed-width
    (epoch-µs, tiebreak) string key — a TOTAL order both engines
    compare byte-identically, so ties can never flip the endpoints.
    Each int64 half is biased into [0, 2**64) via exact DECIMAL(20,0)
    arithmetic before zero-padding to exactly 20 chars, so negative
    timestamps/tiebreaks order correctly and no value can ever exceed
    the pad width (lpad silently TRUNCATES over-width input in both
    engines — the naive unpadded-sign encoding is not a total order).

    One hash aggregate on (key, bucket): pre-aggregation happens
    map-side, nothing is windowed over raw rows — at 100 TB the
    shuffle carries one partial state per (key, bucket) per map task.
    """
    us = F.unix_micros(F.col(ts_col))
    # exact integer floor-to-step: floor(us/step)*step via '/' would
    # round through an IEEE double and misbucket values within ~1 ulp
    # below a boundary once |µs| > 2^53; us - pmod(us, step) is pure
    # int64 arithmetic (pmod keeps negatives floor-consistent)
    bucket = F.timestamp_micros(us - F.pmod(us, F.lit(step_us)))
    ok = endpoint_key(us, F.col(tiebreak_col))
    v = F.col(value_col)
    return (
        df.select(F.col(key_col), bucket.alias("bucket"),
                  v.alias("__v"), ok.alias("__ok"))
        .groupBy(key_col, "bucket")
        .agg(
            F.min_by("__v", "__ok").alias("open_value"),
            F.max_by("__v", "__ok").alias("close_value"),
            F.min("__v").alias("low_value"),
            F.max("__v").alias("high_value"),
            (F.sum(F.col("__v").cast("decimal(18,2)")).cast("double")
             / F.count("__v")).alias("avg_value"),
            F.count("__v").alias("n_events"),
        )
    )


def events_downsample(spark: SparkSession, sf: str) -> DataFrame:
    """Registry query: the events stream downsampled to 6-hour OHLC
    candles per event type — the retention-tier rollup that completes
    the batch time-series family (sessionize / gapfill / interpolate
    / downsample)."""
    e = load_table(spark, sf, "events")
    return downsample_ohlc(e, "event_type", "ts", "value",
                           tiebreak_col="event_id",
                           step_us=6 * 3600 * 1_000_000)


EVENTS_DOWNSAMPLE_SQL = """
SELECT event_type,
       make_timestamp(epoch_us(ts)
                      - ((epoch_us(ts) % 21600000000 + 21600000000)
                         % 21600000000)) AS bucket,
       min_by(value,
              lpad(CAST(CAST(epoch_us(ts) AS DECIMAL(20,0))
                        + 9223372036854775808 AS VARCHAR), 20, '0')
              || lpad(CAST(CAST(event_id AS DECIMAL(20,0))
                           + 9223372036854775808 AS VARCHAR), 20, '0'))
         AS open_value,
       max_by(value,
              lpad(CAST(CAST(epoch_us(ts) AS DECIMAL(20,0))
                        + 9223372036854775808 AS VARCHAR), 20, '0')
              || lpad(CAST(CAST(event_id AS DECIMAL(20,0))
                           + 9223372036854775808 AS VARCHAR), 20, '0'))
         AS close_value,
       MIN(value) AS low_value,
       MAX(value) AS high_value,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value)
         AS avg_value,
       COUNT(value) AS n_events
FROM events
GROUP BY 1, 2
"""


QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "events_sessionize": (events_sessionize, EVENTS_SESSIONIZE_SQL),
    "events_gapfill": (events_gapfill, EVENTS_GAPFILL_SQL),
    "events_interpolate": (events_interpolate, EVENTS_INTERPOLATE_SQL),
    # NEW r8: fixed-bucket OHLC downsampling (r9 window lead)
    "events_downsample": (events_downsample, EVENTS_DOWNSAMPLE_SQL),
}
