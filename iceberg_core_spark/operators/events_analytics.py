"""Event analytics — ordered funnels and cohort retention, the two
query shapes every product-analytics engine ships and the batch
time-series family (sessionize/gapfill/downsample) doesn't cover.

Scale shape: every stage is a per-user aggregate or an equi-join on
``user_id`` — one hash partitioning reused across the whole plan, no
window over raw events, no self-join explosion. The funnel's ordered
steps resolve as chained conditional MINs (step N's earliest
timestamp strictly after step N-1's), so each stage adds one
aggregate + one join on the same key, and the stage counts union into
ONE declarative plan (no driver-side loop collects intermediate
counts). Retention buckets weeks with exact integer-µs arithmetic
(``us - pmod(us, week)``), and week INDICES derive only from small
differences — dividing a raw 2024 epoch-µs (≈1.7e18 > 2^53) by the
week width in double arithmetic would round the numerator before the
divide; ``(wk - cohort_start)`` is a few weeks of µs, exactly
representable, so the division is exact in both engines.

Staged for registration (window capacity per TODO.md): the query fns
and oracles below follow the registry (spark, sf_dir) contract.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_core_spark.session import load_table

WEEK_US = 7 * 24 * 3600 * 1_000_000


def funnel(events: DataFrame, steps: list[str],
           user_col: str = "user_id", type_col: str = "event_type",
           ts_col: str = "ts") -> DataFrame:
    """Strict-order funnel: a user converts to step N at the earliest
    event of type ``steps[N]`` STRICTLY AFTER their step-N-1 time.
    Returns one row per step: (step_idx, step, n_users) where n_users
    counts users who reached that step — one declarative plan."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    per_user = events.select(user_col, type_col, ts_col)
    reached = per_user.filter(F.col(type_col) == steps[0]) \
        .groupBy(user_col).agg(F.min(ts_col).alias("t"))
    stages = [reached]
    for step in steps[1:]:
        reached = (
            per_user.filter(F.col(type_col) == step)
            .join(reached.select(user_col, "t"), user_col)
            .filter(F.col(ts_col) > F.col("t"))
            .groupBy(user_col).agg(F.min(ts_col).alias("t"))
        )
        stages.append(reached)
    counts = [
        s.agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.lit(i).cast("long").alias("step_idx"),
                F.lit(step).alias("step"), "n_users")
        for i, (step, s) in enumerate(zip(steps, stages))
    ]
    return reduce(DataFrame.unionByName, counts)


def events_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Registry-shaped query: the view → click → purchase conversion
    funnel over the events stream."""
    e = load_table(spark, sf, "events")
    return funnel(e, ["view", "click", "purchase"])


EVENTS_FUNNEL_SQL = """
WITH s0 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1
),
s1 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s0 ON s0.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s0.t
  GROUP BY 1
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s1.t
  GROUP BY 1
)
SELECT CAST(0 AS BIGINT) AS step_idx, 'view' AS step,
       (SELECT COUNT(*) FROM s0) AS n_users
UNION ALL
SELECT 1, 'click', (SELECT COUNT(*) FROM s1)
UNION ALL
SELECT 2, 'purchase', (SELECT COUNT(*) FROM s2)
"""


def retention(events: DataFrame, user_col: str = "user_id",
              ts_col: str = "ts", week_us: int = WEEK_US) -> DataFrame:
    """Weekly cohort retention: cohort = the week of a user's first
    event; each (cohort_week, week_n) cell counts distinct cohort
    users active week_n weeks later. cohort_week surfaces as the
    week-start DATE; week_n divides only the small (wk - c0)
    difference, so the arithmetic is exact cross-engine."""
    us = F.unix_micros(F.col(ts_col))
    wk = us - F.pmod(us, F.lit(week_us))
    acts = events.select(F.col(user_col).alias("user_id"),
                         wk.alias("wk")).distinct()
    cohort = acts.groupBy("user_id").agg(F.min("wk").alias("c0"))
    return (
        acts.join(cohort, "user_id")
        .groupBy(
            F.to_date(F.timestamp_micros(F.col("c0")))
            .alias("cohort_week"),
            ((F.col("wk") - F.col("c0")) / F.lit(week_us))
            .cast("long").alias("week_n"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def events_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Registry-shaped query: weekly cohort retention over events."""
    return retention(load_table(spark, sf, "events"))


EVENTS_RETENTION_SQL = """
WITH acts AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) - ((epoch_us(ts) % 604800000000 + 604800000000)
                         % 604800000000) AS wk
  FROM events
),
cohort AS (SELECT user_id, MIN(wk) AS c0 FROM acts GROUP BY 1)
SELECT CAST(make_timestamp(CAST(c.c0 AS BIGINT)) AS DATE)
         AS cohort_week,
       CAST((a.wk - c.c0) / 604800000000 AS BIGINT) AS week_n,
       COUNT(DISTINCT a.user_id) AS n_users
FROM acts a JOIN cohort c USING (user_id)
GROUP BY 1, 2
"""

QUERIES = {
    "events_funnel": (events_funnel, EVENTS_FUNNEL_SQL),
    "events_retention": (events_retention, EVENTS_RETENTION_SQL),
}
