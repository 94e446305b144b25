"""Event analytics — ordered funnels and cohort retention, the two
query shapes every product-analytics engine ships and the batch
time-series family (sessionize/gapfill/downsample) doesn't cover.

Scale shape: one hash partitioning on ``user_id``, no window over raw
events, no self-join explosion. The funnel scans ``events`` ONCE
(filtered to the step types), aggregates each user's per-step sorted
timestamp arrays in one groupBy, and resolves the ordered steps as
chained array expressions (step N's earliest timestamp strictly after
step N-1's) — an N-step funnel is one scan + one shuffle, not N scans
+ N joins (restructured per the r8 verdict, task 3). Retention buckets weeks with exact integer-µs arithmetic
(``us - pmod(us, week)``), and week INDICES derive only from small
differences — dividing a raw 2024 epoch-µs (≈1.7e18 > 2^53) by the
week width in double arithmetic would round the numerator before the
divide; ``(wk - cohort_start)`` is a few weeks of µs, exactly
representable, so the division is exact in both engines.

Registered in the r9 window (staged in r8 for capacity): the query fns
and oracles below follow the registry (spark, sf_dir) contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_core_spark.session import load_table

WEEK_US = 7 * 24 * 3600 * 1_000_000


def funnel(events: DataFrame, steps: list[str],
           user_col: str = "user_id", type_col: str = "event_type",
           ts_col: str = "ts") -> DataFrame:
    """Strict-order funnel: a user converts to step N at the earliest
    event of type ``steps[N]`` STRICTLY AFTER their step-N-1 time
    (greedy earliest matching — taking the earliest feasible time at
    each step is optimal for reach-step-N existence). Events with a
    NULL timestamp are unordered and never convert; events with a
    NULL user belong to no funnel and are excluded up front (a
    groupBy would otherwise fuse them into one pseudo-user, which a
    SQL equi-join formulation drops — the cross-engine divergence the
    r9 review caught). Returns one row per step: (step_idx, step,
    n_users) where n_users counts users who reached that step.

    Scale shape: ONE scan of ``events`` (filtered to the step types),
    ONE per-user aggregate collecting each step's sorted timestamp
    array, then the conversion chain and the final counts are plain
    column expressions — an N-step funnel was previously N scans + N
    joins (r8 verdict task 3). The per-user arrays hold only
    step-typed events of one user, the frame the chained-join
    formulation also shuffled per stage — here it shuffles once."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    per_user = events.select(user_col, type_col, ts_col).filter(
        F.col(type_col).isin(list(steps)) & F.col(ts_col).isNotNull()
        & F.col(user_col).isNotNull())
    arrs = per_user.groupBy(user_col).agg(*[
        F.sort_array(F.collect_list(
            F.when(F.col(type_col) == s, F.col(ts_col))))
        .alias(f"__ts_{i}")
        for i, s in enumerate(steps)
    ])
    # __t_i = the user's step-i conversion time (NULL = never reached):
    # the first step-i timestamp strictly after __t_{i-1}. NB: the HOF
    # lambda takes ONE parameter — a second would receive the array
    # index from F.filter — so the previous step's column is closed
    # over via a helper.
    def _after(prev):
        return lambda x: x > prev

    r = arrs.withColumn("__t_0",
                        F.try_element_at(F.col("__ts_0"), F.lit(1)))
    for i in range(1, len(steps)):
        r = r.withColumn(
            f"__t_{i}",
            F.array_min(F.filter(F.col(f"__ts_{i}"),
                                 _after(F.col(f"__t_{i - 1}")))))
    counts_row = r.agg(*[
        F.count(F.col(f"__t_{i}")).alias(f"__c_{i}")
        for i in range(len(steps))
    ])
    structs = [
        F.struct(F.lit(i).cast("long").alias("step_idx"),
                 F.lit(step).alias("step"),
                 F.col(f"__c_{i}").alias("n_users"))
        for i, step in enumerate(steps)
    ]
    return (counts_row
            .select(F.explode(F.array(*structs)).alias("__s"))
            .select("__s.step_idx", "__s.step", "__s.n_users"))


def events_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Registry-shaped query: the view → click → purchase conversion
    funnel over the events stream."""
    e = load_table(spark, sf, "events")
    return funnel(e, ["view", "click", "purchase"])


EVENTS_FUNNEL_SQL = """
WITH s0 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'view' AND ts IS NOT NULL
    AND user_id IS NOT NULL
  GROUP BY 1
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
