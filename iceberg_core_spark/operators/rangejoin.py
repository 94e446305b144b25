"""Range (interval) join: match points to intervals containing them.

Declared naively (``p.ts BETWEEN i.lo AND i.hi``) Spark has no equi
key, so Catalyst plans a BroadcastNestedLoopJoin — O(points ×
intervals) compares, the classic range-join scale cliff. The
Spark-first fix is the BUCKETIZED composition (what the Databricks
range-join hint does inside the engine, here as plain DataFrame ops):

1. pick a bucket width W (≈ the typical interval length);
2. each interval replicates to the buckets its [lo, hi] overlaps —
   ``sequence(floor(lo/W), floor(hi/W))`` exploded; an interval of
   length L lands in ceil(L/W)+1 buckets, a SMALL constant;
3. each point maps to its single bucket ``floor(ts/W)``;
4. EQUI-join on the bucket (hash exchange both sides — shuffles,
   AQE, skew handling all apply), then the exact ``BETWEEN`` as a
   residual filter.

At 100 TB: the join carries each point once and each interval
~(L/W + 1) times; no executor ever sees the cross product. The plan
is gated in tests (a SortMergeJoin/BroadcastHashJoin on the bucket,
never BroadcastNestedLoopJoin).

Bucket arithmetic is exact int64 (``x - pmod(x, W)`` floors like the
time-series operators; ``sequence`` steps by W), so a boundary point
can never land in the wrong bucket cross-engine.

Registered in the r9 window (staged in r8 for capacity): the query fn
and oracle below follow the registry (spark, sf_dir) contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_core_spark.session import load_table


def range_join(points: DataFrame, intervals: DataFrame,
               point_col: str, lo_col: str, hi_col: str,
               bucket_width: int, how: str = "inner") -> DataFrame:
    """Join each row of ``points`` to every row of ``intervals`` whose
    ``[lo_col, hi_col]`` contains ``point_col`` (inclusive both ends;
    integer domains — epoch-µs, keys). Returns the combined columns.

    ``bucket_width`` trades replication for selectivity: intervals
    replicate ceil(len/W)+1 times, and a bucket's residual filter
    sees only points within W of some interval. Pick W near the
    median interval length.

    Inverted intervals (``hi < lo``) contain nothing, matching
    BETWEEN semantics — they are filtered out rather than crashing
    ``sequence``. ``how`` is restricted to the point-side join types
    (inner / left / left_semi / left_anti): points carry exactly one
    bucket so their multiplicity is exact, while an unmatched
    INTERVAL exists once per bucket replica — a right/full join
    would null-extend every replica and emit duplicate interval
    rows, so those types are rejected.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    allowed = {"inner", "left", "leftouter", "left_outer",
               "semi", "leftsemi", "left_semi",
               "anti", "leftanti", "left_anti"}
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"how={how!r} not supported: interval rows are bucket-"
            "replicated, so interval-side outer joins would emit one "
            "null-extended row PER REPLICA — use inner/left/"
            "left_semi/left_anti")
    w = F.lit(int(bucket_width))
    p_b = F.col(point_col) - F.pmod(F.col(point_col), w)
    lo_b = F.col(lo_col) - F.pmod(F.col(lo_col), w)
    hi_b = F.col(hi_col) - F.pmod(F.col(hi_col), w)
    ivals = (
        intervals.filter(F.col(lo_col) <= F.col(hi_col))
        .withColumn("__bucket", F.explode(F.sequence(lo_b, hi_b, w)))
    )
    pts = points.withColumn("__bucket", p_b)
    joined = pts.join(
        ivals,
        on=[pts["__bucket"] == ivals["__bucket"],
            F.col(point_col) >= F.col(lo_col),
            F.col(point_col) <= F.col(hi_col)],
        how=how,
    )
    return joined.drop("__bucket")


def orders_fulfillment_window(spark: SparkSession, sf: str) -> DataFrame:
    """Registry-shaped query: for March-1996 orders, how many line
    items (across ALL orders — a true cross-range match, not the
    orderkey equi-join) shipped within each order's first fulfillment
    week, rolled up by order priority.

    Dates join as epoch-day integers; the 7-day window matches the
    bucket width so each interval replicates at most twice.
    """
    orders = (
        load_table(spark, sf, "orders")
        .filter((F.col("o_orderdate") >= "1996-03-01")
                & (F.col("o_orderdate") < "1996-04-01"))
        .select("o_orderkey", "o_orderpriority",
                F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
                .cast("long").alias("lo"))
        .withColumn("hi", F.col("lo") + F.lit(6).cast("long"))
    )
    line = load_table(spark, sf, "lineitem").select(
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01"))
        .cast("long").alias("ship_day"))
    matched = range_join(line, orders, "ship_day", "lo", "hi",
                         bucket_width=7)
    return (
        matched.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_shipped"),
             F.countDistinct("o_orderkey").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


ORDERS_FULFILLMENT_WINDOW_SQL = """
SELECT o.o_orderpriority,
       COUNT(*) AS n_shipped,
       COUNT(DISTINCT o.o_orderkey) AS n_orders
FROM (
  SELECT o_orderkey, o_orderpriority,
         datediff('day', DATE '1970-01-01', o_orderdate) AS lo,
         datediff('day', DATE '1970-01-01', o_orderdate) + 6 AS hi
  FROM orders
  WHERE o_orderdate >= DATE '1996-03-01'
    AND o_orderdate <  DATE '1996-04-01'
) o
JOIN (
  SELECT datediff('day', DATE '1970-01-01', l_shipdate) AS ship_day
  FROM lineitem
) l
  ON l.ship_day BETWEEN o.lo AND o.hi
GROUP BY 1
ORDER BY 1
"""

QUERIES = {
    "range_join_window": (orders_fulfillment_window,
                          ORDERS_FULFILLMENT_WINDOW_SQL),
}
