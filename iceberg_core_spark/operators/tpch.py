"""TPC-H-shaped multi-join analytical queries (Q3/Q5/Q10 adapted to the
driver's star schema) — the canonical join-order / broadcast-selection
workloads. All-DataFrame; Catalyst + AQE pick the physical join order,
dimensions broadcast explicitly.

Scale shape: fact-fact joins (orders⋈lineitem) shuffle once on the join
key; dimensions (region/nation, and customer at dimension-scale)
broadcast; aggregations are partial+final. These three are the bench
workhorses beyond single-join queries."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_core_spark.session import load_table

_REV = "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)"


def tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    """Shipping-priority shape: segment-filtered customers ⋈ orders ⋈
    lineitem, revenue per order, top 10."""
    c = load_table(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01 00:00:00").cast("timestamp")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # no broadcast hint on customer: it GROWS with SF, so a forced
        # broadcast would override the size threshold at scale — AQE
        # converts to broadcast at runtime when the filtered side is
        # actually small
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


TPCH_Q3_SQL = f"""
SELECT o_orderkey, o_orderdate, {_REV} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    """Local-supplier-volume shape: 6-way join, revenue per nation for
    one region/year where supplier and customer share a nation."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # supplier/customer grow with SF — no forced broadcast (AQE
        # upgrades to broadcast at runtime when small); nation/region
        # are fixed-size dimensions, hint stays
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c,
              (o.o_custkey == c.c_custkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


TPCH_Q5_SQL = f"""
SELECT n_name, {_REV} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


def tpch_q10(spark: SparkSession, sf: str) -> DataFrame:
    """Returned-item-reporting shape: revenue lost to returns per
    customer, top 20."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # grows with SF — AQE decides
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


TPCH_Q10_SQL = f"""
SELECT c_custkey, c_name, n_name, {_REV} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    """Pricing-summary shape: single-table scan-heavy aggregate over
    ~all of lineitem — the canonical map-side-partial aggregation
    benchmark (tiny group cardinality: returnflag × linestatus). No
    join, one shuffle of partial aggregates; the scan reads only the 7
    referenced columns (column pruning) with the date filter pushed.
    Averages are computed as exact decimal sums divided by the count
    in DOUBLE — IEEE division of identical inputs is deterministic
    across engines, unlike engine-native AVG over doubles."""
    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate")
        <= F.lit("1999-09-01 00:00:00").cast("timestamp")
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_price = (F.col("l_extendedprice")
                  * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    charge = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              * (1 + F.col("l_tax"))).cast("decimal(18,6)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(price).cast("double") / n).alias("avg_price"),
            (F.sum(disc).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


TPCH_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                     AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
         / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    """Forecasting-revenue shape: pure filter + global aggregate, zero
    joins — the predicate-pushdown showcase. All three filters reach
    the parquet scan (PushedFilters: shipdate range, discount band,
    quantity cap), so row groups outside the year skip entirely; the
    single-row result is a two-phase (partial + final) sum."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate")
           < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.04, 0.06)
        & (F.col("l_quantity") < 24)
    )
    rev = (F.col("l_extendedprice") * F.col("l_discount")).cast(
        "decimal(18,6)")
    return li.agg(F.sum(rev).cast("double").alias("revenue"))


TPCH_Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
"""


QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "tpch_q1": (tpch_q1, TPCH_Q1_SQL),
    "tpch_q3": (tpch_q3, TPCH_Q3_SQL),
    "tpch_q5": (tpch_q5, TPCH_Q5_SQL),
    "tpch_q6": (tpch_q6, TPCH_Q6_SQL),
    "tpch_q10": (tpch_q10, TPCH_Q10_SQL),
}
