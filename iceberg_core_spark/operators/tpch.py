"""TPC-H-shaped multi-join analytical queries — all 22 shapes, adapted
to the driver's star schema (no partsupp table: the six classics that
need one run against a part-supplier relation derived from lineitem;
no commit/receipt dates, phone, or comments: q21/q22/q16 substitute
available columns with the join/subquery shapes intact). The canonical
join-order / broadcast-selection workloads. All-DataFrame; Catalyst +
AQE pick the physical join order, dimensions broadcast explicitly.

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


def tpch_q4(spark: SparkSession, sf: str) -> DataFrame:
    """Order-priority-checking shape: EXISTS decorrelated to a LEFT SEMI
    join (Catalyst's native strategy for correlated EXISTS). The
    reference schema has no commit/receipt dates, so the late-lineitem
    predicate is ``l_shipdate > o_orderdate`` — same plan shape: a
    condition semi-join where only the orders side survives, then a tiny
    5-group count. At 100 TB the semi join shuffles both sides on
    orderkey once and ships NO lineitem payload columns past the join
    (semi joins project the left side only)."""
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate")
           < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf, "lineitem")
    return (
        o.join(li, (o.o_orderkey == li.l_orderkey)
               & (li.l_shipdate > o.o_orderdate), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


TPCH_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def tpch_q12(spark: SparkSession, sf: str) -> DataFrame:
    """Shipping-modes-and-priority shape (schema has no l_shipmode, so
    l_returnflag stands in as the 3-value grouping column): one
    fact-fact join on orderkey, then dual conditional counts — the
    canonical SUM(CASE...) pivot. Group cardinality 3, so the aggregate
    is almost entirely map-side partial."""
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate")
           < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


TPCH_Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def tpch_q14(spark: SparkSession, sf: str) -> DataFrame:
    """Promotion-effect shape: one ship-month of lineitem ⋈ part, promo
    revenue as a percentage of total — conditional aggregate over a
    join, single-row result. part grows with SF but stays
    dimension-sized (p_partkey is unique), so AQE turns the join into a
    broadcast when the build side fits; both sums ride one partial+final
    aggregation. Ratio computed as exact decimal sums divided in DOUBLE
    so both engines agree bit-for-bit."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate")
         >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate")
           < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,6)"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * F.sum(promo).cast("double")
             / F.sum(rev).cast("double")).alias("promo_revenue")
        )
    )


TPCH_Q14_SQL = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(18,6))
                  ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""


def tpch_q7(spark: SparkSession, sf: str) -> DataFrame:
    """Volume-shipping shape: supplier-nation × customer-nation revenue
    matrix for one ship-year (the classic Q7 pair filter generalized to
    the full matrix — the driver schema's synthetic nations make any
    single pair sparse). Plan: one fact-fact join on orderkey, then
    supplier/customer key joins with the two nation dims broadcast
    under DIFFERENT aliases; the matrix aggregate is partial+final over
    a bounded (25×25) key space."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate")
           < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    sup = load_table(spark, sf, "supplier")
    n1 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nkey"),
        F.col("n_name").alias("supp_nation"))
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_name").alias("cust_nation"))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), sup.s_nationkey == n1.s_nkey)
        .join(F.broadcast(n2), c.c_nationkey == n2.c_nkey)
        .groupBy("supp_nation", "cust_nation")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation")
    )


TPCH_Q7_SQL = f"""
SELECT supp_nation, cust_nation, {_REV} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
)
GROUP BY supp_nation, cust_nation
ORDER BY supp_nation, cust_nation
"""


def tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    """Large-volume-customer shape: lineitem aggregates ONCE per
    orderkey; the HAVING filter keeps the rare big orders; the
    surviving (orderkey, total) rows — order-granularity, not
    lineitem-granularity — join orders and customer. The classic
    formulation re-joins the FULL lineitem onto the surviving orders
    and re-aggregates the identical SUM a second time; since
    o_orderkey is in the final group key, that second aggregate is
    group-by-a-key-that-is-already-unique — the per-order total IS the
    HAVING subquery's sum (r15 optimization, guide §2.3/§2.4: one
    lineitem scan + one lineitem-scale exchange instead of two of
    each, and the wide joins run at order granularity). Same rows,
    same decimal→double values, proven against the unchanged oracle
    and a pre-change output snapshot."""
    li = load_table(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 150)
    )
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice",
                F.col("q").cast("double").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


TPCH_Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def tpch_q8(spark: SparkSession, sf: str) -> DataFrame:
    """National-market-share shape: 8-way join, one product type sold
    into one region over two years, share of revenue supplied by one
    nation per order-year — the canonical conditional-ratio-over-a-wide-
    join. Plan: the two fact tables join once on orderkey; part/supplier
    are dimension-sized (AQE broadcasts when the build side fits);
    nation (two aliases) and region are fixed dims, hints stay. Both
    ratio legs are exact decimal sums divided in DOUBLE."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(F.col("p_type") == "ECONOMY")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate")
           < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = load_table(spark, sf, "customer")
    sup = load_table(spark, sf, "supplier")
    n1 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_regionkey").alias("c_rkey"))
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nkey"),
        F.col("n_name").alias("supp_nation"))
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)")
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
        F.lit(0).cast("decimal(18,6)"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.c_nkey)
        .join(F.broadcast(r), n1.c_rkey == r.r_regionkey)
        .join(F.broadcast(n2), sup.s_nationkey == n2.s_nkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(nation_rev).cast("double")
              / F.sum(rev).cast("double")).alias("mkt_share"))
        .orderBy("o_year")
    )


TPCH_Q8_SQL = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                THEN CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(18,6))
                ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_year
ORDER BY o_year
"""


def tpch_q13(spark: SparkSession, sf: str) -> DataFrame:
    """Customer-order-distribution shape: LEFT OUTER join with an
    ON-clause filter (orders surviving a priority predicate — the
    schema's stand-in for the comment NOT LIKE), then a two-level
    aggregate: orders per customer, customers per order-count. The
    outer join keeps order-less customers as count 0 — the part an
    inner join would silently drop. Both aggregations shuffle on small
    keys (custkey, then a tiny count domain)."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    per_cust = (
        c.join(o, (c.c_custkey == o.o_custkey)
               & (o.o_orderpriority != "1-URGENT"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


TPCH_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def tpch_q17(spark: SparkSession, sf: str) -> DataFrame:
    """Small-quantity-order-revenue shape: the correlated scalar
    subquery (20% of each part's average quantity) decorrelated into a
    per-part aggregate joined back on partkey — Catalyst's standard
    rewrite, expressed directly. At scale the per-part cap aggregate
    and the probe side shuffle on the same key (partkey), so AQE reuses
    the exchange; the brand/size filter prunes the part dim before the
    join. Averages are exact decimal sums divided by counts in DOUBLE."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 25)
    )
    cap = (
        li.groupBy(F.col("l_partkey").alias("cap_partkey"))
        .agg((F.lit(0.2)
              * F.sum(F.col("l_quantity").cast("decimal(18,2)"))
              .cast("double")
              / F.count(F.lit(1))).alias("qty_cap"))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(cap, li.l_partkey == cap.cap_partkey)
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg((F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
              .cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


TPCH_Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3' AND p_size < 25
  AND l_quantity < (
    SELECT 0.2 * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*)
    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
"""


def tpch_q19(spark: SparkSession, sf: str) -> DataFrame:
    """Discounted-revenue shape: disjunction of three conjunctive
    brand/size/quantity clauses over lineitem ⋈ part — the canonical
    OR-of-ANDs predicate test. The join key plus the disjunction is one
    equi-join with a residual filter; the common `p_partkey =
    l_partkey` factors out so Catalyst still plans an equi-join (not a
    cartesian), and the shared `p_size >= 1` bound pushes to the part
    scan."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    clause = (
        ((F.col("p_brand") == "Brand#1")
         & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2")
           & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3")
           & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(clause)
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


TPCH_Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


def tpch_q21(spark: SparkSession, sf: str) -> DataFrame:
    """Suppliers-who-kept-orders-waiting shape: EXISTS + NOT EXISTS
    self-joins on lineitem. The schema has no commit/receipt dates, so
    "late" is shipping >60 days after the order date. A supplier is
    counted when it shipped late on a finished multi-supplier order
    where NO other supplier was late (sole blame). Plan: the lateness
    base joins orders once; the EXISTS becomes a left-semi and the NOT
    EXISTS a left-anti self-join, both shuffling on orderkey — three
    hash joins on the same key, no payload duplication (semi/anti
    project the left side only)."""
    from pyspark.sql import Window

    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderstatus") == "F")
    li = load_table(spark, sf, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS")
    sup = load_table(spark, sf, "supplier")
    # ONE lineitem pass (r15 optimization, guide §2.4): the EXISTS and
    # NOT-EXISTS self-joins are order-local predicates, so a single
    # window over l_orderkey answers both — "another supplier exists"
    # is |distinct suppliers of the order| > 1 and "no OTHER supplier
    # was late" is |distinct LATE suppliers| == 1 (the row itself is
    # late, so its suppkey is in the set; a second member would be
    # another late supplier). The window shares the orderkey
    # partitioning the li⋈orders join establishes at scale (no extra
    # exchange after a sort-merge join), replacing two more
    # lineitem-scale joins (3 lineitem scans → 1). Row set proven
    # identical against the unchanged EXISTS/NOT-EXISTS oracle and a
    # pre-change output snapshot.
    w = Window.partitionBy("l_orderkey")
    flagged = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("__late"))
        .withColumn("__n_supp",
                    F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn("__n_late", F.size(F.collect_set(
            F.when(F.col("__late"), F.col("l_suppkey"))).over(w)))
    )
    waiting = flagged.filter(
        F.col("__late") & (F.col("__n_supp") > 1)
        & (F.col("__n_late") == 1))
    return (
        waiting.join(sup, waiting.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


TPCH_Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


_Q22_CODES = ("13", "31", "23", "29", "30", "18", "17", "02", "05", "11")


def tpch_q22(spark: SparkSession, sf: str) -> DataFrame:
    """Global-sales-opportunity shape: scalar subquery (average balance
    of positive-balance customers in a code set) + anti join (dormant:
    no orders since 1999) + grouped count/sum. The schema has no phone,
    so the country code is the last two digits of c_name; the classic
    "no orders at all" anti join is "no RECENT orders" because the
    generator gives every customer at least one order. Plan: the
    1-row average broadcasts as a cross join (scalar), the anti join
    shuffles on custkey, and the final aggregate is tiny (≤100
    codes)."""
    c = load_table(spark, sf, "customer").withColumn(
        "cntrycode", F.expr("right(c_name, 2)")
    ).filter(F.col("cntrycode").isin(*_Q22_CODES))
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
              .cast("double") / F.count(F.lit(1))).alias("avg_bal"))
    )
    recent = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate")
        >= F.lit("1999-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == recent.o_custkey,
              "left_anti")
        .groupBy("cntrycode")
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
             .cast("double").alias("totacctbal"))
        .orderBy("cntrycode")
    )


TPCH_Q22_SQL = """
WITH cust AS (
  SELECT right(c_name, 2) AS cntrycode, c_acctbal, c_custkey
  FROM customer
  WHERE right(c_name, 2) IN
    ('13','31','23','29','30','18','17','02','05','11')
)
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
         AS totacctbal
FROM cust
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(*)
    FROM cust WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY cntrycode
ORDER BY cntrycode
"""


def _derived_partsupp(spark: SparkSession, sf: str) -> DataFrame:
    """The schema has no PARTSUPP table; the part-supplier relation is
    derived from lineitem: one row per observed (partkey, suppkey) with
    the minimum observed unit price as the supply cost. Double/double
    division is IEEE-identical cross-engine, so min over it is exact.
    At scale this is one hash aggregation on (partkey, suppkey) — the
    same key the q2/q16/q20 consumers join on, so AQE reuses the
    exchange."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.groupBy(F.col("l_partkey").alias("ps_partkey"),
                   F.col("l_suppkey").alias("ps_suppkey"))
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
             .alias("ps_supplycost"))
    )


_PS_SQL = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice / l_quantity) AS ps_supplycost
  FROM lineitem GROUP BY 1, 2
"""


def tpch_q2(spark: SparkSession, sf: str) -> DataFrame:
    """Minimum-cost-supplier shape: for each qualifying part, the
    EUROPE supplier(s) whose derived supply cost equals the per-part
    regional minimum — the classic correlated-MIN subquery,
    decorrelated into a per-part aggregate joined back on (partkey,
    cost). The min is over doubles both engines derived identically,
    so the equality join is exact. Plan: the EUROPE supplier side is
    built ONCE and feeds both the min aggregate and the final probe
    (same partkey shuffle, AQE exchange reuse); nation/region
    broadcast."""
    ps = _derived_partsupp(spark, sf)
    sup = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    reg = load_table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE"))
    eu_ps = (
        ps.join(sup, ps.ps_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    mincost = (
        eu_ps.groupBy(F.col("ps_partkey").alias("min_partkey"))
        .agg(F.min("ps_supplycost").alias("min_cost"))
    )
    return (
        eu_ps.join(mincost,
                   (F.col("ps_partkey") == F.col("min_partkey"))
                   & (F.col("ps_supplycost") == F.col("min_cost")))
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                F.col("ps_supplycost").alias("supplycost"))
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                 "p_partkey")
        .limit(100)
    )


TPCH_Q2_SQL = f"""
WITH ps AS ({_PS_SQL})
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       ps_supplycost AS supplycost
FROM part
JOIN ps ON ps_partkey = p_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE p_size <= 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT MIN(ps2.ps_supplycost)
    FROM ps ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def tpch_q9(spark: SparkSession, sf: str) -> DataFrame:
    """Product-type-profit shape: 5-way join (lineitem ⋈ part ⋈
    supplier ⋈ nation ⋈ orders), profit per supplier-nation per order
    year. The schema has no ps_supplycost, so cost is 80% of the
    part's retail price — deterministic and partsupp-free. Profit
    computed in double with one fixed association then summed as
    DECIMAL for cross-engine exactness. Plan: one fact-fact shuffle
    (lineitem⋈orders on orderkey); part/supplier/nation broadcast at
    dimension scale; the group key (25 nations × 7 years) is tiny so
    the final aggregate is all partial-combine."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(
        F.col("p_name").startswith("red"))
    sup = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    o = load_table(spark, sf, "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.8) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,6)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


TPCH_Q9_SQL = """
SELECT n_name AS nation,
       EXTRACT(year FROM o_orderdate) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     - 0.8 * p_retailprice * l_quantity
                     AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE 'red%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


def tpch_q11(spark: SparkSession, sf: str) -> DataFrame:
    """Important-stock shape: per-part shipped value for one REGION's
    suppliers, kept when above a fixed fraction of that region's
    total — the scalar-subquery-threshold test (region, not the
    original single nation, so the filter is non-empty at every scale
    factor). Values are exact DECIMAL sums (cross-engine identical);
    the threshold multiply casts to double the same way in both
    engines. Plan: one hash agg on partkey after a broadcast
    supplier→nation→region filter; the 1-row total broadcasts as a
    scalar cross join."""
    li = load_table(spark, sf, "lineitem")
    sup = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    reg = load_table(spark, sf, "region").filter(
        F.col("r_name") == "ASIA")
    supval = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
             .alias("val"))
    )
    total = supval.agg(
        (F.sum("val") * F.lit(0.001)).alias("threshold"))
    return (
        supval.crossJoin(F.broadcast(total))
        .filter(F.col("val") > F.col("threshold"))
        .select("partkey", F.col("val").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "partkey")
    )


TPCH_Q11_SQL = """
WITH supval AS (
  SELECT l_partkey AS partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'ASIA'
  GROUP BY 1
)
SELECT partkey, CAST(val AS DOUBLE) AS value
FROM supval
WHERE CAST(val AS DOUBLE)
      > (SELECT CAST(SUM(val) AS DOUBLE) * 0.001 FROM supval)
ORDER BY value DESC, partkey
"""


def tpch_q15(spark: SparkSession, sf: str) -> DataFrame:
    """Top-supplier shape: quarterly revenue per supplier, keep the
    supplier(s) whose revenue equals the global max — the classic
    view + scalar MAX subquery. Revenue is an exact DECIMAL sum, so
    the max-equality is cross-engine safe (a double sum would not
    be: FP addition order differs per engine). Plan: one hash agg on
    suppkey over the date-pruned scan; the 1-row max broadcasts."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate")
           < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                   .cast("decimal(18,6)")).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    sup = load_table(spark, sf, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(sup, F.col("supplier_no") == sup.s_suppkey)
        .select("s_suppkey", "s_name",
                F.col("total_rev").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


TPCH_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(18,6))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier
JOIN rev ON supplier_no = s_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
ORDER BY s_suppkey
"""


def tpch_q16(spark: SparkSession, sf: str) -> DataFrame:
    """Parts-supplier-relationship shape: distinct supplier count per
    (brand, type, size) over the derived part-supplier relation,
    excluding flagged suppliers — NOT IN as a left-anti join. The
    schema has no s_comment, so "complaints" is a negative account
    balance. Plan: the distinct (partkey, suppkey) pairs are one
    aggregation; the exclusion list (few rows) broadcasts as an anti
    join; COUNT(DISTINCT) shuffles on the small group key space."""
    li = load_table(spark, sf, "lineitem")
    ps = li.select(F.col("l_partkey").alias("ps_partkey"),
                   F.col("l_suppkey").alias("ps_suppkey")).distinct()
    p = load_table(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#5") & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    bad = load_table(spark, sf, "supplier").filter(
        F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad),
                F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type",
                 "p_size")
    )


TPCH_Q16_SQL = """
WITH ps AS (
  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
  FROM lineitem
)
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM ps
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def tpch_q20(spark: SparkSession, sf: str) -> DataFrame:
    """Part-promotion shape: EUROPE suppliers who DOMINATED supply of
    a name-filtered part in 1996 (shipped >30% of that part's total
    that year) — nested aggregation + IN-subqueries as semi joins.
    The schema has no ps_availqty, so the original half-of-stock
    predicate becomes a share-of-shipments predicate with the same
    aggregate-vs-aggregate comparison shape. Quantities sum as exact
    DECIMAL. Plan: per-(part, supplier) and per-part aggs share the
    partkey shuffle; part-name filter broadcasts; the qualifying
    supplier set feeds a semi join (no payload duplication)."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate")
           < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf, "part").filter(
        F.col("p_name").startswith("small")).select("p_partkey")
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
             .alias("qty"))
    )
    tot = (
        shipped.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg(F.sum("qty").alias("total_qty"))
    )
    dominant = (
        shipped.join(tot, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("qty") > F.lit(0.3) * F.col("total_qty"))
        .select("l_suppkey")
    )
    sup = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    reg = load_table(spark, sf, "region").filter(
        F.col("r_name") == "EUROPE")
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .join(dominant, sup.s_suppkey == dominant.l_suppkey,
              "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


TPCH_Q20_SQL = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    AND l_partkey IN (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY 1, 2
),
tot AS (
  SELECT l_partkey AS t_partkey, SUM(qty) AS total_qty
  FROM shipped GROUP BY 1
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
    SELECT l_suppkey FROM shipped
    JOIN tot ON t_partkey = l_partkey
    WHERE CAST(qty AS DOUBLE) > 0.3 * CAST(total_qty AS DOUBLE))
ORDER BY s_name
"""


QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "tpch_q2": (tpch_q2, TPCH_Q2_SQL),
    "tpch_q9": (tpch_q9, TPCH_Q9_SQL),
    "tpch_q11": (tpch_q11, TPCH_Q11_SQL),
    "tpch_q15": (tpch_q15, TPCH_Q15_SQL),
    "tpch_q16": (tpch_q16, TPCH_Q16_SQL),
    "tpch_q20": (tpch_q20, TPCH_Q20_SQL),
    "tpch_q1": (tpch_q1, TPCH_Q1_SQL),
    "tpch_q3": (tpch_q3, TPCH_Q3_SQL),
    "tpch_q4": (tpch_q4, TPCH_Q4_SQL),
    "tpch_q5": (tpch_q5, TPCH_Q5_SQL),
    "tpch_q6": (tpch_q6, TPCH_Q6_SQL),
    "tpch_q7": (tpch_q7, TPCH_Q7_SQL),
    "tpch_q8": (tpch_q8, TPCH_Q8_SQL),
    "tpch_q10": (tpch_q10, TPCH_Q10_SQL),
    "tpch_q12": (tpch_q12, TPCH_Q12_SQL),
    "tpch_q13": (tpch_q13, TPCH_Q13_SQL),
    "tpch_q14": (tpch_q14, TPCH_Q14_SQL),
    "tpch_q17": (tpch_q17, TPCH_Q17_SQL),
    "tpch_q18": (tpch_q18, TPCH_Q18_SQL),
    "tpch_q19": (tpch_q19, TPCH_Q19_SQL),
    "tpch_q21": (tpch_q21, TPCH_Q21_SQL),
    "tpch_q22": (tpch_q22, TPCH_Q22_SQL),
}
