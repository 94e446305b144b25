"""Declared relational operator surface (SURVEY.md §2.B) with DuckDB
oracles.

``QUERIES`` maps operator name → (spark_fn, oracle_sql | None). Each
spark_fn takes (spark, sf_dir) and returns a DataFrame; the oracle SQL
computes the same result in DuckDB over pre-registered views of the same
parquet. Conventions that keep the driver's order-insensitive value hash
stable across engines:

- Every computed column is aliased identically on both sides.
- Floating-point SUM/AVG go through DECIMAL (exact, associative — immune
  to partial-aggregation order) and are cast back to DOUBLE at the end;
  no DECIMAL column ever reaches the output (repr differences).
- Single-expression FP arithmetic (a*b, a-b, abs, sqrt, floor) is IEEE-
  deterministic and used freely; libm-dependent fns (ln, pow) and
  round-on-double (engine rounding modes differ) are avoided in hashed
  outputs.
- Windows and LIMITs always order by a unique tiebreaker.

Scale notes are on each operator; the common ones: aggregations are
partial+final (map-side combine) automatically; joins broadcast when one
side fits (explicit ``F.broadcast`` on dimension tables); everything
else is one shuffle on the natural key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_core_spark.operators.asof import asof_join
from iceberg_core_spark.session import load_table


def _dsum(col, alias: str, scale: int = 2):
    """Exact decimal sum of a double column, returned as DOUBLE."""
    return (
        F.sum(F.col(col).cast(f"decimal(18,{scale})"))
        .cast("double")
        .alias(alias)
    )


def _davg(col, alias: str, scale: int = 2):
    """avg = exact decimal sum / count, both engines compute identically."""
    return (
        F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double")
        / F.count(F.lit(1))
    ).alias(alias)


def _sql_dsum(col: str, alias: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"


def _sql_davg(col: str, alias: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST({col} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT(*) AS {alias}"
    )


# ---------------------------------------------------------------------------
# scans / projection / filters  (reference R1, R12, R14, R15)
# ---------------------------------------------------------------------------

def scan_parquet(spark: SparkSession, sf: str) -> DataFrame:
    """Plain columnar scan. Catalyst prunes columns to the projection."""
    return load_table(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")


SCAN_SQL = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


def project(spark: SparkSession, sf: str) -> DataFrame:
    """Projection with derived columns — stays in whole-stage codegen."""
    li = load_table(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        (F.col("l_quantity") * 2).alias("qty2"),
    )


PROJECT_SQL = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price,
       l_quantity * 2 AS qty2
FROM lineitem
"""


def filter_pred(spark: SparkSession, sf: str) -> DataFrame:
    """Compound boolean predicates: =, >, IN, LIKE, AND/OR/NOT, IS NOT NULL.
    All push down to the parquet scan (PushedFilters)."""
    o = load_table(spark, sf, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "O")
        & (
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            | (F.col("o_totalprice") > 300000.0)
        )
        & ~F.col("o_orderpriority").like("%LOW%")
        & (F.col("o_orderkey") % 3 != 0)
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")


FILTER_PRED_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
WHERE o_orderstatus = 'O'
  AND (o_orderpriority IN ('1-URGENT', '2-HIGH') OR o_totalprice > 300000.0)
  AND o_orderpriority NOT LIKE '%LOW%'
  AND o_orderkey % 3 <> 0
  AND o_custkey IS NOT NULL
"""


def filter_range(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's sole query shape (R15): partition value + inclusive
    key range. Partition pruning + min/max skipping + residual filter.

    Type-driven ts handling: current driver datasets store events.ts as
    TIMESTAMP(MICROS, NTZ), where a plain timestamp range predicate
    pushes down directly (the common branch below). If a dataset stores
    ts as TIMESTAMP(NANOS) — which Spark's reader can only surface as a
    raw nanos long — the predicate is applied to the RAW long (pushes to
    row-group skipping; a filter on the converted µs column cannot push
    through the conversion expression) with exact µs→ns bound mapping,
    and the µs conversion happens above the pruned scan."""
    import datetime

    from iceberg_core_spark.session import load_table_raw

    raw, nanos_cols = load_table_raw(spark, sf, "events")
    lo = datetime.datetime(2024, 1, 5)
    hi = datetime.datetime(2024, 1, 20)
    epoch = datetime.datetime(1970, 1, 1)
    lo_ns = int((lo - epoch).total_seconds()) * 1_000_000_000
    # inclusive hi at µs precision → any ns value truncating to hi_µs
    hi_ns = int((hi - epoch).total_seconds()) * 1_000_000_000 + 999
    if "ts" in nanos_cols:
        out = raw.filter(
            (F.col("user_id") == 7)
            & (F.col("ts") >= lo_ns)
            & (F.col("ts") <= hi_ns)
        ).withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:  # already timestamp-typed (other datasets)
        out = raw.filter(
            (F.col("user_id") == 7)
            & (F.col("ts") >= F.lit(lo))
            & (F.col("ts") <= F.lit(hi))
        )
    return out.select("event_id", "ts", "user_id", "event_type", "value")


FILTER_RANGE_SQL = """
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE user_id = 7
  AND ts >= TIMESTAMP '2024-01-05 00:00:00'
  AND ts <= TIMESTAMP '2024-01-20 00:00:00'
"""


# ---------------------------------------------------------------------------
# scalar function surface
# ---------------------------------------------------------------------------

def scalar_string(spark: SparkSession, sf: str) -> DataFrame:
    p = load_table(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.upper("p_name").alias("name_up"),
        F.lower("p_type").alias("type_lo"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name4"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.size(F.split("p_name", " ")).alias("n_tokens"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.col("p_name").contains("red").alias("has_red"),
    )


SCALAR_STRING_SQL = """
SELECT p_partkey,
       p_brand || '/' || p_type AS brand_type,
       upper(p_name) AS name_up,
       lower(p_type) AS type_lo,
       length(p_name) AS name_len,
       substring(p_name, 1, 4) AS name4,
       trim('  pad  ') AS trimmed,
       len(string_split(p_name, ' ')) AS n_tokens,
       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
       contains(p_name, 'red') AS has_red
FROM part
"""


def scalar_date(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.col("o_orderdate").cast("date").alias("od"),
        F.datediff(F.lit("1998-01-01").cast("date"),
                   F.col("o_orderdate").cast("date")).alias("days_to_98"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("epoch_ms"),
    )


SCALAR_DATE_SQL = """
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       day(o_orderdate) AS dom,
       quarter(o_orderdate) AS qtr,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(o_orderdate AS DATE) AS od,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
       epoch_ms(o_orderdate) AS epoch_ms
FROM orders
"""


def scalar_math(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.round(F.col("l_extendedprice").cast("decimal(18,2)"), 1)
        .cast("double").alias("price_round1"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


SCALAR_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05) AS abs_disc,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       sqrt(l_quantity) AS qty_sqrt,
       l_orderkey % 7 AS key_mod7,
       CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_round1,
       greatest(l_tax, l_discount) AS max_rate,
       least(l_tax, l_discount) AS min_rate
FROM lineitem
"""


def scalar_array(spark: SparkSession, sf: str) -> DataFrame:
    """Array functions over tokenized text (split → size/contains/element_at/
    sorted first token). Arrays are reduced to scalars for hash stability."""
    d = load_table(spark, sf, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.element_at(toks, 1).alias("tok1"),
        F.element_at(toks, 3).alias("tok3"),
        F.array_min(F.array_sort(toks)).alias("tok_min"),
        F.array_max(toks).alias("tok_max"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


SCALAR_ARRAY_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       list_contains(string_split(text, ' '), 'spark') AS has_spark,
       string_split(text, ' ')[1] AS tok1,
       string_split(text, ' ')[3] AS tok3,
       list_min(string_split(text, ' ')) AS tok_min,
       list_max(string_split(text, ' ')) AS tok_max,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens
FROM documents
"""


def scalar_json(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing"),
    )


SCALAR_JSON_SQL = """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
       json_extract_string(props, '$.missing') AS missing
FROM events
"""


# ---------------------------------------------------------------------------
# aggregations (TPC-H Q1 shape and friends)
# ---------------------------------------------------------------------------

def agg_hash(spark: SparkSession, sf: str) -> DataFrame:
    """Pricing summary (TPC-H Q1). Partial aggregation is map-side; the
    shuffle moves only (flag, status) groups — trivially 100TB-safe."""
    from iceberg_core_spark.session import spread

    li = spread(load_table(spark, sf, "lineitem")).filter(
        F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp")
    )
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(18,6)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty"),
            _dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            _davg("l_quantity", "avg_qty"),
            _davg("l_extendedprice", "avg_price"),
            _davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


AGG_HASH_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {_sql_dsum('l_quantity', 'sum_qty')},
       {_sql_dsum('l_extendedprice', 'sum_base_price')},
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       {_sql_davg('l_quantity', 'avg_qty')},
       {_sql_davg('l_extendedprice', 'avg_price')},
       {_sql_davg('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def agg_distinct(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


AGG_DISTINCT_SQL = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderpriority
"""


def agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_cust"),
        _dsum("c_acctbal", "total_bal"),
    )


AGG_ROLLUP_SQL = f"""
SELECT r_name, n_name, COUNT(*) AS n_cust, {_sql_dsum('c_acctbal', 'total_bal')}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def agg_cube(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .cube("c_mktsegment", "n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"), _davg("c_acctbal", "avg_bal"))
    )


AGG_CUBE_SQL = f"""
SELECT c_mktsegment, n_name, COUNT(*) AS n_cust, {_sql_davg('c_acctbal', 'avg_bal')}
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY CUBE (c_mktsegment, n_name)
"""


def agg_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    for name, df in [("supplier", s), ("nation", n), ("region", r)]:
        df.createOrReplaceTempView(name)
    return spark.sql(AGG_GROUPING_SETS_SQL)


AGG_GROUPING_SETS_SQL = f"""
SELECT n_name, r_name, COUNT(*) AS n_supp, {_sql_dsum('s_acctbal', 'total_bal')}
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((n_name), (r_name), ())
"""


def agg_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HLL++ sketch — engine-specific estimates, so no value oracle
    (driver records rows-only). The exact twin is agg_distinct."""
    ev = load_table(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
    )


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------

def join_broadcast(spark: SparkSession, sf: str) -> DataFrame:
    """Fact ⋈ dimension: explicit broadcast of `part` — zero shuffle of
    the fact side; at 100 TB the 2M-row part table broadcasts in MBs."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_items"), _dsum("l_extendedprice", "revenue"))
    )


JOIN_BROADCAST_SQL = f"""
SELECT p_brand, COUNT(*) AS n_items, {_sql_dsum('l_extendedprice', 'revenue')}
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def join_sortmerge(spark: SparkSession, sf: str) -> DataFrame:
    """Fact ⋈ fact: both sides shuffle on the join key once (sort-merge);
    AQE converts to broadcast if one side turns out small at runtime."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    return (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dsum("l_extendedprice", "revenue"),
        )
    )


JOIN_SORTMERGE_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_items, {_sql_dsum('l_extendedprice', 'revenue')}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def join_left(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer: customers keep a row even with zero qualifying orders."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(F.col("o_totalprice") > 200000.0)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_big_orders"),
            _dsum("o_totalprice", "big_total"),
        )
    )


JOIN_LEFT_SQL = f"""
SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_big_orders,
       {_sql_dsum('o_totalprice', 'big_total')}
FROM customer
LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 200000.0) o
  ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""


def join_right(spark: SparkSession, sf: str) -> DataFrame:
    """Right outer: the mirror of join_left expressed from the fact side —
    every part keeps a row even with zero qualifying (late-shipped)
    lineitems. Catalyst flips a right join to a left join internally,
    so the plan cost is identical to join_left; the declared operator
    is the API surface."""
    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    p = load_table(spark, sf, "part")
    return (
        li.join(p, li.l_partkey == p.p_partkey, "right")
        .groupBy("p_partkey", "p_brand")
        .agg(
            F.count("l_orderkey").alias("n_late_items"),
            _dsum("l_extendedprice", "late_total"),
        )
    )


JOIN_RIGHT_SQL = f"""
SELECT p_partkey, p_brand, COUNT(l_orderkey) AS n_late_items,
       {_sql_dsum('l_extendedprice', 'late_total')}
FROM (SELECT * FROM lineitem
      WHERE l_shipdate > TIMESTAMP '2000-01-01 00:00:00') li
RIGHT JOIN part ON l_partkey = p_partkey
GROUP BY p_partkey, p_brand
"""


def join_full(spark: SparkSession, sf: str) -> DataFrame:
    """Full outer over per-nation customer vs supplier counts."""
    c = (
        load_table(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf, "supplier")
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.ck == s.sk, "full").select("ck", "sk", "n_cust", "n_supp")


JOIN_FULL_SQL = """
SELECT ck, sk, n_cust, n_supp
FROM (SELECT c_nationkey AS ck, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
FULL JOIN (SELECT s_nationkey AS sk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
  ON ck = sk
"""


def join_semi(spark: SparkSession, sf: str) -> DataFrame:
    """Left semi: orders with ≥1 late-shipped item. Only keys shuffle."""
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )


JOIN_SEMI_SQL = """
SELECT o_orderkey, o_totalprice, o_orderstatus
FROM orders
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem WHERE l_shipdate > TIMESTAMP '2000-01-01 00:00:00'
)
"""


def join_anti(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").select(
        "o_orderkey", "o_orderstatus"
    )


JOIN_ANTI_SQL = """
SELECT o_orderkey, o_orderstatus
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > TIMESTAMP '2000-01-01 00:00:00'
)
"""


def join_theta(spark: SparkSession, sf: str) -> DataFrame:
    """Equi key + inequality residual (band join). The equi component
    keeps it a hash/merge join; the inequality is a cheap residual —
    never a cross join."""
    n1 = load_table(spark, sf, "nation").alias("n1")
    n2 = load_table(spark, sf, "nation").alias("n2")
    return n1.join(
        n2,
        (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
        & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
    ).select(
        F.col("n1.n_regionkey").alias("rk"),
        F.col("n1.n_name").alias("nation_a"),
        F.col("n2.n_name").alias("nation_b"),
    )


JOIN_THETA_SQL = """
SELECT n1.n_regionkey AS rk, n1.n_name AS nation_a, n2.n_name AS nation_b
FROM nation n1 JOIN nation n2
  ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
"""


def join_asof(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: for each purchase event, the user's most recent click
    at or before it (see operators/asof.py for the technique + scale).

    The right side carries TWO payload columns, one of them NULL on a
    deterministic third of the rows (click_id % 3): ASOF semantics
    attach the latest right ROW wholesale, so a matched NULL must stay
    NULL even when an older right row holds a value. One payload column
    can't distinguish that from per-column carry-forward; this
    augmentation keeps the r13 asof.py struct-carry fix value-checked
    against DuckDB's ASOF JOIN every time the row windows (corpus_pii
    augmentation pattern)."""
    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    # Dedupe right side per (user, ts) so ties are deterministic in both
    # engines (ASOF among duplicate timestamps is arbitrary otherwise).
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .withColumn(
            "click_val",
            F.when(F.col("click_id") % 3 == 0,
                   F.lit(None).cast("long"))
            .otherwise(F.col("click_id") * 10),
        )
    )
    return asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["click_id", "click_val"],
    ).select("user_id", "ts", "event_id", "value", "click_id", "click_val")


JOIN_ASOF_SQL = """
SELECT p.user_id, p.ts, p.event_id, p.value, c.click_id, c.click_val
FROM (
  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
) p
ASOF LEFT JOIN (
  SELECT user_id, ts, click_id,
         CASE WHEN click_id % 3 = 0 THEN NULL
              ELSE click_id * 10 END AS click_val
  FROM (
    SELECT user_id, ts, MAX(event_id) AS click_id
    FROM events WHERE event_type = 'click' GROUP BY user_id, ts
  )
) c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------

def win_rank(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


WIN_RANK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
"""


def win_analytic(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        F.first("ts").over(w).alias("first_ts"),
    )


WIN_ANALYTIC_SQL = """
SELECT event_id, user_id, ts, value,
       LAG(value, 1) OVER w AS prev_value,
       LEAD(value, 1) OVER w AS next_value,
       FIRST_VALUE(ts) OVER w AS first_ts
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def win_frame(spark: SparkSession, sf: str) -> DataFrame:
    """Running total (ROWS frame) — exact decimal accumulation."""
    o = load_table(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


WIN_FRAME_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_total,
       COUNT(*) OVER w AS running_n
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def win_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE frame over a numeric ordering (value-based neighborhood)."""
    o = load_table(spark, sf, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_within_10k_below"),
    )


WIN_RANGE_FRAME_SQL = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                      RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
         AS n_within_10k_below
FROM orders
"""


# ---------------------------------------------------------------------------
# sort / limit / top-k / set ops
# ---------------------------------------------------------------------------

def sort_limit(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-N: Spark plans TakeOrderedAndProject — each task keeps
    N rows, driver merges; no global sort materializes."""
    o = load_table(spark, sf, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(50)
    )


SORT_LIMIT_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 50
"""


def topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rn")
    )


TOPK_PER_GROUP_SQL = """
SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) WHERE rn <= 3
"""


def union_all(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("key"), F.lit("customer").alias("src")
    )
    s = load_table(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("key"), F.lit("supplier").alias("src")
    )
    return c.unionByName(s)


UNION_ALL_SQL = """
SELECT c_custkey AS key, 'customer' AS src FROM customer
UNION ALL
SELECT s_suppkey AS key, 'supplier' AS src FROM supplier
"""


def set_intersect(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    s = load_table(spark, sf, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    return c.intersect(s)


SET_INTERSECT_SQL = """
SELECT c_nationkey AS nk FROM customer
INTERSECT
SELECT s_nationkey AS nk FROM supplier
"""


def set_except(spark: SparkSession, sf: str) -> DataFrame:
    """Parts never shipped in bulk (quantity > 40) — non-degenerate at
    every SF, unlike nation-key differences which collapse to empty."""
    p = load_table(spark, sf, "part").select(F.col("p_partkey").alias("k"))
    li = (
        load_table(spark, sf, "lineitem")
        .filter(F.col("l_quantity") > 40)
        .select(F.col("l_partkey").alias("k"))
    )
    return p.subtract(li)


SET_EXCEPT_SQL = """
SELECT p_partkey AS k FROM part
EXCEPT
SELECT l_partkey AS k FROM lineitem WHERE l_quantity > 40
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "scan_parquet": (scan_parquet, SCAN_SQL),
    "project": (project, PROJECT_SQL),
    "filter_pred": (filter_pred, FILTER_PRED_SQL),
    "filter_range": (filter_range, FILTER_RANGE_SQL),
    "scalar_string": (scalar_string, SCALAR_STRING_SQL),
    "scalar_date": (scalar_date, SCALAR_DATE_SQL),
    "scalar_math": (scalar_math, SCALAR_MATH_SQL),
    "scalar_array": (scalar_array, SCALAR_ARRAY_SQL),
    "scalar_json": (scalar_json, SCALAR_JSON_SQL),
    "agg_hash": (agg_hash, AGG_HASH_SQL),
    "agg_distinct": (agg_distinct, AGG_DISTINCT_SQL),
    "agg_rollup": (agg_rollup, AGG_ROLLUP_SQL),
    "agg_cube": (agg_cube, AGG_CUBE_SQL),
    "agg_grouping_sets": (agg_grouping_sets, AGG_GROUPING_SETS_SQL),
    "agg_approx_distinct": (agg_approx_distinct, None),
    "join_broadcast": (join_broadcast, JOIN_BROADCAST_SQL),
    "join_sortmerge": (join_sortmerge, JOIN_SORTMERGE_SQL),
    "join_left": (join_left, JOIN_LEFT_SQL),
    "join_right": (join_right, JOIN_RIGHT_SQL),
    "join_full": (join_full, JOIN_FULL_SQL),
    "join_semi": (join_semi, JOIN_SEMI_SQL),
    "join_anti": (join_anti, JOIN_ANTI_SQL),
    "join_theta": (join_theta, JOIN_THETA_SQL),
    "join_asof": (join_asof, JOIN_ASOF_SQL),
    "win_rank": (win_rank, WIN_RANK_SQL),
    "win_analytic": (win_analytic, WIN_ANALYTIC_SQL),
    "win_frame": (win_frame, WIN_FRAME_SQL),
    "win_range_frame": (win_range_frame, WIN_RANGE_FRAME_SQL),
    "sort_limit": (sort_limit, SORT_LIMIT_SQL),
    "topk_per_group": (topk_per_group, TOPK_PER_GROUP_SQL),
    "union_all": (union_all, UNION_ALL_SQL),
    "set_intersect": (set_intersect, SET_INTERSECT_SQL),
    "set_except": (set_except, SET_EXCEPT_SQL),
}
