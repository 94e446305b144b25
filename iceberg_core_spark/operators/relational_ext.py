"""Extended relational surface: explode, map functions, statistical
aggregates, pivot, string_agg, extended window ranks, conditionals,
scalar subqueries. Same oracle conventions as relational.py."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_core_spark.functions.dedup import fround_sql
from iceberg_core_spark.session import load_table


def explode_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Array → rows with position (posexplode); the builtin twin of the
    UDTF demo. A narrow op — no shuffle; output rows stay with their
    input partition."""
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 100)
    toks = F.split(F.trim(F.lower("text")), r"[ \t\n\x0B\f\r]+")
    return (
        d.select("doc_id", F.posexplode(toks).alias("pos0", "tok"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    )


EXPLODE_TOKENS_SQL = """
WITH limited AS (SELECT * FROM documents WHERE doc_id < 100)
SELECT doc_id,
       generate_subscripts(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+'), 1) AS pos,
       unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS tok
FROM limited
"""


def map_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Map column surface: from_json → map, map_keys/map_values/
    element_at, reduced to scalars for hash stability."""
    ev = load_table(spark, sf, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        F.element_at(m, "k").alias("k_val"),
        F.size(F.map_values(m)).alias("n_vals"),
    )


MAP_FUNCS_SQL = """
SELECT event_id,
       array_to_string(json_keys(props), ',') AS keys_csv,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
       len(json_keys(props)) AS n_vals
FROM events
"""


def agg_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Variance/stddev from exact decimal sums: var = (Σx² − (Σx)²/n)
    / (n−1) evaluated in identical double arithmetic in both engines —
    engine-native STDDEV accumulates in FP and is not hash-stable."""
    li = load_table(spark, sf, "lineitem")
    sum_q = F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
    sum_q2 = F.sum(
        (F.col("l_quantity") * F.col("l_quantity")).cast("decimal(18,4)")
    ).cast("double")
    n = F.count(F.lit(1))
    var = (sum_q2 - sum_q * sum_q / n) / (n - 1)
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        (sum_q / n).alias("mean_qty"),
        var.alias("var_qty"),
        F.sqrt(var).alias("stddev_qty"),
    )


AGG_STATS_SQL = """
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean_qty,
       (CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
       / (COUNT(*) - 1) AS var_qty,
       sqrt((CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
            / (COUNT(*) - 1)) AS stddev_qty
FROM lineitem
GROUP BY l_returnflag
"""


def agg_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot linestatus into columns (explicit value list → stable
    schema; map-side partial agg then one shuffle, same as any agg)."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .count()
        .withColumnRenamed("F", "n_f")
        .withColumnRenamed("O", "n_o")
    )


AGG_PIVOT_SQL = """
SELECT l_returnflag,
       COUNT(*) FILTER (l_linestatus = 'F') AS n_f,
       COUNT(*) FILTER (l_linestatus = 'O') AS n_o
FROM lineitem
GROUP BY l_returnflag
"""


def agg_string_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered string aggregation (collect_list → sort → join; DuckDB
    string_agg ORDER BY twin)."""
    c = load_table(spark, sf, "customer").filter(F.col("c_custkey") < 100)
    return c.groupBy("c_mktsegment").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), "|").alias("names"),
        F.count(F.lit(1)).alias("n"),
    )


AGG_STRING_AGG_SQL = """
SELECT c_mktsegment,
       string_agg(c_name, '|' ORDER BY c_name) AS names,
       COUNT(*) AS n
FROM customer
WHERE c_custkey < 100
GROUP BY c_mktsegment
"""


def win_rank_ext(spark: SparkSession, sf: str) -> DataFrame:
    """percent_rank / cume_dist / ntile over a unique ordering."""
    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") < 1000)
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


WIN_RANK_EXT_SQL = """
SELECT o_orderkey, o_orderpriority,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume,
       NTILE(4) OVER w AS quartile
FROM orders
WHERE o_orderkey < 1000
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


def scalar_cond(spark: SparkSession, sf: str) -> DataFrame:
    """Conditional expression surface: CASE, coalesce, nullif, if."""
    c = load_table(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") > 5000, "high")
        .when(F.col("c_acctbal") > 0, "mid")
        .otherwise("low")
        .alias("tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("MACHINERY")),
                   F.lit("OTHER")).alias("seg_or_other"),
        F.expr("if(c_nationkey % 2 = 0, 'even', 'odd')").alias("nation_parity"),
    )


SCALAR_COND_SQL = """
SELECT c_custkey,
       CASE WHEN c_acctbal > 5000 THEN 'high'
            WHEN c_acctbal > 0 THEN 'mid'
            ELSE 'low' END AS tier,
       coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_or_other,
       CASE WHEN c_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END AS nation_parity
FROM customer
"""


# Shared-dialect SQL: runs verbatim on Spark SQL and DuckDB.
SCALAR_SUBQUERY_SQL = """
SELECT o_orderkey,
       o_totalprice,
       o_totalprice
         / (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*)
            FROM orders) AS price_ratio
FROM orders
WHERE o_totalprice > (SELECT MAX(o_totalprice) FROM orders) * 0.9
"""


def scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """Uncorrelated scalar subqueries (Catalyst plans them as reusable
    subquery results broadcast to the main plan)."""
    load_table(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(SCALAR_SUBQUERY_SQL)


def agg_salted(spark: SparkSession, sf: str) -> DataFrame:
    """Two-phase salted aggregation (skew-proof groupBy) — must equal
    the plain GROUP BY, which is exactly what the oracle asserts."""
    from iceberg_core_spark.operators.skew import salted_agg

    li = load_table(spark, sf, "lineitem")
    return salted_agg(
        li,
        keys=["l_returnflag"],
        sums={"l_extendedprice": "total_price"},
        count_alias="n",
        salt=16,
    )


AGG_SALTED_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


def agg_median(spark: SparkSession, sf: str) -> DataFrame:
    """Exact median per group, computed explicitly (rank the group,
    average the middle one or two rows) — engine-native MEDIAN/
    PERCENTILE interpolation isn't bit-identical across engines, this
    construction is. One window shuffle per group, no driver collect."""
    o = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    ranked = o.select(
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy("o_orderpriority")
        ).alias("n"),
    )
    # exactly the middle one (odd n) or two (even n) rows
    mid = ranked.filter(
        F.when(F.col("n") % 2 == 1, F.col("rn") == (F.col("n") + 1) / 2)
        .otherwise((F.col("rn") == F.col("n") / 2) | (F.col("rn") == F.col("n") / 2 + 1))
    )
    return mid.groupBy("o_orderpriority").agg(
        (F.sum("p").cast("double") / F.count(F.lit(1))).alias("median_price"),
        F.max("n").alias("n"),
    )


AGG_MEDIAN_SQL = """
WITH ranked AS (
  SELECT o_orderpriority,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
), mid AS (
  SELECT * FROM ranked
  WHERE CASE WHEN n % 2 = 1 THEN rn = (n + 1) / 2
             ELSE rn = n / 2 OR rn = n / 2 + 1 END
)
SELECT o_orderpriority,
       CAST(SUM(p) AS DOUBLE) / COUNT(*) AS median_price,
       MAX(n) AS n
FROM mid GROUP BY o_orderpriority
"""


def scalar_string2(spark: SparkSession, sf: str) -> DataFrame:
    """Second string batch: edit distance, padding, repeat, reverse,
    starts/ends-with — all deterministic integer/string ops."""
    p = load_table(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", F.lit("red widget")).alias("dist_to_red_widget"),
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.rpad(F.lit("x"), 5, "y").alias("xy"),
        F.repeat(F.lit("ab"), 3).alias("ababab"),
        F.reverse("p_type").alias("type_rev"),
        F.col("p_name").startswith("red").alias("starts_red"),
        F.col("p_type").endswith("Y").alias("ends_y"),
    )


SCALAR_STRING2_SQL = """
SELECT p_partkey,
       levenshtein(p_name, 'red widget') AS dist_to_red_widget,
       lpad(p_brand, 12, '*') AS brand_padded,
       rpad('x', 5, 'y') AS xy,
       repeat('ab', 3) AS ababab,
       reverse(p_type) AS type_rev,
       starts_with(p_name, 'red') AS starts_red,
       ends_with(p_type, 'Y') AS ends_y
FROM part
"""


def agg_conditional(spark: SparkSession, sf: str) -> DataFrame:
    """Conditional aggregation (FILTER / count_if / sum-of-CASE)."""
    li = load_table(spark, sf, "lineitem")
    high_qty = F.col("l_quantity") > 25
    return li.groupBy("l_returnflag").agg(
        F.count_if(high_qty).alias("n_high_qty"),
        F.sum(
            F.when(high_qty, F.col("l_extendedprice").cast("decimal(18,2)"))
        ).cast("double").alias("high_qty_revenue"),
        F.count(F.lit(1)).alias("n_total"),
    )


AGG_CONDITIONAL_SQL = """
SELECT l_returnflag,
       COUNT(*) FILTER (l_quantity > 25) AS n_high_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
            FILTER (l_quantity > 25) AS DOUBLE) AS high_qty_revenue,
       COUNT(*) AS n_total
FROM lineitem
GROUP BY l_returnflag
"""


def array_hof(spark: SparkSession, sf: str) -> DataFrame:
    """Array higher-order functions as user surface: transform, filter,
    aggregate(fold), zip_with — reduced to scalars for hashing."""
    e = load_table(spark, sf, "embeddings")
    v = F.col("embedding").cast("array<double>")
    doubled_head = F.element_at(F.transform(v, lambda x: x * 2.0), 1)
    n_pos = F.size(F.filter(v, lambda x: x > 0))
    total = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x)
    self_dot = F.aggregate(
        F.zip_with(v, v, lambda a, b: a * b), F.lit(0.0),
        lambda acc, x: acc + x,
    )
    from iceberg_core_spark.functions.dedup import fround

    return e.select(
        "vec_id",
        fround(doubled_head, 6).alias("head_x2"),
        n_pos.alias("n_pos"),
        fround(total, 6).alias("sum_all"),
        fround(self_dot, 6).alias("self_dot"),
    )


ARRAY_HOF_SQL = f"""
SELECT vec_id,
       {fround_sql('list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2.0)[1]', 6)} AS head_x2,
       len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS n_pos,
       {fround_sql("list_aggregate(CAST(embedding AS DOUBLE[]), 'sum')", 6)} AS sum_all,
       {fround_sql('list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))', 6)} AS self_dot
FROM embeddings
"""


def agg_minmax_by(spark: SparkSession, sf: str) -> DataFrame:
    """min_by/max_by (argmin/argmax aggregates). Ordering values are
    continuous doubles — ties have measure zero; a tied dataset would
    need a composite ordering for determinism."""
    o = load_table(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
    )


AGG_MINMAX_BY_SQL = """
SELECT o_orderpriority,
       max_by(o_orderkey, o_totalprice) AS biggest_order,
       min_by(o_orderkey, o_totalprice) AS smallest_order,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderpriority
"""


def agg_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated quartiles per group, computed EXPLICITLY
    (rank the group, pick the two straddling rows, interpolate with
    an exact quarter fraction) — the agg_median construction extended
    to p25/p50/p75. Engine-native PERCENTILE/quantile_cont functions
    interpolate in ways that are not bit-identical across engines;
    here the index math is pure integers ((n-1)*q div/mod 4) and the
    one interpolation `lo + frac*(hi - lo)` is the same IEEE
    expression on both sides. One window shuffle per group, a single
    conditional aggregate after it — no driver collect."""
    o = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey")
    ranked = o.select(
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("p"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy("o_orderpriority")).alias("n"),
    )
    aggs = []
    for q in (1, 2, 3):  # quarter units: p25, p50, p75
        # 0-based fractional index (n-1)*q/4 = lo + rem/4
        lo_rank = (F.floor((F.col("n") - 1) * q / 4) + 1).cast("int")
        vlo = F.max(F.when(F.col("rn") == lo_rank, F.col("p")))
        vhi = F.coalesce(
            F.max(F.when(F.col("rn") == lo_rank + 1, F.col("p"))), vlo)
        frac = (((F.max("n") - 1) * q % 4) / F.lit(4.0))
        aggs.append((vlo + frac * (vhi - vlo)).alias(f"p{q * 25}"))
    return ranked.groupBy("o_orderpriority").agg(
        *aggs, F.max("n").alias("n"))


AGG_PERCENTILE_SQL = """
WITH ranked AS (
  SELECT o_orderpriority,
         CAST(o_totalprice AS DOUBLE) AS p,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
SELECT o_orderpriority,
       MAX(CASE WHEN rn = (n - 1) * 1 // 4 + 1 THEN p END)
         + (((MAX(n) - 1) * 1 % 4) / 4.0)
         * (COALESCE(MAX(CASE WHEN rn = (n - 1) * 1 // 4 + 2 THEN p END),
                     MAX(CASE WHEN rn = (n - 1) * 1 // 4 + 1 THEN p END))
            - MAX(CASE WHEN rn = (n - 1) * 1 // 4 + 1 THEN p END)) AS p25,
       MAX(CASE WHEN rn = (n - 1) * 2 // 4 + 1 THEN p END)
         + (((MAX(n) - 1) * 2 % 4) / 4.0)
         * (COALESCE(MAX(CASE WHEN rn = (n - 1) * 2 // 4 + 2 THEN p END),
                     MAX(CASE WHEN rn = (n - 1) * 2 // 4 + 1 THEN p END))
            - MAX(CASE WHEN rn = (n - 1) * 2 // 4 + 1 THEN p END)) AS p50,
       MAX(CASE WHEN rn = (n - 1) * 3 // 4 + 1 THEN p END)
         + (((MAX(n) - 1) * 3 % 4) / 4.0)
         * (COALESCE(MAX(CASE WHEN rn = (n - 1) * 3 // 4 + 2 THEN p END),
                     MAX(CASE WHEN rn = (n - 1) * 3 // 4 + 1 THEN p END))
            - MAX(CASE WHEN rn = (n - 1) * 3 // 4 + 1 THEN p END)) AS p75,
       MAX(n) AS n
FROM ranked
GROUP BY o_orderpriority
"""


# Correlated scalar subquery — shared dialect, runs verbatim on both.
SCALAR_SUBQUERY_CORR_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > 2.5 * (
  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         / COUNT(*)
  FROM orders o2 WHERE o2.o_custkey = o.o_custkey
)
"""


def scalar_subquery_corr(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated scalar subquery (orders 2.5x above their customer's
    average) — Catalyst decorrelates it into an aggregate + join."""
    load_table(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(SCALAR_SUBQUERY_CORR_SQL)


QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "explode_tokens": (explode_tokens, EXPLODE_TOKENS_SQL),
    "map_funcs": (map_funcs, MAP_FUNCS_SQL),
    "agg_stats": (agg_stats, AGG_STATS_SQL),
    "agg_pivot": (agg_pivot, AGG_PIVOT_SQL),
    "agg_string_agg": (agg_string_agg, AGG_STRING_AGG_SQL),
    "win_rank_ext": (win_rank_ext, WIN_RANK_EXT_SQL),
    "scalar_cond": (scalar_cond, SCALAR_COND_SQL),
    "scalar_subquery": (scalar_subquery, SCALAR_SUBQUERY_SQL),
    "agg_salted": (agg_salted, AGG_SALTED_SQL),
    "agg_median": (agg_median, AGG_MEDIAN_SQL),
    "agg_minmax_by": (agg_minmax_by, AGG_MINMAX_BY_SQL),
    # NEW r8: exact interpolated quartiles (r9 window lead)
    "agg_percentile": (agg_percentile, AGG_PERCENTILE_SQL),
    "scalar_string2": (scalar_string2, SCALAR_STRING2_SQL),
    "agg_conditional": (agg_conditional, AGG_CONDITIONAL_SQL),
    "array_hof": (array_hof, ARRAY_HOF_SQL),
    "scalar_subquery_corr": (scalar_subquery_corr, SCALAR_SUBQUERY_CORR_SQL),
}
