"""Bucketed (co-located) fact-fact joins — the shuffle-elimination path
for joins the broadcast threshold can't help (both sides large).

At 100 TB, orders ⋈ lineitem re-shuffles BOTH fact tables on every
query; that exchange is the single largest cost in the plan. Spark's
catalog bucketing fixes it at WRITE time: both tables are written
``bucketBy(n, key)`` so files are hash-clustered on the join key, and
every later join on that key reads co-located buckets with NO exchange
on either side (EnsureRequirements recognizes the matching
HashPartitioning). The reference has no joins at all (SURVEY.md §2.A),
so this is pure new capability, expressed entirely through the public
Spark bucketing surface.

Bucket-count guidance at scale: pick n so one bucket of the LARGER
table ≈ 1-4 GB (e.g. 100 TB lineitem → ~32k buckets); both sides must
use the SAME n for co-location. Buckets also bound sort-merge memory:
each task merges one bucket pair.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_core_spark.session import load_table


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table hash-bucketed on ``bucket_col``
    (files additionally sorted within buckets so merge joins skip the
    per-task sort). ``path`` makes it an external table rooted there."""
    sort_cols = sort_cols or [bucket_col]
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(*sort_cols)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed catalog tables on the bucket key —
    zero exchanges in the plan (assert_no_exchange-able); downstream
    operators see the join's HashPartitioning and can reuse it."""
    on = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on, how)


# ---------------------------------------------------------------------------
# registered query: bucketed orders ⋈ lineitem
# ---------------------------------------------------------------------------

_BUCKETED_CACHE: dict[str, tuple[str, str]] = {}
_N_BUCKETS = 8


def _bucketed_pair(spark: SparkSession, sf: str) -> tuple[str, str]:
    """Build (once per corpus) bucketed twins of orders/lineitem — the
    write-time cost a production pipeline pays at ingest, amortized over
    every subsequent co-located join. Goes through the FULL table layer:
    IceTable with ``bucket_by`` (snapshot/manifest semantics) registered
    per-snapshot via ``as_bucketed_table`` — co-location and snapshot
    isolation in one layer, not a side catalog."""
    import tempfile
    import uuid

    from iceberg_core_spark.table import IceTable

    pair = _BUCKETED_CACHE.get(sf)
    if pair is not None:
        return pair
    tag = uuid.uuid4().hex[:8]
    names = (f"orders_b_{tag}", f"lineitem_b_{tag}")
    base = tempfile.mkdtemp(prefix="bucketed_")
    IceTable.create(
        spark, f"{base}/{names[0]}", load_table(spark, sf, "orders"),
        key_col="o_orderkey", bucket_by=("o_orderkey", _N_BUCKETS),
    ).as_bucketed_table(names[0])
    IceTable.create(
        spark, f"{base}/{names[1]}", load_table(spark, sf, "lineitem"),
        key_col="l_orderkey", bucket_by=("l_orderkey", _N_BUCKETS),
    ).as_bucketed_table(names[1])
    _BUCKETED_CACHE[sf] = names
    return names


def join_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    """orders ⋈ lineitem with both sides pre-bucketed on the order key:
    the join itself runs exchange-free (bucket-to-bucket merge). Same
    result as join_sortmerge's shape, different (write-amortized)
    physical strategy — the oracle is a plain SQL join."""
    o_name, li_name = _bucketed_pair(spark, sf)
    o = spark.table(o_name)
    li = spark.table(li_name)
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double").alias("total_qty"),
        )
    )


JOIN_BUCKETED_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "join_bucketed": (join_bucketed, JOIN_BUCKETED_SQL),
}
