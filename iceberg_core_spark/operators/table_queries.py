"""Registry queries that exercise the native table layer end-to-end
(storage semantics under the driver's DuckDB oracle gate, beyond the
flagship ``entry()`` smoke check).

``table_incremental``: documents are ingested in two commits (a
deterministic 4/5 base, then the 1/5 remainder); the query returns the
snapshot-diff change feed — exactly the second commit's rows. The
oracle is the same split expressed as plain SQL, so the driver verifies
the feed's VALUES, not just its row count. This is the reference's
write→read lifecycle (reference filesystemStorageAdapter_test.go:8-75)
upgraded to incremental consumption.

``zorder_range_scan``: documents are written z-ordered on
(doc_id, n_chars) and range-queried on n_chars — the NON-key
dimension, where a key-sorted layout prunes nothing. The reference's
one pruning trick (filename min/max stats, block.go:143-199)
generalized to multiple dimensions via Morton clustering; the oracle
is the identical predicate in plain SQL, and test_table_queries_oracle
asserts the scan actually reads a strict file subset.

``schema_evolution``: three commits — create (doc_id, lang, n_chars),
metadata-only ``rename_column("lang", "language")``, then an
evolve-append that adds a ``quality`` column — read back through the
unified current schema: pre-rename files resolve through the alias
chain, pre-add files surface quality as NULL. The oracle reproduces
the whole lifecycle as one SQL projection over the source table.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from iceberg_core_spark.session import load_table

_INC_CACHE: dict[str, str] = {}


def _incremental_root(spark: SparkSession, sf: str) -> str:
    """Build (once per corpus) the two-commit documents table."""
    root = _INC_CACHE.get(sf)
    if root is not None and os.path.isdir(root):
        return root
    from iceberg_core_spark.table import IceTable

    docs = load_table(spark, sf, "documents")
    root = os.path.join(tempfile.mkdtemp(prefix="ice_inc_"), "docs")
    shutil.rmtree(root, ignore_errors=True)
    IceTable.create(
        spark, root, docs.filter("doc_id % 5 != 0"), key_col="doc_id",
    ).append(docs.filter("doc_id % 5 = 0"), dedupe_identical_files=False)
    _INC_CACHE[sf] = root
    return root


def table_incremental(spark: SparkSession, sf: str) -> DataFrame:
    from iceberg_core_spark.table import IceTable

    t = IceTable(spark, _incremental_root(spark, sf))
    first = t.manifest.snapshots(load_files=False)[0].snapshot_id
    return t.scan_incremental(since=first)


TABLE_INCREMENTAL_SQL = """
SELECT * FROM documents WHERE doc_id % 5 = 0
"""


_Z_CACHE: dict[str, str] = {}


def _zorder_root(spark: SparkSession, sf: str) -> str:
    """Build (once per corpus) the z-ordered documents table. 64-row
    files keep the demo table multi-file at every test SF so pruning is
    observable; production tables size files by bytes, not rows — the
    pruning math is identical."""
    root = _Z_CACHE.get(sf)
    if root is not None and os.path.isdir(root):
        return root
    from iceberg_core_spark.table import IceTable

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "n_chars")
    root = os.path.join(tempfile.mkdtemp(prefix="ice_z_"), "docs_z")
    shutil.rmtree(root, ignore_errors=True)
    IceTable.create(spark, root, docs, key_col="doc_id",
                    zorder_by=["doc_id", "n_chars"],
                    max_rows_per_file=64)
    _Z_CACHE[sf] = root
    return root


def zorder_range_scan(spark: SparkSession, sf: str) -> DataFrame:
    from iceberg_core_spark.table import IceTable

    t = IceTable(spark, _zorder_root(spark, sf))
    return t.range_scan({"n_chars": (150, 300)})


ZORDER_RANGE_SCAN_SQL = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE n_chars BETWEEN 150 AND 300
"""


_EVO_CACHE: dict[str, str] = {}


def _evolution_root(spark: SparkSession, sf: str) -> str:
    """Build (once per corpus) the three-commit evolved table:
    create → rename lang→language (metadata-only) → evolve-append
    with a new quality column."""
    root = _EVO_CACHE.get(sf)
    if root is not None and os.path.isdir(root):
        return root
    from pyspark.sql import functions as F

    from iceberg_core_spark.table import IceTable

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "n_chars")
    root = os.path.join(tempfile.mkdtemp(prefix="ice_evo_"), "docs_evo")
    shutil.rmtree(root, ignore_errors=True)
    t = IceTable.create(spark, root, docs.filter("doc_id % 3 != 0"),
                        key_col="doc_id")
    t.rename_column("lang", "language")
    late = (
        docs.filter("doc_id % 3 = 0")
        .withColumnRenamed("lang", "language")
        .withColumn("quality", F.col("n_chars") / F.lit(100.0))
    )
    t.append(late, evolve_schema=True, dedupe_identical_files=False)
    _EVO_CACHE[sf] = root
    return root


def schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    from iceberg_core_spark.table import IceTable

    t = IceTable(spark, _evolution_root(spark, sf))
    return t.scan().select("doc_id", "language", "n_chars", "quality")


SCHEMA_EVOLUTION_SQL = """
SELECT doc_id,
       lang AS language,
       n_chars,
       CASE WHEN doc_id % 3 = 0 THEN n_chars / 100.0 ELSE NULL END
         AS quality
FROM documents
"""


_UPSERT_CACHE: dict[str, str] = {}


def _upsert_root(spark: SparkSession, sf: str) -> str:
    """Full documents table, then one upsert replacing every doc_id%5==0
    row with a deterministic modification (CoW merge: one left-anti
    shuffle on the key)."""
    root = _UPSERT_CACHE.get(sf)
    if root is not None and os.path.isdir(root):
        return root
    from pyspark.sql import functions as F

    from iceberg_core_spark.table import IceTable

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "n_chars")
    root = os.path.join(tempfile.mkdtemp(prefix="ice_ups_"), "docs_ups")
    shutil.rmtree(root, ignore_errors=True)
    t = IceTable.create(spark, root, docs, key_col="doc_id")
    t.upsert(
        docs.filter("doc_id % 5 = 0").select(
            "doc_id", F.lit("xx").alias("lang"),
            (F.col("n_chars") + 1000).alias("n_chars")),
        key_cols=["doc_id"],
    )
    _UPSERT_CACHE[sf] = root
    return root


def table_upsert(spark: SparkSession, sf: str) -> DataFrame:
    from iceberg_core_spark.table import IceTable

    return IceTable(spark, _upsert_root(spark, sf)).scan()


TABLE_UPSERT_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 5 = 0 THEN 'xx' ELSE lang END AS lang,
       CASE WHEN doc_id % 5 = 0 THEN n_chars + 1000
            ELSE n_chars END AS n_chars
FROM documents
"""


_MOR_CACHE: dict[str, str] = {}


def _mor_root(spark: SparkSession, sf: str) -> str:
    """Documents table with a pending MERGE-ON-READ delete (metadata-only
    commit; the predicate filters at scan time)."""
    root = _MOR_CACHE.get(sf)
    if root is not None and os.path.isdir(root):
        return root
    from iceberg_core_spark.table import IceTable

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "n_chars")
    root = os.path.join(tempfile.mkdtemp(prefix="ice_mor_"), "docs_mor")
    shutil.rmtree(root, ignore_errors=True)
    t = IceTable.create(spark, root, docs, key_col="doc_id",
                        max_rows_per_file=64)
    t.delete_where("lang = 'de'", mode="mor")
    _MOR_CACHE[sf] = root
    return root


def table_delete_mor(spark: SparkSession, sf: str) -> DataFrame:
    from iceberg_core_spark.table import IceTable

    return IceTable(spark, _mor_root(spark, sf)).scan()


TABLE_DELETE_MOR_SQL = """
SELECT doc_id, lang, n_chars FROM documents WHERE lang <> 'de'
"""


_COMPACT_CACHE: dict[str, str] = {}


def _compact_root(spark: SparkSession, sf: str) -> str:
    """Same lifecycle as _mor_root plus a compaction: small files merge,
    the pending MoR predicate is rewritten away — contents identical."""
    root = _COMPACT_CACHE.get(sf)
    if root is not None and os.path.isdir(root):
        return root
    from iceberg_core_spark.table import IceTable

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "n_chars")
    root = os.path.join(tempfile.mkdtemp(prefix="ice_cmp_"), "docs_cmp")
    shutil.rmtree(root, ignore_errors=True)
    t = IceTable.create(spark, root, docs, key_col="doc_id",
                        max_rows_per_file=64)
    t.delete_where("lang = 'de'", mode="mor")
    t.compact()
    _COMPACT_CACHE[sf] = root
    return root


def table_compact(spark: SparkSession, sf: str) -> DataFrame:
    from iceberg_core_spark.table import IceTable

    return IceTable(spark, _compact_root(spark, sf)).scan()


# Compaction must NOT change table contents — it only merges small files
# and rewrites pending MoR deletes away — so its oracle is by design the
# same SQL as table_delete_mor's (not a copy-paste slip); the repo test
# additionally asserts the data file count drops.
TABLE_COMPACT_SQL = TABLE_DELETE_MOR_SQL


_WAP_CACHE: dict[str, str] = {}


def _wap_root(spark: SparkSession, sf: str) -> str:
    """Documents table with one UNPUBLISHED write-audit-publish stage:
    create with the doc_id%4!=0 subset, then append the %4==0 remainder
    staged on branch 'audit' — the staged files live in the snapshot
    chain but are hidden from main reads until publish_branch()."""
    root = _WAP_CACHE.get(sf)
    if root is not None and os.path.isdir(root):
        return root
    from iceberg_core_spark.table import IceTable

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "n_chars")
    root = os.path.join(tempfile.mkdtemp(prefix="ice_wap_"), "docs_wap")
    shutil.rmtree(root, ignore_errors=True)
    t = IceTable.create(spark, root, docs.filter("doc_id % 4 != 0"),
                        key_col="doc_id")
    t.append(docs.filter("doc_id % 4 = 0"), branch="audit",
             dedupe_identical_files=False)
    _WAP_CACHE[sf] = root
    return root


def table_wap(spark: SparkSession, sf: str) -> DataFrame:
    """MAIN view while a staged audit branch is pending: exactly the
    pre-stage contents — the staged append's rows must NOT leak
    (Iceberg's write-audit-publish discipline; the branch view and the
    publish flip are covered by tests/test_branches.py)."""
    from iceberg_core_spark.table import IceTable

    return IceTable(spark, _wap_root(spark, sf)).scan()


TABLE_WAP_SQL = """
SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 4 != 0
"""


def table_time_travel(spark: SparkSession, sf: str) -> DataFrame:
    """Scan the upsert table AS OF its first snapshot — the pre-upsert
    contents must be fully reconstructable after later commits (snapshot
    isolation / time travel; Iceberg's ``VERSION AS OF``). Reuses the
    cached two-commit upsert root; oracle = the unmodified source."""
    from iceberg_core_spark.table import IceTable

    t = IceTable(spark, _upsert_root(spark, sf))
    first = t.manifest.snapshots(load_files=False)[0].snapshot_id
    return t.scan(snapshot_id=first)


TABLE_TIME_TRAVEL_SQL = """
SELECT doc_id, lang, n_chars FROM documents
"""


_SPEC_CACHE: dict[str, str] = {}


def _spec_evolution_root(spark: SparkSession, sf: str) -> str:
    """Partition-spec-evolved documents table: lang-partitioned first
    half → metadata-only set_partition_spec('source') → source-routed
    second half. stat_cols=['source'] at create so pre-evolution files
    stay min/max-prunable on the NEW partition column."""
    root = _SPEC_CACHE.get(sf)
    if root is not None and os.path.isdir(root):
        return root
    from iceberg_core_spark.table import IceTable

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "source", "n_chars")
    root = os.path.join(tempfile.mkdtemp(prefix="ice_spec_"), "docs_spec")
    shutil.rmtree(root, ignore_errors=True)
    t = IceTable.create(spark, root, docs.filter("doc_id % 2 = 0"),
                        partition_col="lang", key_col="doc_id",
                        stat_cols=["source"], max_rows_per_file=64)
    t.set_partition_spec("source")
    t.append(docs.filter("doc_id % 2 = 1"), dedupe_identical_files=False)
    _SPEC_CACHE[sf] = root
    return root


def table_partition_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """Partition query on the POST-evolution column across the mixed
    layout: pre-evolution files prune via source min/max stats (+
    residual filter), post-evolution files via their recorded partition
    value — one exact answer over both generations. The reference's
    fixed-for-life partition routing (blockManager.go:42-52) upgraded
    to Iceberg spec evolution; pruning asserted in
    tests/test_partition_evolution.py."""
    from iceberg_core_spark.table import IceTable

    return IceTable(spark, _spec_evolution_root(spark, sf)).query(
        partition="src3")


TABLE_PARTITION_EVOLUTION_SQL = """
SELECT doc_id, lang, source, n_chars FROM documents WHERE source = 'src3'
"""


QueryFn = Callable[[SparkSession, str], DataFrame]

_CDC_CACHE: dict[str, str] = {}


def _cdc_root(spark: SparkSession, sf: str) -> str:
    """Documents table partitioned by lang, then ONE CDC batch applied
    through apply_cdc: every doc_id%7==0 row deletes, every remaining
    doc_id%5==0 row updates (n_chars+1000), and ten new 'xx' docs
    insert. The partition column rides in the merge keys, so the merge
    rewrites only the touched partitions (scoped CoW) — the driver
    row verifies the merged RESULT against plain SQL."""
    root = _CDC_CACHE.get(sf)
    if root is not None and os.path.isdir(root):
        return root
    from pyspark.sql import functions as F

    from iceberg_core_spark.table import IceTable

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "n_chars")
    root = os.path.join(tempfile.mkdtemp(prefix="ice_cdc_"), "docs_cdc")
    shutil.rmtree(root, ignore_errors=True)
    t = IceTable.create(spark, root, docs, partition_col="lang",
                        key_col="doc_id")
    upd = (docs.filter("doc_id % 5 = 0 AND doc_id % 7 <> 0")
           .withColumn("n_chars", F.col("n_chars") + 1000)
           .withColumn("op", F.lit("U")))
    dels = docs.filter("doc_id % 7 = 0").withColumn("op", F.lit("D"))
    ins = spark.range(10).select(
        (F.lit(1_000_000) + F.col("id")).alias("doc_id"),
        F.lit("xx").alias("lang"),
        F.lit(42).cast("long").alias("n_chars"),
        F.lit("I").alias("op"))
    t.apply_cdc(upd.unionByName(dels).unionByName(ins),
                key_cols=["lang", "doc_id"], op_col="op")
    _CDC_CACHE[sf] = root
    return root


def table_cdc(spark: SparkSession, sf: str) -> DataFrame:
    from iceberg_core_spark.table import IceTable

    return IceTable(spark, _cdc_root(spark, sf)).scan()


_CDC_MOR_CACHE: dict[str, str] = {}


def _cdc_mor_root(spark: SparkSession, sf: str) -> str:
    """Same change batch as ``_cdc_root`` applied with mode="mor":
    the batch appends rows + an equality-delete key file instead of
    rewriting partitions — the scan anti-joins the key set against
    pre-batch files. Same final state, so the same SQL oracle; the
    driver row verifies the merge-on-read read path end to end."""
    root = _CDC_MOR_CACHE.get(sf)
    if root is not None and os.path.isdir(root):
        return root
    from pyspark.sql import functions as F

    from iceberg_core_spark.table import IceTable

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "n_chars")
    root = os.path.join(tempfile.mkdtemp(prefix="ice_cdcm_"), "docs_cdcm")
    shutil.rmtree(root, ignore_errors=True)
    t = IceTable.create(spark, root, docs, partition_col="lang",
                        key_col="doc_id")
    upd = (docs.filter("doc_id % 5 = 0 AND doc_id % 7 <> 0")
           .withColumn("n_chars", F.col("n_chars") + 1000)
           .withColumn("op", F.lit("U")))
    dels = docs.filter("doc_id % 7 = 0").withColumn("op", F.lit("D"))
    ins = spark.range(10).select(
        (F.lit(1_000_000) + F.col("id")).alias("doc_id"),
        F.lit("xx").alias("lang"),
        F.lit(42).cast("long").alias("n_chars"),
        F.lit("I").alias("op"))
    t.apply_cdc(upd.unionByName(dels).unionByName(ins),
                key_cols=["lang", "doc_id"], op_col="op", mode="mor")
    _CDC_MOR_CACHE[sf] = root
    return root


def table_cdc_mor(spark: SparkSession, sf: str) -> DataFrame:
    from iceberg_core_spark.table import IceTable

    return IceTable(spark, _cdc_mor_root(spark, sf)).scan()


TABLE_CDC_SQL = """
SELECT doc_id, lang,
       CASE WHEN doc_id % 5 = 0 THEN n_chars + 1000
            ELSE n_chars END AS n_chars
FROM documents
WHERE doc_id % 7 <> 0
UNION ALL
SELECT 1000000 + x AS doc_id, 'xx' AS lang, CAST(42 AS BIGINT) AS n_chars
FROM range(10) t(x)
"""

# merge-on-read applies the SAME change batch, so contents are
# identical by definition — one oracle serves both (like table_compact)
TABLE_CDC_MOR_SQL = TABLE_CDC_SQL


_CHANGES_CACHE: dict[str, str] = {}


def _changes_root(spark: SparkSession, sf: str) -> str:
    """Build (once per corpus) a five-commit lifecycle table spanning
    every changelog-relevant commit family: create, append, CoW
    upsert, MoR predicate delete, compact. The rollup is refreshed
    after EVERY commit (not once at the end), so the driver row proves
    the incremental folds — including the zero-delta compact fold —
    not just a final recompute."""
    root = _CHANGES_CACHE.get(sf)
    if root is not None and os.path.isdir(root):
        return root
    from pyspark.sql import functions as F

    from iceberg_core_spark.table import IceTable, MaterializedRollup

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "n_chars")
    base = os.path.join(tempfile.mkdtemp(prefix="ice_chg_"), "x")
    root = os.path.join(base, "docs")
    t = IceTable.create(spark, root, docs.filter("doc_id % 5 != 0"),
                        partition_col="lang", key_col="doc_id")
    ru = MaterializedRollup(spark, os.path.join(base, "rollup"),
                            group_cols=["lang"], sum_cols=["n_chars"])
    ru.refresh(t)
    t.append(docs.filter("doc_id % 5 = 0"))
    ru.refresh(t)
    t.upsert(docs.filter("doc_id % 11 = 0")
             .withColumn("n_chars", F.col("n_chars") + 500),
             key_cols=["lang", "doc_id"])
    ru.refresh(t)
    t.delete_where("doc_id % 7 = 0", mode="mor")
    ru.refresh(t)
    t.compact(min_files=2)
    ru.refresh(t)
    _CHANGES_CACHE[sf] = root
    return root


_MERGE_CACHE: dict[str, str] = {}


def _merge_root(spark: SparkSession, sf: str) -> str:
    """Build (once per corpus) the multi-clause MERGE lifecycle: a
    documents table (doc_id % 3 != 0) merged with a change batch (the
    even doc_ids, n_chars bumped by 100 and a delete flag on
    multiples of 10) under THREE ordered clauses — tombstone delete,
    conditional partial update, implicit keep — plus a conditional
    NOT-MATCHED insert."""
    root = _MERGE_CACHE.get(sf)
    if root is not None and os.path.isdir(root):
        return root
    from pyspark.sql import functions as F

    from iceberg_core_spark.table import IceTable

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "n_chars")
    root = os.path.join(tempfile.mkdtemp(prefix="ice_mrg_"), "docs_m")
    t = IceTable.create(spark, root, docs.filter("doc_id % 3 != 0"),
                        partition_col="lang", key_col="doc_id")
    source = docs.filter("doc_id % 2 = 0").select(
        "doc_id", "lang",
        (F.col("n_chars") + 100).alias("n_chars"),
        F.when(F.col("doc_id") % 10 == 0, F.lit("D"))
        .otherwise(F.lit("U")).alias("flag"))
    t.merge(
        source, key_cols=["lang", "doc_id"],
        when_matched=[
            {"condition": "s.flag = 'D'", "action": "delete"},
            {"condition": "s.n_chars % 3 = 0", "action": "update",
             "set": {"n_chars": "t.n_chars + s.n_chars"}},
        ],
        when_not_matched_insert="n_chars < 400",
    )
    _MERGE_CACHE[sf] = root
    return root


def table_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Read back the merged table; the oracle reproduces each
    clause's effect (and the untouched fall-through rows) in plain
    SQL over the source parquet."""
    from iceberg_core_spark.table import IceTable

    return IceTable(spark, _merge_root(spark, sf)).scan()


_MERGE_MOR_CACHE: dict[str, str] = {}


def table_merge_mor(spark: SparkSession, sf: str) -> DataFrame:
    """The SAME merge lifecycle committed merge-on-read: claimed keys
    land as an equality-delete file, updates/inserts append, and
    unclaimed matched rows are never rewritten — the scan must still
    equal the identical plain-SQL oracle (mode changes the PHYSICAL
    commit, never the logical contents)."""
    from pyspark.sql import functions as F

    from iceberg_core_spark.table import IceTable

    root = _MERGE_MOR_CACHE.get(sf)
    if root is None or not os.path.isdir(root):
        docs = load_table(spark, sf, "documents").select(
            "doc_id", "lang", "n_chars")
        root = os.path.join(tempfile.mkdtemp(prefix="ice_mrgm_"), "m")
        t = IceTable.create(spark, root,
                            docs.filter("doc_id % 3 != 0"),
                            partition_col="lang", key_col="doc_id")
        source = docs.filter("doc_id % 2 = 0").select(
            "doc_id", "lang",
            (F.col("n_chars") + 100).alias("n_chars"),
            F.when(F.col("doc_id") % 10 == 0, F.lit("D"))
            .otherwise(F.lit("U")).alias("flag"))
        t.merge(
            source, key_cols=["lang", "doc_id"],
            when_matched=[
                {"condition": "s.flag = 'D'", "action": "delete"},
                {"condition": "s.n_chars % 3 = 0", "action": "update",
                 "set": {"n_chars": "t.n_chars + s.n_chars"}},
            ],
            when_not_matched_insert="n_chars < 400",
            mode="mor",
        )
        _MERGE_MOR_CACHE[sf] = root
    return IceTable(spark, root).scan()


TABLE_MERGE_SQL = """
SELECT doc_id, lang,
       CASE WHEN doc_id % 2 = 0 AND doc_id % 10 <> 0
                 AND (n_chars + 100) % 3 = 0
            THEN n_chars + n_chars + 100
            ELSE n_chars END AS n_chars
FROM documents
WHERE doc_id % 3 <> 0
  AND NOT (doc_id % 2 = 0 AND doc_id % 10 = 0)
UNION ALL
SELECT doc_id, lang, n_chars + 100 AS n_chars
FROM documents
WHERE doc_id % 3 = 0 AND doc_id % 2 = 0 AND n_chars + 100 < 400
"""


_BLOOM_CACHE: dict[str, str] = {}


def _bloom_root(spark: SparkSession, sf: str) -> str:
    """Build (once per corpus) a documents table clustered by n_chars
    with a per-file bloom store on doc_id — the layout where doc_id
    min/max stats prune NOTHING (every file spans the id space), so
    any file skipped at query time is the bloom's doing."""
    root = _BLOOM_CACHE.get(sf)
    if root is not None and os.path.isdir(root):
        return root
    from iceberg_core_spark.table import IceTable

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "n_chars")
    root = os.path.join(tempfile.mkdtemp(prefix="ice_bloom_"), "docs_b")
    t = IceTable.create(spark, root, docs, key_col="n_chars",
                        max_rows_per_file=64)
    # two builds on purpose: the second adds ONLY the missing
    # (path, lang) pairs — the per-pair incremental build path the
    # multi-conjunct scan leans on
    t.build_bloom(["doc_id"])
    t.build_bloom(["doc_id", "lang"])
    _BLOOM_CACHE[sf] = root
    return root


def bloom_point_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Point lookup ``doc_id = 37`` through the bloom store — the
    files-read subset assertion lives in tests/test_plans.py; the
    oracle checks the VALUES (a bloom false negative would lose the
    row, a path mix-up would return the wrong one)."""
    from iceberg_core_spark.table import IceTable

    t = IceTable(spark, _bloom_root(spark, sf))
    return t.point_scan("doc_id", 37)


BLOOM_POINT_SCAN_SQL = """
SELECT doc_id, lang, n_chars FROM documents WHERE doc_id = 37
"""


def bloom_point_scan_multi(spark: SparkSession, sf: str) -> DataFrame:
    """Batch lookup ``doc_id IN (11, 37, 93) AND lang = 'en'`` through
    the bloom store — per-column verdicts intersect (the lang bloom
    proves absence for non-en files; the doc_id bloom for files
    carrying none of the three ids), and all eight probe hashes share
    one 1-row JVM job. Files-read assertion in tests/test_plans.py;
    the oracle checks the values."""
    from iceberg_core_spark.table import IceTable

    t = IceTable(spark, _bloom_root(spark, sf))
    return t.point_scan_multi({"doc_id": [11, 37, 93], "lang": "en"})


BLOOM_POINT_SCAN_MULTI_SQL = """
SELECT doc_id, lang, n_chars FROM documents
WHERE doc_id IN (11, 37, 93) AND lang = 'en'
"""


_CLONE_CACHE: dict[str, str] = {}


def table_clone(spark: SparkSession, sf: str) -> DataFrame:
    """Shallow-clone the five-commit lifecycle table and time-travel
    the CLONE to its MoR-delete snapshot — the row proves the clone
    carried full history AND the pending equality-delete predicates
    (a clone that linked data files but dropped the MoR metadata
    would return the %7 rows the predicate hides), not just the
    compacted head."""
    from iceberg_core_spark.table import IceTable

    src_root = _changes_root(spark, sf)
    root = _CLONE_CACHE.get(sf)
    if root is None or not os.path.isdir(root):
        root = os.path.join(tempfile.mkdtemp(prefix="ice_clone_"), "c")
        IceTable(spark, src_root).clone(root)
        _CLONE_CACHE[sf] = root
    c = IceTable(spark, root)
    mor = [s for s in c.manifest.snapshots(load_files=False)
           if s.operation == "delete-mor"][-1]
    return c.scan(snapshot_id=mor.snapshot_id)


# the lifecycle state right after the MoR delete: upsert bumped the
# %11 rows, the delete predicate hides the %7 rows, compact (a later
# snapshot) must be invisible at this point in history
TABLE_CLONE_SQL = """
SELECT doc_id, lang,
       n_chars + CASE WHEN doc_id % 11 = 0 THEN 500 ELSE 0 END
         AS n_chars
FROM documents
WHERE doc_id % 7 <> 0
"""


def table_changelog(spark: SparkSession, sf: str) -> DataFrame:
    """Net row-level changelog from the FIRST snapshot to the current
    one across the five-commit lifecycle — the oracle recomputes the
    same net diff as initial-vs-final EXCEPT ALL in plain SQL, so the
    driver verifies retraction semantics (upsert pairs, MoR deletes,
    compact invisibility), not just row flow."""
    from iceberg_core_spark.table import IceTable

    t = IceTable(spark, _changes_root(spark, sf))
    first = t.manifest.snapshots(load_files=False)[0].snapshot_id
    return t.scan_changes(since=first)


TABLE_CHANGELOG_SQL = """
WITH init AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 5 <> 0
),
fin AS (
  SELECT doc_id, lang,
         n_chars + CASE WHEN doc_id % 11 = 0 THEN 500 ELSE 0 END
           AS n_chars
  FROM documents WHERE doc_id % 7 <> 0
)
SELECT *, 'insert' AS _change_type
FROM (SELECT * FROM fin EXCEPT ALL SELECT * FROM init)
UNION ALL
SELECT *, 'delete' AS _change_type
FROM (SELECT * FROM init EXCEPT ALL SELECT * FROM fin)
"""


def table_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """The incrementally-maintained per-lang rollup after the whole
    lifecycle — folded commit by commit from scan_changes deltas; the
    oracle recomputes the same aggregate from scratch over the final
    state. Exact-DECIMAL sums make fold order irrelevant, so the two
    must match to the last digit."""
    from pyspark.sql import functions as F

    from iceberg_core_spark.table import MaterializedRollup

    base = os.path.dirname(_changes_root(spark, sf))
    ru = MaterializedRollup(spark, os.path.join(base, "rollup"),
                            group_cols=["lang"], sum_cols=["n_chars"])
    return ru.read().select(
        "lang", "row_count",
        F.col("sum_n_chars").cast("double").alias("sum_n_chars"))


TABLE_ROLLUP_SQL = """
SELECT lang, COUNT(*) AS row_count,
       CAST(SUM(CAST(n_chars + CASE WHEN doc_id % 11 = 0
                                    THEN 500 ELSE 0 END
                     AS DECIMAL(18,6))) AS DOUBLE) AS sum_n_chars
FROM documents
WHERE doc_id % 7 <> 0
GROUP BY lang
"""


QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "table_incremental": (table_incremental, TABLE_INCREMENTAL_SQL),
    "zorder_range_scan": (zorder_range_scan, ZORDER_RANGE_SCAN_SQL),
    "schema_evolution": (schema_evolution, SCHEMA_EVOLUTION_SQL),
    # r5 rotation leads (registered past r4's 50-slot window):
    "table_upsert": (table_upsert, TABLE_UPSERT_SQL),
    "table_delete_mor": (table_delete_mor, TABLE_DELETE_MOR_SQL),
    "table_compact": (table_compact, TABLE_COMPACT_SQL),
    "table_time_travel": (table_time_travel, TABLE_TIME_TRAVEL_SQL),
    "table_wap": (table_wap, TABLE_WAP_SQL),
    "table_partition_evolution": (table_partition_evolution,
                                  TABLE_PARTITION_EVOLUTION_SQL),
    "table_cdc": (table_cdc, TABLE_CDC_SQL),
    "table_cdc_mor": (table_cdc_mor, TABLE_CDC_MOR_SQL),
    # r7 rotation leads (registered late-r6, past the 50-slot window):
    "table_changelog": (table_changelog, TABLE_CHANGELOG_SQL),
    "table_rollup": (table_rollup, TABLE_ROLLUP_SQL),
    # NEW r7: per-file bloom membership pruning (equality on a
    # non-clustered high-cardinality column) + multi-clause MERGE
    "bloom_point_scan": (bloom_point_scan, BLOOM_POINT_SCAN_SQL),
    "table_merge": (table_merge, TABLE_MERGE_SQL),
    # registered late-r7, past the 50-slot window — r8 window lead:
    # the SAME merge lifecycle committed merge-on-read, against the
    # SAME oracle (mode changes the physical commit, not the logic)
    "table_merge_mor": (table_merge_mor, TABLE_MERGE_SQL),
    # NEW r8: IN-list + AND-of-equalities point scan through the
    # per-column bloom stores (one 1-row hash job for all probes)
    "bloom_point_scan_multi": (bloom_point_scan_multi,
                               BLOOM_POINT_SCAN_MULTI_SQL),
    # NEW r8: shallow clone, time-traveled to the MoR-delete snapshot
    # (r9 window lead)
    "table_clone": (table_clone, TABLE_CLONE_SQL),
}
