"""Regression tests for the round-1 code-review findings."""

import os

import pytest
from pyspark.sql import functions as F

from iceberg_core_spark.operators.asof import asof_join
from iceberg_core_spark.table import IceTable
from tests.fixtures import KEY_COL, PARTITION_COL, location_df, location_row


def test_mor_empty_prune_returns_empty_df(spark, tmp_path):
    # finding 1: MoR predicates + empty pruned file list crashed
    t = IceTable.create(spark, str(tmp_path / "t"),
                        location_df(spark, [location_row(timestamp=1)]),
                        partition_col=PARTITION_COL, key_col=KEY_COL)
    t.delete_where("timestamp > 100", mode="mor")
    assert t.query("no_such_user", 0, 10).count() == 0
    assert t.query("userid1", 5000, 6000).count() == 0


def test_delete_keeps_null_predicate_rows(spark, tmp_path):
    # finding 2: DELETE must keep rows where the predicate is NULL
    rows = [location_row(timestamp=1, accuracy=5.0),
            location_row(timestamp=2, accuracy=None),
            location_row(timestamp=3, accuracy=50.0)]
    t = IceTable.create(spark, str(tmp_path / "t"), location_df(spark, rows),
                        partition_col=PARTITION_COL, key_col=KEY_COL)
    t.delete_where("accuracy > 10", mode="mor")
    assert sorted(r.timestamp for r in t.scan().collect()) == [1, 2]
    t2 = IceTable.create(spark, str(tmp_path / "t2"), location_df(spark, rows),
                         partition_col=PARTITION_COL, key_col=KEY_COL)
    t2.delete_where(F.col("accuracy") > 10)  # CoW path
    assert sorted(r.timestamp for r in t2.scan().collect()) == [1, 2]


def test_append_rejects_silent_type_change(spark, tmp_path):
    # finding 3: same names + different type must be rejected
    t = IceTable.create(spark, str(tmp_path / "t"),
                        location_df(spark, [location_row(timestamp=1)]),
                        partition_col=PARTITION_COL, key_col=KEY_COL)
    bad = location_df(spark, [location_row(timestamp=2)]).withColumn(
        "latitude", F.col("latitude").cast("int")
    )
    with pytest.raises(ValueError, match="type mismatch"):
        t.append(bad)
    assert t.scan().count() == 1  # table untouched and readable


def test_asof_join_rejects_column_collision(spark):
    # finding 5
    left = spark.createDataFrame([(1, 10, 1.0)], ["uid", "ts", "value"])
    right = spark.createDataFrame([(1, 5, 2.0)], ["uid", "ts", "value"])
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="uid", left_ts="ts", right_ts="ts")


def test_asof_join_ties_deterministic(spark):
    # advice r1: several right rows sharing (on, ts) must carry a
    # deterministic payload — last under ascending payload order
    left = spark.createDataFrame([(1, 10, 0.5)], ["uid", "ts", "value"])
    right = spark.createDataFrame(
        [(1, 10, p) for p in ("b", "c", "a")], ["uid", "ts", "tag"]
    )
    for _ in range(3):
        got = asof_join(left, right, on="uid", left_ts="ts",
                        right_ts="ts").collect()
        assert len(got) == 1 and got[0].tag == "c"


def test_query_rejects_filters_without_layout(spark, tmp_path):
    # advice r1: partition/key filters on a table without that layout
    # must fail loudly, not silently return the full table
    df = spark.createDataFrame([(1, "x")], ["id", "s"])
    t = IceTable.create(spark, str(tmp_path / "t"), df)  # no layout cols
    with pytest.raises(ValueError, match="partition_col"):
        t.query(partition="x")
    with pytest.raises(ValueError, match="key_col"):
        t.query(lo=0, hi=10)


def test_timestamp_partition_values_naive(spark, tmp_path):
    # finding 6: timestamp-typed partition values must match naive bounds
    import datetime

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, d), d) for d in (1, 2)],
        ["day", "v"],
    )
    t = IceTable.create(spark, str(tmp_path / "t"), df,
                        partition_col="day", key_col="v")
    got = t.query(partition=datetime.datetime(2024, 1, 2)).collect()
    assert len(got) == 1 and got[0].v == 2


def test_dedupe_append_removes_orphan_file(spark, tmp_path):
    # finding 9: deduped duplicate file must not leak on disk
    rows = [location_row(timestamp=5)]
    t = IceTable.create(spark, str(tmp_path / "t"), location_df(spark, rows),
                        partition_col=PARTITION_COL, key_col=KEY_COL)
    t.append(location_df(spark, rows))  # identical content → dedupe
    on_disk = {
        os.path.join(dp, n)
        for dp, _d, ns in os.walk(os.path.join(t.root, "data"))
        for n in ns if n.endswith(".parquet")
    }
    live = {os.path.join(t.root, f.path) for f in t.manifest.load().files}
    assert on_disk == live  # no orphans


def test_stream_replayed_batch_not_duplicated(spark, tmp_path):
    # finding 4: foreachBatch replay (same batch id re-delivered, e.g.
    # lost checkpoint) must not double-append — the snapshot records the
    # source batch id atomically with the data commit.
    from iceberg_core_spark.streaming import stream_ingest_to_table

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    location_df(spark, [location_row(timestamp=t) for t in (1, 2, 3)]) \
        .coalesce(1).write.mode("overwrite").parquet(src)
    schema = location_df(spark, []).schema

    q = stream_ingest_to_table(
        spark, src, str(tmp_path / "table"), schema,
        partition_col=PARTITION_COL, key_col=KEY_COL,
        trigger={"availableNow": True},
        checkpoint_dir=str(tmp_path / "ckpt1"),
    )
    q.awaitTermination(120)
    t = IceTable(spark, str(tmp_path / "table"))
    assert t.scan().count() == 3
    assert t.manifest.load().source_batch_id == 0

    # replay: FRESH checkpoint re-delivers everything as batch 0 again
    q2 = stream_ingest_to_table(
        spark, src, str(tmp_path / "table"), schema,
        partition_col=PARTITION_COL, key_col=KEY_COL,
        trigger={"availableNow": True},
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    assert t.scan().count() == 3  # not 6


def test_zorder_wide_timestamp_span(spark, tmp_path):
    # finding 7: wide spans must not overflow the rank arithmetic
    import datetime

    base = datetime.datetime(2000, 1, 1)
    df = spark.createDataFrame(
        [(base + datetime.timedelta(days=i * 365), i, i) for i in range(20)],
        ["ts", "x", "pay"],
    )  # ~19-year span in epoch-micros
    t = IceTable.create(spark, str(tmp_path / "t"), df, key_col="x",
                        zorder_by=["x", "ts"], max_rows_per_file=4)
    # clustering still effective: a narrow ts range prunes files
    lo = base + datetime.timedelta(days=0)
    hi = base + datetime.timedelta(days=3 * 365)
    pruned = t.range_scan({"ts": (lo, hi)})
    assert len(pruned.inputFiles()) < t.file_count()
    assert pruned.count() == 4


def test_size_suffixed_conf_parses(spark):
    # r4 advice: sessions not built by get_spark can carry Spark's
    # suffixed size strings ('128m'); int() crashed every spread() call
    from iceberg_core_spark.session import _size_bytes

    assert _size_bytes("128m", 1) == 128 * 1024 * 1024
    assert _size_bytes("128MB", 1) == 128 * 1024 * 1024
    assert _size_bytes("4g", 1) == 4 * 1024 * 1024 * 1024
    assert _size_bytes(str(1 << 20), 1) == 1 << 20
    assert _size_bytes(1 << 20, 1) == 1 << 20
    assert _size_bytes("garbage", 77) == 77

    from iceberg_core_spark.session import scan_partition_estimate

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
        df = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
        assert scan_partition_estimate(df) >= 1  # no ValueError
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_partition_estimate_in_memory_frames(spark):
    # r4 advice: frames with no input files must not be reported as
    # "already spread" — a single-partition in-memory frame feeding
    # CPU-bound work would serialize on one core
    from iceberg_core_spark.session import scan_partition_estimate, spread

    one = spark.range(1000).coalesce(1)
    assert scan_partition_estimate(one) == 1
    assert spread(one).rdd.getNumPartitions() == \
        spark.sparkContext.defaultParallelism

    many = spark.range(1000).repartition(16)
    assert scan_partition_estimate(many) == 16


def test_partition_estimate_matches_spark_planner(spark, tmp_path):
    # open-cost padding: 8 tiny files estimate like Spark's
    # FilePartition formula (several partitions), not "1 because
    # total bytes < maxPartitionBytes" — which inserted a redundant
    # repartition shuffle on many-small-file scans
    from iceberg_core_spark.session import scan_partition_estimate

    p = str(tmp_path / "many")
    spark.range(8).repartition(8).write.parquet(p)
    df = spark.read.parquet(p)
    est = scan_partition_estimate(df)
    actual = df.rdd.getNumPartitions()
    assert est >= 2
    assert abs(est - actual) <= max(2, actual // 2)


def test_vertical_tab_tokenization_matches_oracle(spark):
    # r5 advice: Java's \s includes U+000B, RE2's does not — both
    # engines now split on the same explicit whitespace class, so text
    # containing a vertical tab tokenizes identically.
    import duckdb

    from iceberg_core_spark.functions import text as T

    s = "alpha\x0bbeta gamma\tdelta"
    df = spark.createDataFrame([(s,)], "text string").select(
        T.ws_tokens(F.col("text")).alias("toks"),
        T.token_count(F.col("text")).alias("n"),
    )
    row = df.collect()[0]
    con = duckdb.connect()
    d = con.sql(
        "SELECT string_split_regex(lower(?), '[ \\t\\n\\x0B\\f\\r]+') "
        "AS toks, len(regexp_extract_all(lower(?), ?)) AS n",
        params=[s, s, T.TOKEN_RE],
    ).fetchone()
    assert row.toks == d[0] == ["alpha", "beta", "gamma", "delta"]
    assert row.n == d[1] == 4


def test_diff_stats_boolean_partition_inline_vs_sidecar(spark, tmp_path):
    # r5 advice: inline side stringified partitions via Python str()
    # ('True') while the sidecar side used Spark cast ('true'); a
    # boolean-partitioned table crossing the inline→sidecar threshold
    # between the two snapshots split one partition into two rows.
    from pyspark.sql import Row

    from iceberg_core_spark.table.manifest import Manifest

    rows = [Row(flag=bool(i % 2), k=i) for i in range(8)]
    t = IceTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame(rows, "flag boolean, k long"),
        partition_col="flag", key_col="k",
    )
    base = t.manifest.load(load_files=False)
    orig = Manifest.inline_max
    Manifest.inline_max = 0  # force the next commit onto a sidecar
    try:
        t.append(spark.createDataFrame(
            [Row(flag=True, k=100)], "flag boolean, k long"))
    finally:
        Manifest.inline_max = orig
    cur = t.manifest.load(load_files=False)
    assert base.files_ref is None and cur.files_ref is not None
    d = t.diff_stats(base.snapshot_id, cur.snapshot_id)
    got = {r.partition: r.files_added for r in d.collect()}
    # one row per partition, spark-style lowercase strings, and the
    # True partition merged across the encoding boundary
    assert got == {"true": 1}


def test_child_files_override_clears_inherited_files_ref(
        spark, tmp_path, monkeypatch):
    # r11 review finding 4a: Snapshot.child() inherited files_ref by
    # reference, so a caller overriding files=[] without hand-nulling
    # files_ref/files_count silently resurrected the parent's sidecar
    # file list on the next load_files=True read.
    from pyspark.sql import Row

    from iceberg_core_spark.table.manifest import Manifest

    monkeypatch.setattr(Manifest, "inline_max", 2)
    rows = [Row(v=float(i), k=i) for i in range(6)]
    t = IceTable.create(spark, str(tmp_path / "t"),
                        spark.createDataFrame(rows, "v double, k long"),
                        key_col="k", max_rows_per_file=1)
    parent = t.manifest.load(load_files=False)
    assert parent.files_ref is not None  # spilled to a sidecar
    child = parent.child("truncate", files=[])
    # the files override must invalidate the inherited sidecar ref ...
    assert child.files_ref is None and child.files_count is None
    t.manifest.commit(child)
    reread = t.manifest.load(load_files=True)
    # ... so a committed empty list stays empty — no resurrection
    assert reread.snapshot_id == child.snapshot_id
    assert reread.files == [] and reread.files_ref is None
    # an EXPLICIT files_ref override still wins (the Spark commit path
    # sets files=[], files_ref, files_count together)
    explicit = parent.child("rebase", files=[],
                            files_ref=parent.files_ref,
                            files_count=parent.files_count)
    assert explicit.files_ref == parent.files_ref
    assert explicit.files_count == parent.files_count


def test_driver_commit_keeps_retired_alias_stat_columns(
        spark, tmp_path, monkeypatch):
    # r11 review finding 4b: driver-side Manifest.commit() wrote
    # sidecars with only the CURRENT stat_cols, so after rename_column
    # a small driver-side commit (add_files here) dropped the retired
    # smin_/smax_ columns and pre-rename files silently lost file-level
    # pruning — a renamed 100 TB table degrading to full scans.
    import glob as globmod

    from pyspark.sql import Row

    from iceberg_core_spark.table.manifest import Manifest

    rows = [Row(v=float(i), k=i) for i in range(10)]
    t = IceTable.create(spark, str(tmp_path / "t"),
                        spark.createDataFrame(rows, "v double, k long"),
                        key_col="k", stat_cols=["v"], max_rows_per_file=1)
    assert t.file_count() == 10
    t.rename_column("v", "w")
    # external file matching the RENAMED schema, far outside the probe
    ext_dir = str(tmp_path / "ext")
    spark.createDataFrame([Row(w=100.0, k=100)],
                          "w double, k long").coalesce(1) \
        .write.parquet(ext_dir)
    ext = globmod.glob(os.path.join(ext_dir, "part-*.parquet"))
    assert len(ext) == 1
    monkeypatch.setattr(Manifest, "inline_max", 1)  # force the spill
    snap = t.add_files(ext)
    assert snap.files_ref is not None  # driver-side sidecar commit
    # files-read gate (like test_manifest_pruning_limits_input_files):
    # the probe overlaps exactly ONE pre-rename file, whose stats live
    # under the then-physical name "v" in the sidecar
    narrow = t.range_scan({"w": (3.0, 3.0)})
    assert len(narrow.inputFiles()) == 1
    assert [r.k for r in narrow.collect()] == [3]
    assert len(t.scan().inputFiles()) == 11
    # and the alias derivation is bounded to TRACKED columns: the
    # sidecar carries smin_/smax_ for w and its retired alias v, but a
    # rename of a never-tracked column must not add permanent all-null
    # stat pairs to every future sidecar (r12 review)
    import pyarrow.parquet as pq

    cur = t.manifest.load(load_files=False)
    cols = set(pq.read_schema(
        t.manifest.sidecar_path(cur.files_ref)).names)
    assert {"smin_w", "smax_w", "smin_v", "smax_v"} <= cols
    from iceberg_core_spark.table.manifest import sidecar_stat_cols
    assert sidecar_stat_cols(["w"], cur.renames + [
        {"from": "payload", "to": "data"}]) == ["w", "v"]


def test_persist_site_lifecycle_bounded(spark, sf_dir):
    """r12 ADVICE + r12 verdict task 3: the library's internal
    persist() sites (minhash/simhash/embedding signatures, fuzzy
    prefix frame) hold AT MOST one live cache entry per site across
    repeated invocations over DIFFERENT inputs; a same-input
    re-invocation reuses the live entry; release_caches() frees the
    library's entries SELECTIVELY (a caller-owned cache survives)."""
    from pyspark import StorageLevel

    from iceberg_core_spark.caching import release_caches
    from iceberg_core_spark.functions.dedup import (
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from iceberg_core_spark.session import load_table

    release_caches()  # clean slate for delta accounting

    def n_cached() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    base = n_cached()
    docs = load_table(spark, sf_dir, "documents")
    mine = docs.select("doc_id").persist(StorageLevel.MEMORY_AND_DISK)
    mine.count()
    assert n_cached() == base + 1

    # 6 invocations x 2 sites over 3 DIFFERENT inputs: without the
    # owner-side lifecycle this accumulates 6 entries (the r12 leak);
    # with it, each site retires its previous entry first
    for lim in (10, 20, 30, 10, 20, 30):
        sub = docs.limit(lim)
        minhash_lsh_pairs(sub).count()
        simhash_pairs(sub).count()
    assert n_cached() <= base + 1 + 2  # one live entry per site

    # same-input re-invocation: the live entry is REUSED, not re-added
    before = n_cached()
    minhash_lsh_pairs(docs.limit(30)).count()
    assert n_cached() == before

    released = release_caches()
    assert released >= 2
    assert n_cached() == base + 1  # library entries gone ...
    assert mine.storageLevel.useMemory  # ... caller-owned cache intact
    mine.unpersist()


def test_local_group_topk_null_group_key(spark):
    """r12 ADVICE: a NULL group key must form its OWN group in the
    Arrow pre-top-k (pandas groupby's dropna default silently dropped
    such rows), matching the downstream rank window's NULL partition."""
    from iceberg_core_spark.functions.search import local_group_topk

    df = spark.createDataFrame(
        [(None, 5.0, 1), (None, 3.0, 2), (1, 9.0, 3), (1, 1.0, 4)],
        "g int, s double, i int",
    ).coalesce(1)
    out = local_group_topk(df, "g", "s", "i", 1).collect()
    got = {(r.g, r.i) for r in out}
    assert got == {(None, 1), (1, 3)}  # NULL group's best row survives


def test_asof_join_carries_whole_rows_not_per_column(spark):
    """r13 review: per-column last(ignorenulls) carries assembled the
    payload from DIFFERENT right rows when a right row held NULL in
    some payload column — a combined row that never existed. ASOF
    semantics attach the latest right ROW wholesale (struct carry),
    matching DuckDB's ASOF JOIN on the same data."""
    left = spark.createDataFrame([(1, 10)], "uid int, ts int")
    right = spark.createDataFrame(
        [(1, 1, 100, None), (1, 2, None, 200)],
        "uid int, ts int, x int, y int")
    got = asof_join(left, right, on="uid", left_ts="ts",
                    right_ts="ts", right_payload=["x", "y"]).collect()
    assert len(got) == 1
    # the t=2 row is the match: x must be NULL (not resurrected from
    # the t=1 row), y = 200
    assert (got[0].x, got[0].y) == (None, 200)
    import duckdb
    con = duckdb.connect()
    ref = con.sql(
        "SELECT r.x, r.y FROM (VALUES (1, 10)) l(uid, ts) "
        "ASOF LEFT JOIN (VALUES (1, 1, 100, NULL), (1, 2, NULL, 200)) "
        "r(uid, ts, x, y) ON l.uid = r.uid AND l.ts >= r.ts"
    ).fetchall()
    assert [(got[0].x, got[0].y)] == ref
    # tolerance nulls payload and tests distance against the SAME row
    tol = asof_join(left, right, on="uid", left_ts="ts",
                    right_ts="ts", right_payload=["x", "y"],
                    tolerance=5).collect()
    # the match is the t=2 row (distance 8 > 5): BOTH columns null out
    # together — no resurrecting x=100 from the nearer-but-older row
    assert (tol[0].x, tol[0].y) == (None, None)


def test_udaf_group_stats_null_values_match_sql_semantics(spark):
    """r13 review: NaN.astype(int64) raised on NULL-bearing groups and
    an all-NULL group must sum to NULL (SQL SUM), not crash or emit 0.
    The driver corpus has no NULL values, so this pins the contract on
    injected data."""
    from iceberg_core_spark.operators import udfs

    ev = spark.createDataFrame(
        [(1, "a", 1.25), (2, "a", None), (3, "b", None)],
        "event_id long, event_type string, value double")

    import iceberg_core_spark.session as sess
    orig = sess.load_table
    try:
        sess.load_table = lambda s, sf, name: ev
        udfs.load_table = sess.load_table
        out = {r.event_type: (r.n_events, r.total_cents, r.max_event_id)
               for r in udfs.udaf_group_stats(spark, "unused").collect()}
    finally:
        sess.load_table = orig
        udfs.load_table = orig
    assert out["a"] == (2, 125, 2)   # NULL skipped, rows still counted
    assert out["b"] == (1, None, 3)  # all-NULL group sums to NULL


def test_persist_site_repersists_after_external_eviction(spark, sf_dir):
    """r13 ADVICE: a same-input re-invocation must NOT hand back a
    frame whose cache entry the caller evicted behind the site's back
    (spark.catalog.clearCache() / manual unpersist) — the site has to
    notice the NONE storage level and re-persist, or the optimization
    is silently lost forever for that input."""
    from iceberg_core_spark.caching import persist_site, release_caches
    from iceberg_core_spark.session import load_table

    release_caches()
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = persist_site("__test_evict", docs)
    a.count()
    assert a.storageLevel.useMemory or a.storageLevel.useDisk
    a.unpersist(blocking=True)  # external eviction, site not told
    b = persist_site("__test_evict", docs)
    b.count()
    assert b.storageLevel.useMemory or b.storageLevel.useDisk, \
        "site returned an evicted frame instead of re-persisting"
    release_caches()
