"""Table auto-maintenance: maintain() policy ticks, lineage-pinned
snapshot expiry, and self-maintaining streaming ingest — the managed
fix for the reference's unmanaged small-block proliferation
(blockManager.go:65-67 flushes one file per MaxSize/MaxAge forever;
SURVEY.md §2.C records compaction as absent)."""

import os

from iceberg_core_spark.streaming import stream_ingest_to_table
from iceberg_core_spark.table import IceTable, MaintenancePolicy
from tests.fixtures import KEY_COL, PARTITION_COL, location_df, location_row
from tests.test_streaming import _drop_file


def _files_per_partition(t: IceTable) -> int:
    snap = t.manifest.load()
    counts: dict = {}
    for f in snap.files:
        counts[f.partition] = counts.get(f.partition, 0) + 1
    return max(counts.values(), default=0)


def _fragmented_table(spark, root: str) -> IceTable:
    rows = [location_row(timestamp=100000 + i) for i in range(4)]
    IceTable.create(
        spark, root, location_df(spark, rows),
        partition_col=PARTITION_COL, key_col=KEY_COL, max_rows_per_file=2,
    )
    t = IceTable(spark, root)
    for i in range(5):
        t.append(location_df(spark, [location_row(timestamp=200000 + i)]))
    return t


def test_maintain_compacts_and_preserves_contents(spark, tmp_path):
    t = _fragmented_table(spark, str(tmp_path / "t"))
    before_files = _files_per_partition(t)
    before_rows = sorted(r.timestamp for r in t.scan().collect())
    assert before_files >= 7  # create split + 5 single-row appends

    policy = MaintenancePolicy(max_files_per_partition=3,
                               target_rows_per_file=1000,
                               keep_snapshots=None)
    report = t.maintain(policy)
    assert report["compacted"] is True and report["skipped"] is None
    assert _files_per_partition(t) < before_files
    assert sorted(r.timestamp for r in t.scan().collect()) == before_rows

    # second tick: below threshold now — a no-op, no new snapshot
    head = t.manifest.current_snapshot_id()
    report2 = t.maintain(policy)
    assert report2["compacted"] is False
    assert t.manifest.current_snapshot_id() == head


def test_maintain_skips_while_staged(spark, tmp_path):
    t = _fragmented_table(spark, str(tmp_path / "t"))
    t.append(location_df(spark, [location_row(timestamp=300000)]),
             branch="audit")
    report = t.maintain(MaintenancePolicy(max_files_per_partition=2))
    assert report["skipped"] == "staged-branches-pending"
    assert report["compacted"] is False
    # the stage is still intact and publishable
    t.publish_branch("audit")
    assert 300000 in {r.timestamp for r in t.scan().collect()}


def test_expire_pins_newest_lineage_stamp(spark, tmp_path):
    """A maintenance commit on top of batch-stamped appends must not
    let expire_snapshots erase the stream's replay protection."""
    root = str(tmp_path / "t")
    IceTable.create(
        spark, root, location_df(spark, [location_row(timestamp=100000)]),
        partition_col=PARTITION_COL, key_col=KEY_COL,
        source_batch_id=0, source_lineage="ckptL",
    )
    t = IceTable(spark, root)
    for b in (1, 2):
        t.append(location_df(spark, [location_row(timestamp=100000 + b)]),
                 source_batch_id=b, source_lineage="ckptL")
    # un-stamped maintenance commit becomes the head
    t.compact(min_files=2, target_rows_per_file=1000)
    assert t.last_committed_batch("ckptL") == 2

    expired = t.expire_snapshots(keep_last=1)
    assert expired  # something was trimmed
    # the stamped snapshot carrying batch 2 survived the trim
    assert t.last_committed_batch("ckptL") == 2
    assert t.scan().count() == 3


def test_stream_ingest_self_maintaining(spark, tmp_path):
    """Four restarts × one-row files with max_rows_per_file=1 would
    leave one file per row; a per-batch maintenance tick keeps the
    partition's file count at the policy bound while contents and
    exactly-once behavior are untouched."""
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    table_root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    schema = location_df(spark, []).schema
    policy = MaintenancePolicy(max_files_per_partition=3,
                               target_rows_per_file=10_000,
                               keep_snapshots=4)

    for b in range(4):
        _drop_file(
            spark,
            [location_row(timestamp=100000 + 10 * b + i) for i in range(3)],
            src, f"b{b}.parquet",
        )
        q = stream_ingest_to_table(
            spark, src, table_root, schema,
            partition_col=PARTITION_COL, key_col=KEY_COL,
            max_rows_per_file=1,
            trigger={"availableNow": True}, checkpoint_dir=ckpt,
            maintenance=policy, maintenance_every=1,
        )
        assert q.awaitTermination(120)

    t = IceTable(spark, table_root)
    # contents: all 12 rows exactly once
    got = sorted(r.timestamp for r in t.scan().collect())
    want = sorted(100000 + 10 * b + i for b in range(4) for i in range(3))
    assert got == want
    # fragmentation bounded: without maintenance this partition would
    # hold 12 one-row files; the tick kept it under policy + one batch
    assert _files_per_partition(t) <= policy.max_files_per_partition + 3
    # replay protection survived expiry
    assert t.last_committed_batch(ckpt) == 3
    # history bounded (pinned lineage stamp may add one)
    assert len(t.snapshots()) <= policy.keep_snapshots + 1


def test_stream_cdc_mor_maintenance_materializes_deletes(spark, tmp_path):
    """Under mode='mor' every batch leaves an equality-delete file
    behind; the maintenance tick's compact trigger fires on outstanding
    deletes and materializes them, so the table returns to clean reads
    without a manual compact()."""
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType)

    from iceberg_core_spark.streaming import stream_cdc_to_table
    from tests.test_streaming import _drop_cdc_file

    schema = StructType([
        StructField("part", StringType()),
        StructField("k", LongType()),
        StructField("v", DoubleType()),
        StructField("op", StringType()),
        StructField("seq", LongType()),
    ])
    src = str(tmp_path / "cdc_in")
    os.makedirs(src)
    root = str(tmp_path / "cdc_table")
    ckpt = str(tmp_path / "cdc_ckpt")
    policy = MaintenancePolicy(max_files_per_partition=64,
                               target_rows_per_file=10_000,
                               keep_snapshots=None)

    def run():
        q = stream_cdc_to_table(
            spark, src, root, schema, key_cols=["part", "k"],
            partition_col="part", key_col="k", op_col="op",
            seq_col="seq", mode="mor", trigger={"availableNow": True},
            checkpoint_dir=ckpt, maintenance=policy, maintenance_every=1,
        )
        assert q.awaitTermination(120)

    _drop_cdc_file(spark, schema, [
        ("a", 1, 1.0, "I", 1), ("a", 2, 2.0, "I", 1),
    ], src, "b1.parquet")
    run()
    _drop_cdc_file(spark, schema, [
        ("a", 1, 99.0, "U", 1), ("a", 2, 0.0, "D", 1),
    ], src, "b2.parquet")
    run()

    t = IceTable(spark, root)
    got = {(r.part, r.k): r.v for r in t.scan().collect()}
    assert got == {("a", 1): 99.0}
    # batch 1 (batch_id 0) skipped the tick, batch 2 (batch_id 1)
    # ran it: the equality deletes it landed were compacted away
    snap = t.manifest.load(load_files=False)
    assert snap.delete_predicates == []
    ops = [s.operation for s in t.snapshots()]
    assert "compact" in ops and ops.count("cdc-mor") == 2


def test_last_committed_batch_newest_first_early_exit(spark, tmp_path):
    """The replay guard walks history newest-first and stops at the
    lineage's newest stamp (batch ids are monotone per lineage), so a
    long stream pays O(commits since its last append) per trigger —
    and interleaved foreign-lineage / maintenance commits neither hide
    the stamp nor change the answer."""
    root = str(tmp_path / "t")
    IceTable.create(
        spark, root, location_df(spark, [location_row(timestamp=100000)]),
        partition_col=PARTITION_COL, key_col=KEY_COL,
        source_batch_id=0, source_lineage="L1",
    )
    t = IceTable(spark, root)
    for b in (1, 2, 3):
        t.append(location_df(spark, [location_row(timestamp=100000 + b)]),
                 source_batch_id=b, source_lineage="L1")
    # interleave: a different stream's lineage and a metadata commit
    t.append(location_df(spark, [location_row(timestamp=200000)]),
             source_batch_id=9, source_lineage="L2")
    t.compact(min_files=2, target_rows_per_file=1000)
    assert t.last_committed_batch("L1") == 3
    assert t.last_committed_batch("L2") == 9
    assert t.last_committed_batch("never-seen") is None

    # early exit: resolving L2 (one commit below head) must not load
    # the whole history
    from iceberg_core_spark.table.manifest import Manifest

    loads = []
    orig = Manifest.load

    def counting_load(self, snapshot_id=None, load_files=True):
        loads.append(snapshot_id)
        return orig(self, snapshot_id, load_files=load_files)

    Manifest.load = counting_load
    try:
        assert t.last_committed_batch("L2") == 9
        n_l2 = len(loads)
        loads.clear()
        assert t.last_committed_batch("L1") == 3
        n_l1 = len(loads)
    finally:
        Manifest.load = orig
    n_snaps = len(t.snapshots())
    assert n_l2 < n_l1 <= n_snaps  # walked only as deep as each stamp
    assert n_l2 <= 2  # L2's stamp sits right under the compact head


def test_concurrent_appends_race_maintenance_ticker(spark, tmp_path):
    """Writer threads appending under OCC while a maintenance ticker
    compacts/expires between them: every append survives (rebase wins
    or the tick skips on conflict), nothing is lost or duplicated, and
    fragmentation stays bounded. This is the composition a
    self-maintaining multi-writer ingest actually runs."""
    import threading

    root = str(tmp_path / "t")
    IceTable.create(
        spark, root,
        location_df(spark, [location_row(timestamp=1)]),
        partition_col=PARTITION_COL, key_col=KEY_COL,
    )
    policy = MaintenancePolicy(max_files_per_partition=3,
                               target_rows_per_file=100_000,
                               keep_snapshots=5)
    errors: list = []
    done = threading.Event()

    def writer(wid: int) -> None:
        t = IceTable(spark, root)
        try:
            for i in range(4):
                ts = 1000 * wid + i
                t.append(location_df(spark, [location_row(timestamp=ts)]))
        except Exception as ex:  # pragma: no cover
            errors.append(("writer", wid, repr(ex)))

    def ticker() -> None:
        t = IceTable(spark, root)
        try:
            while not done.is_set():
                t.maintain(policy)
        except Exception as ex:  # pragma: no cover
            errors.append(("ticker", repr(ex)))

    threads = [threading.Thread(target=writer, args=(w,))
               for w in (1, 2, 3)]
    tick = threading.Thread(target=ticker)
    tick.start()
    for th in threads:
        th.start()
    for th in threads:
        th.join(300)
    done.set()
    tick.join(300)
    assert errors == [], errors

    t = IceTable(spark, root)
    got = sorted(r.timestamp for r in t.scan().collect())
    want = sorted([1] + [1000 * w + i for w in (1, 2, 3) for i in range(4)])
    assert got == want  # no lost or duplicated appends
    # one final tick in quiet conditions bounds fragmentation
    t.maintain(policy)
    assert _files_per_partition(t) <= policy.max_files_per_partition


def test_diff_stats_matches_bruteforce(spark, tmp_path):
    """diff_stats' per-partition deltas must equal a brute-force diff
    of the two snapshots' file lists — including a CoW rewrite showing
    up as adds + removes in only the touched partition."""
    root = str(tmp_path / "t")
    rows = [location_row(timestamp=100 + i,
                         user_id=f"u{i % 2}") for i in range(8)]
    IceTable.create(
        spark, root, location_df(spark, rows),
        partition_col=PARTITION_COL, key_col=KEY_COL, max_rows_per_file=2,
    )
    t = IceTable(spark, root)
    first = t.manifest.current_snapshot_id()
    t.append(location_df(spark, [location_row(timestamp=900,
                                              user_id="u0")]))
    # partial file overlap (u1 files hold ts [101,103] and [105,107]):
    # deleting 100-102 must REWRITE the first file to keep ts 103
    t.delete_range("u1", 100, 102)

    def files_of(sid):
        return {f.path: f for f in t.manifest.load(sid).files}

    base, cur = files_of(first), files_of(t.manifest.current_snapshot_id())
    expect: dict = {}
    for p, f in cur.items():
        if p not in base:
            e = expect.setdefault(str(f.partition), [0, 0, 0, 0, 0, 0])
            e[0] += 1; e[1] += f.rows; e[2] += f.bytes
    for p, f in base.items():
        if p not in cur:
            e = expect.setdefault(str(f.partition), [0, 0, 0, 0, 0, 0])
            e[3] += 1; e[4] += f.rows; e[5] += f.bytes

    got = {
        r["partition"]: [r["files_added"], r["rows_added"],
                         r["bytes_added"], r["files_removed"],
                         r["rows_removed"], r["bytes_removed"]]
        for r in t.diff_stats(first).collect()
    }
    assert got == expect
    # u1 was rewritten: both adds and removes present for it
    assert got["u1"][0] > 0 and got["u1"][3] > 0
    # self-diff is empty
    cur_id = t.manifest.current_snapshot_id()
    assert t.diff_stats(cur_id, cur_id).count() == 0


def test_expire_unpins_dead_lineages_after_ttl(spark, tmp_path):
    """The lineage pin carries a TTL: a lineage whose newest stamp is
    older than the retention window is dead (per-run ephemeral
    checkpoints) and must NOT accrete pinned snapshots forever."""
    root = str(tmp_path / "t")
    IceTable.create(
        spark, root, location_df(spark, [location_row(timestamp=100000)]),
        partition_col=PARTITION_COL, key_col=KEY_COL,
        source_batch_id=0, source_lineage="ephemeral-dead",
    )
    t = IceTable(spark, root)
    t.append(location_df(spark, [location_row(timestamp=100001)]),
             source_batch_id=1, source_lineage="ephemeral-dead")
    t.compact(min_files=2, target_rows_per_file=1000)

    # within retention: the stamped snapshot is pinned
    assert t.expire_snapshots(keep_last=1)
    assert t.last_committed_batch("ephemeral-dead") == 1
    # past retention: the dead lineage no longer pins anything
    expired = t.expire_snapshots(keep_last=1, lineage_retention_ms=0)
    assert expired
    assert t.last_committed_batch("ephemeral-dead") is None
    assert len(t.snapshots()) == 1
    assert t.scan().count() == 2  # contents untouched by expiry


def test_maintain_orphan_cleanup_tick(spark, tmp_path):
    """With orphan_retention_ms set, the tick also sweeps crash
    leftovers: an unreferenced data file older than the retention is
    removed, table contents untouched."""
    import time as _time

    root = str(tmp_path / "t")
    IceTable.create(
        spark, root, location_df(spark, [location_row(timestamp=1)]),
        partition_col=PARTITION_COL, key_col=KEY_COL,
    )
    t = IceTable(spark, root)
    # plant a crash leftover with an old mtime
    orphan = os.path.join(root, "data", "crashed-writer.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not a committed file")
    old = _time.time() - 3600
    os.utime(orphan, (old, old))

    n = t.scan().count()
    report = t.maintain(MaintenancePolicy(
        max_files_per_partition=64, keep_snapshots=None,
        orphan_retention_ms=60_000))
    assert any("crashed-writer" in p for p in report["orphans_removed"])
    assert not os.path.exists(orphan)
    assert t.scan().count() == n
    # without the knob the tick leaves orphans alone
    with open(orphan, "wb") as f:
        f.write(b"again")
    os.utime(orphan, (old, old))
    report2 = t.maintain(MaintenancePolicy(max_files_per_partition=64,
                                           keep_snapshots=None))
    assert "orphans_removed" not in report2
    assert os.path.exists(orphan)


def test_maintain_refreshes_bloom_after_compaction(spark, tmp_path):
    """Compaction rewrites files under new paths, orphaning their
    bloom rows; the maintenance tick must top the store up so point
    scans keep pruning (instead of decaying to conservative
    read-everything coverage)."""
    from pyspark.sql import functions as F

    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        F.pmod(F.col("id") * 2654435761, F.lit(97)).alias("v"))
    t = IceTable.create(spark, str(tmp_path / "t"), df,
                        partition_col=None, key_col="v",
                        max_rows_per_file=50)
    assert t.build_bloom(["k"]) == t.file_count()
    t.append(spark.createDataFrame([(1000, 1)], "k long, v long"))
    report = t.maintain(MaintenancePolicy(max_files_per_partition=3,
                                          target_rows_per_file=500))
    assert report["compacted"] is True
    assert report["bloom_indexed"] >= 1  # rewritten files re-indexed
    ps = t.point_scan("k", 123)
    assert [r["k"] for r in ps.collect()] == [123]
    assert len(ps.inputFiles()) <= 2
    # a bloom-less table's tick stays a no-op on the bloom front
    t2 = IceTable.create(
        spark, str(tmp_path / "t2"),
        spark.createDataFrame([(1, 1)], "k long, v long"),
        partition_col=None, key_col="v")
    r2 = t2.maintain(MaintenancePolicy())
    assert "bloom_indexed" not in r2


def test_bloom_store_compaction_bounds_store(spark, tmp_path):
    """The bloom store must not grow without bound (r7 verdict task):
    after table compaction rewrote files, compact_bloom() folds every
    increment into one generation dir, drops rows for dead paths, and
    deduplicates (path, col) — store rows == live files x cols."""
    from pyspark.sql import functions as F

    from iceberg_core_spark.table.bloom import _store_dirs, read_store

    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        F.pmod(F.col("id") * 2654435761, F.lit(97)).alias("v"))
    t = IceTable.create(spark, str(tmp_path / "t"), df,
                        partition_col=None, key_col="v",
                        max_rows_per_file=50)
    t.build_bloom(["k"])
    # churn: appends + a compaction leave dead paths in the store
    for i in range(3):
        t.append(spark.createDataFrame([(1000 + i, 1)],
                                       "k long, v long"))
        t.build_bloom()
    dead = t.file_count()
    t.compact(target_rows_per_file=500, min_files=2)
    t.build_bloom()
    store = read_store(spark, str(tmp_path / "t"))
    assert store.count() > t.file_count()  # dead rows present

    rep = t.compact_bloom()
    assert rep["dirs_folded"] >= 2
    # bounded by LIVE paths across retained snapshots x cols — the
    # pre-compaction snapshots are still retained, so their paths
    # stay (time travel still probes them); the fold's win here is
    # ONE dir instead of five
    live_paths = set()
    for s in t.manifest.snapshots(load_files=True):
        live_paths |= {f.path for f in s.files}
    store2 = read_store(spark, str(tmp_path / "t"))
    assert rep["rows_after"] == store2.count() == len(live_paths)
    assert len(_store_dirs(str(tmp_path / "t"))) == 1
    assert dead  # sanity: churn actually created files

    # pruning still works through the compacted generation
    ps = t.point_scan("k", 123)
    assert [r["k"] for r in ps.collect()] == [123]
    assert len(ps.inputFiles()) <= 2
    # and the store accepts NEW increments after the flip
    t.append(spark.createDataFrame([(7777, 1)], "k long, v long"))
    assert t.build_bloom() == 1
    assert len(t.point_scan("k", 7777).inputFiles()) <= 2

    # expire history, compact again: the old snapshots' paths are now
    # DEAD — the store shrinks to exactly the head's files
    t.expire_snapshots(keep_last=1)
    rep2 = t.compact_bloom()
    assert rep2["rows_after"] < rep2["rows_before"]
    assert rep2["rows_after"] == t.file_count()
    ps2 = t.point_scan("k", 246)
    assert [r["k"] for r in ps2.collect()] == [246]


def test_maintain_tick_compacts_bloom(spark, tmp_path):
    """The maintain() tick runs the generation flip after a table
    compaction (dead paths) without a separate operator call."""
    from pyspark.sql import functions as F

    from iceberg_core_spark.table.bloom import _store_dirs

    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        F.pmod(F.col("id") * 2654435761, F.lit(97)).alias("v"))
    t = IceTable.create(spark, str(tmp_path / "t"), df,
                        partition_col=None, key_col="v",
                        max_rows_per_file=50)
    t.build_bloom(["k"])
    t.append(spark.createDataFrame([(1000, 1)], "k long, v long"))
    rep = t.maintain(MaintenancePolicy(max_files_per_partition=3,
                                       target_rows_per_file=500))
    assert rep["compacted"] is True
    assert "bloom_compacted" in rep
    assert len(_store_dirs(str(tmp_path / "t"))) == 1
    ps = t.point_scan("k", 123)
    assert [r["k"] for r in ps.collect()] == [123]
    assert len(ps.inputFiles()) <= 2


def test_bloom_builds_only_missing_pairs(spark, tmp_path):
    """Adding a column to the bloom config builds ONLY the missing
    (path, col) pairs — rebuilding all columns would duplicate rows
    across increments and grow the store unbounded (r7 ADVICE)."""
    from pyspark.sql import functions as F

    from iceberg_core_spark.table.bloom import read_store

    df = spark.range(0, 300).select(
        F.col("id").alias("k"),
        (F.col("id") * 7).alias("w"),
        F.pmod(F.col("id"), F.lit(13)).alias("v"))
    t = IceTable.create(spark, str(tmp_path / "t"), df,
                        partition_col=None, key_col="v",
                        max_rows_per_file=50)
    n = t.file_count()
    assert t.build_bloom(["k"]) == n
    # second build adds ONLY the (path, w) pairs
    assert t.build_bloom(["k", "w"]) == n
    store = read_store(spark, str(tmp_path / "t"))
    assert store.count() == 2 * n  # no duplicate (path, col) rows
    assert (store.select("path", "col").distinct().count()
            == store.count())
    # both columns prune
    for col, val in (("k", 123), ("w", 123 * 7)):
        ps = t.point_scan(col, val)
        assert [r["k"] for r in ps.collect()] == [123]
        assert len(ps.inputFiles()) <= 2


def test_bloom_probe_collect_bounded_by_candidates(spark, tmp_path):
    """The prune's driver pull is bounded by the PROBE's candidate
    list, never the table's file count: probing with 2 candidate
    files against a 6-file store where every file would miss returns
    at most those 2 paths (r7 verdict watch item)."""
    from pyspark.sql import functions as F

    from iceberg_core_spark.table.bloom import _absent_paths

    df = spark.range(0, 300).select(
        F.col("id").alias("k"),
        F.pmod(F.col("id"), F.lit(13)).alias("v"))
    t = IceTable.create(spark, str(tmp_path / "t"), df,
                        partition_col=None, key_col="v",
                        max_rows_per_file=50)
    t.build_bloom(["k"])
    snap = t.manifest.load()
    assert len(snap.files) >= 5
    cand = snap.files[:2]
    # absent value: EVERY store row proves a miss, but only the two
    # candidates may come back
    absent = _absent_paths(t, cand, {"k": [10**9]})
    assert absent == {f.path for f in cand}
