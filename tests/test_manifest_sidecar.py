"""Metadata-as-data: file lists beyond Manifest.inline_max live in a
Parquet sidecar and query pruning runs as a DataFrame predicate over it,
materializing only surviving entries (VERDICT r1 item 7 / TODO item 1)."""

import datetime
import os
import time

import pytest

from iceberg_core_spark.table import IceTable
from iceberg_core_spark.table.manifest import Manifest, ManifestFile, Snapshot


@pytest.fixture
def small_inline_max(monkeypatch):
    monkeypatch.setattr(Manifest, "inline_max", 2)


def _mk_table(spark, root, n=2000, files=8):
    df = spark.range(0, n).selectExpr(
        "id", "id % 4 as part", "cast(id as string) as payload"
    )
    return IceTable.create(spark, root, df, partition_col="part",
                           key_col="id", max_rows_per_file=n // files)


def test_sidecar_roundtrip_end_to_end(spark, tmp_path, small_inline_max):
    t = _mk_table(spark, str(tmp_path / "t"))
    snap = t.manifest.load(load_files=False)
    assert snap.files_ref is not None  # sidecar engaged
    assert os.path.exists(t.manifest.sidecar_path(snap.files_ref))
    # full load materializes the same entries the table was written with
    full = t.manifest.load()
    assert len(full.files) == t.file_count() and full.files[0].content_hash

    assert t.scan().count() == 2000
    got = t.query(partition=3, lo=100, hi=500).collect()
    exp = [i for i in range(100, 501) if i % 4 == 3]
    assert sorted(r.id for r in got) == exp
    # pruning must not read every file
    assert len(t.query(partition=3).inputFiles()) < t.file_count()

    # append / compact / expire keep working through the sidecar
    t.append(spark.range(2000, 2100).selectExpr(
        "id", "id % 4 as part", "cast(id as string) as payload"))
    assert t.scan().count() == 2100
    t.compact(target_rows_per_file=10_000)
    assert t.scan().count() == 2100
    expired = t.expire_snapshots(keep_last=1)
    assert expired  # old snapshots (and their sidecars) are gone
    for sid in expired:
        assert not os.path.exists(
            t.manifest.sidecar_path(f"files-{sid}.parquet"))
    assert t.scan().count() == 2100


def _synthetic_snapshot(n_files=10_000):
    base = datetime.datetime(2024, 1, 1)
    files = []
    for i in range(n_files):
        lo = base + datetime.timedelta(minutes=10 * i)
        hi = lo + datetime.timedelta(minutes=10)
        files.append(ManifestFile(
            path=f"data/s0/_p={i % 100}/part-{i}.parquet",
            partition=i % 100,
            key_min=lo,
            key_max=hi,
            rows=1000,
            bytes=10_000,
            content_hash=f"h{i}",
            col_stats={"v": (float(i), float(i + 1))},
        ))
    import json

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("ts", LongType())])
    return Snapshot(
        snapshot_id=0, parent_id=None, timestamp_ms=0, operation="create",
        schema_json=schema.json(), partition_col="part", key_col="ts",
        files=files, stat_cols=["v"],
    )


def test_sidecar_prunes_10k_files_metadata_only(spark, tmp_path):
    """A 10k-file manifest must answer a point query via the sidecar
    predicate without materializing 10k entries, agree exactly with the
    inline list-comprehension pruning, and stay fast."""
    root = str(tmp_path / "big")
    os.makedirs(root)
    snap = _synthetic_snapshot(10_000)
    m = Manifest(root)
    m.commit(snap)
    assert m.load(load_files=False).files_ref  # 10k > inline_max=512

    t = IceTable(spark, root)
    lazy = t.manifest.load(load_files=False)
    lo = datetime.datetime(2024, 1, 3)
    hi = datetime.datetime(2024, 1, 4)

    start = time.monotonic()
    pruned = t._pruned_files(lazy, partition=7, lo=lo, hi=hi)
    elapsed = time.monotonic() - start

    full = t.manifest.load()  # eager twin for the oracle comparison
    oracle = [f for f in full.files
              if f.partition == 7 and f.overlaps(lo, hi)]
    assert {f.path for f in pruned} == {f.path for f in oracle}
    assert 0 < len(pruned) < 20  # a sliver of 10k, not the table
    assert elapsed < 15  # one small metadata job, not 10k entry parses

    # stats-column pruning through the sidecar (range_scan predicate)
    pv = t._pruned_files(lazy, ranges={"v": (100.5, 110.5)})
    ov = [f for f in full.files if f.overlaps_col("v", 100.5, 110.5)]
    assert {f.path for f in pv} == {f.path for f in ov}
    assert len(pv) < 20


def test_distributed_commit_never_materializes_entries(
        spark, tmp_path, small_inline_max, monkeypatch):
    """Large commits build the sidecar with a Spark job: the driver-side
    entry collector must never run, seq comes from the sidecar column,
    and content-hash dedupe works as a semi-join against the parent
    sidecar."""
    import iceberg_core_spark.table.ice_table as it

    def boom(*a, **k):
        raise AssertionError("driver-side entry collection ran")

    monkeypatch.setattr(it, "_collect_file_stats", boom)

    root = str(tmp_path / "dist")
    t = _mk_table(spark, root)  # create: 8 files > inline_max=2
    snap = t.manifest.load(load_files=False)
    assert snap.files_ref and snap.files_count == t.file_count()
    assert snap.files == []  # lazy: nothing materialized

    # append onto the sidecar-backed parent (distributed union)
    extra = spark.range(2000, 2600).selectExpr(
        "id", "id % 4 as part", "cast(id as string) as payload")
    t.append(extra)
    snap2 = t.manifest.load(load_files=False)
    assert snap2.files_ref and snap2.files_count > snap.files_count
    assert t.scan().count() == 2600

    # seq column round-trips: base files keep 0, new files carry 1
    full = t.manifest.load()
    seqs = {f.seq for f in full.files}
    assert seqs == {0, 1}

    # idempotent re-append of identical content is dropped by the
    # sidecar semi-join dedupe
    before = t.file_count()
    t.append(extra, dedupe_identical_files=True)
    assert t.scan().count() == 2600
    assert t.file_count() == before


# ---------------------------------------------------------------------------
# round-3: metadata paths must not materialize per-file entries on the
# driver (VERDICT r2 items 3-4) — enforced by making full-entry
# materialization raise
# ---------------------------------------------------------------------------

def _forbid_entry_materialization(monkeypatch):
    def boom(self, files_ref):
        raise AssertionError(
            "driver materialized per-file manifest entries "
            f"(sidecar {files_ref})"
        )
    monkeypatch.setattr(Manifest, "_read_files_sidecar", boom)


def test_mor_delete_metadata_only_on_sidecar(spark, tmp_path,
                                             small_inline_max, monkeypatch):
    t = _mk_table(spark, str(tmp_path / "t"))
    parent = t.manifest.load(load_files=False)
    assert parent.files_ref is not None
    _forbid_entry_materialization(monkeypatch)
    snap = t.delete_where("part = 1", mode="mor")
    # the parent's sidecar is inherited BY REFERENCE — the data is
    # unchanged by definition of merge-on-read
    assert snap.files_ref == parent.files_ref
    assert snap.files_count == parent.files_count
    # scan applies the predicate without ever parsing entries
    assert t.scan().count() == 1500  # part==1 rows (500) hidden
    assert t.file_count() == parent.files_count


def test_compact_sidecar_no_entry_materialization(spark, tmp_path,
                                                  small_inline_max,
                                                  monkeypatch):
    t = _mk_table(spark, str(tmp_path / "t"))
    before = t.file_count()
    _forbid_entry_materialization(monkeypatch)
    snap = t.compact(target_rows_per_file=10_000)
    assert snap.operation == "compact"
    assert t.scan().count() == 2000
    assert t.file_count() < before


def test_compact_sidecar_rewrites_mor_deletes(spark, tmp_path,
                                              small_inline_max, monkeypatch):
    t = _mk_table(spark, str(tmp_path / "t"))
    t.delete_where("part = 2", mode="mor")
    _forbid_entry_materialization(monkeypatch)
    snap = t.compact(target_rows_per_file=10_000)
    assert snap.delete_predicates == []  # rewritten away
    assert t.scan().count() == 1500
    monkeypatch.undo()
    # survivor entries kept their stats; victims re-derived them
    full = t.manifest.load()
    assert all(f.content_hash for f in full.files)


def test_scan_incremental_paths_only(spark, tmp_path, small_inline_max,
                                     monkeypatch):
    t = _mk_table(spark, str(tmp_path / "t"))
    s0 = t.manifest.load(load_files=False).snapshot_id
    t.append(spark.range(2000, 2300).selectExpr(
        "id", "id % 4 as part", "cast(id as string) as payload"))
    _forbid_entry_materialization(monkeypatch)
    inc = t.scan_incremental(since=s0)
    assert sorted(r.id for r in inc.collect()) == list(range(2000, 2300))


def test_expire_preserves_shared_sidecar(spark, tmp_path, small_inline_max):
    t = _mk_table(spark, str(tmp_path / "t"))
    t.delete_where("part = 1", mode="mor")  # shares parent's files_ref
    expired = t.expire_snapshots(keep_last=1)
    assert expired
    cur = t.manifest.load(load_files=False)
    # the kept snapshot's (shared) sidecar must survive expiry
    assert os.path.exists(t.manifest.sidecar_path(cur.files_ref))
    assert t.scan().count() == 1500


def test_expire_with_shared_sidecar_among_dropped(spark, tmp_path,
                                                  small_inline_max):
    """Regression: two DROPPED snapshots sharing one sidecar (create +
    MoR delete) must both expire cleanly — paths are collected before
    any sidecar is removed."""
    t = _mk_table(spark, str(tmp_path / "t"))
    t.delete_where("part = 1", mode="mor")   # shares create's files_ref
    t.append(spark.range(2000, 2100).selectExpr(
        "id", "id % 4 as part", "cast(id as string) as payload"))
    t.compact(target_rows_per_file=10_000)
    expired = t.expire_snapshots(keep_last=1)
    assert len(expired) == 3
    # MoR predicate (issued BEFORE the append) hid only the original
    # part==1 rows — the later append's files carry a higher seq and
    # are untouched; compaction then rewrote the predicate away
    assert t.scan().count() == 1500 + 100


def test_stale_sidecar_compact_conflicts_and_cleans(spark, tmp_path,
                                                    small_inline_max):
    """A stale distributed (base_files_df) compact commit must raise
    CommitConflictError and delete its newly written data files — same
    contract as the inline read-modify-write path (test_occ)."""
    import pytest as _pytest

    from iceberg_core_spark.table.manifest import CommitConflictError

    root = str(tmp_path / "t")
    t = _mk_table(spark, root)
    snap = t.manifest.load(load_files=False)
    mdf = spark.read.parquet(t.manifest.sidecar_path(snap.files_ref))

    # another writer advances the table first
    t.append(spark.range(2000, 2050).selectExpr(
        "id", "id % 4 as part", "cast(id as string) as payload"))

    with _pytest.raises(CommitConflictError):
        t._write_commit(
            spark.range(9000, 9010).selectExpr(
                "id", "id % 4 as part", "cast(id as string) as payload"),
            "compact", snap.partition_col, snap.key_col, 1_000_000,
            base_files=[], expected_parent=snap.snapshot_id,
            base_files_df=mdf,
        )
    t2 = IceTable(spark, root)
    assert t2.scan().count() == 2050  # loser's rows absent
    cur = t2.manifest.load(load_files=False)
    live = {p for p, _s in t2.manifest.read_sidecar_path_seq(cur.files_ref)}
    on_disk = {
        os.path.relpath(os.path.join(dp, n), root)
        for dp, _d, ns in os.walk(os.path.join(root, "data"))
        for n in ns if n.endswith(".parquet")
    }
    assert on_disk == live  # loser's files deleted, not orphaned


def test_rollback_metadata_only_shared_ref(spark, tmp_path,
                                           small_inline_max, monkeypatch):
    """rollback() restores an earlier snapshot's state as a NEW commit
    without materializing entries; it shares the target's sidecar and
    survives expiry of intermediate snapshots."""
    root = str(tmp_path / "t")
    t = _mk_table(spark, root)
    good = t.manifest.load(load_files=False)
    t.delete_where("part != 99", mode="cow")   # "bad" commit: empties table
    assert t.scan().count() == 0
    _forbid_entry_materialization(monkeypatch)
    rb = t.rollback(good.snapshot_id)
    assert rb.operation == "rollback"
    assert rb.files_ref == good.files_ref       # shared by reference
    assert t.scan().count() == 2000             # state restored
    monkeypatch.undo()
    # expiring everything but the rollback keeps the shared sidecar
    t.expire_snapshots(keep_last=1)
    assert t.scan().count() == 2000


def test_remove_orphans_deletes_only_unreferenced(spark, tmp_path,
                                                  small_inline_max):
    root = str(tmp_path / "t")
    t = _mk_table(spark, root)
    # plant an orphan (simulates a writer that died pre-commit)
    orphan_dir = os.path.join(root, "data", "s99-deadbeef")
    os.makedirs(orphan_dir)
    spark.range(5).coalesce(1).write.mode("overwrite").parquet(orphan_dir)
    # default retention: a FRESH unreferenced file could be an in-flight
    # concurrent writer's — it must survive
    assert t.remove_orphans() == []
    # backdate past the retention cutoff → now it is a true orphan
    old = time.time() - 4 * 24 * 3600
    for dp, _d, names in os.walk(orphan_dir):
        for n in names:
            os.utime(os.path.join(dp, n), (old, old))
    removed = t.remove_orphans()
    assert removed and all(r.startswith("data/s99-deadbeef") for r in removed)
    assert t.scan().count() == 2000  # live data untouched
    assert t.remove_orphans() == []  # idempotent
    # explicit single-writer mode removes regardless of age
    os.makedirs(orphan_dir, exist_ok=True)
    spark.range(3).coalesce(1).write.mode("overwrite").parquet(orphan_dir)
    assert t.remove_orphans(older_than_ms=0)
    assert t.scan().count() == 2000


def test_remove_orphans_sweeps_manifest_dir_leftovers(
        spark, tmp_path, small_inline_max):
    # r11 review finding 4c: crashed writers leak files-*.parquet
    # sidecars and *.tmp-* scratch under _manifest/ forever — the
    # sweep must reclaim them with the same mtime discipline while
    # keeping every referenced sidecar, snapshot doc, CURRENT, and tag
    root = str(tmp_path / "t")
    t = _mk_table(spark, root)
    t.append(spark.range(2000, 2100).selectExpr(
        "id", "id % 4 as part", "cast(id as string) as payload"))
    t.create_tag("v1")
    man_dir = t.manifest.dir
    live_refs = {s.files_ref for s in t.snapshots() if s.files_ref}
    assert live_refs  # the table really is sidecar-backed
    # plant the crash leftovers: an unreferenced sidecar DIRECTORY
    # (Spark-written shape), an unreferenced sidecar FILE
    # (driver-written shape), CAS/hint scratch, and staging dirs
    orphan_dir = os.path.join(man_dir, "files-99-deadbeef.parquet")
    spark.range(5).coalesce(1).write.parquet(orphan_dir)
    orphan_file = os.path.join(man_dir, "files-98-cafebabe.parquet")
    tmp_sidecar = os.path.join(man_dir, "files-97-0ddba11.parquet.tmp")
    cas_tmp = os.path.join(man_dir, "snapshot-42.json.tmp-12ab34cd")
    hint_tmp = os.path.join(man_dir, "CURRENT.tmp-deadbeef")
    base_tmp = os.path.join(man_dir, "tmp-base-12345678.parquet")
    os.makedirs(base_tmp)
    # tmp-LOOKING names that are NOT writer-emitted scratch shapes:
    # the r12 ADVICE anchoring means these survive any retention
    # window (the old "contains .tmp" matcher would delete all three)
    impostors = [os.path.join(man_dir, n) for n in
                 ("stats.tmp-index.json", "_tmp_notes",
                  "tmp-other-xyz.parquet")]
    for p in (orphan_file, tmp_sidecar, cas_tmp, hint_tmp,
              os.path.join(base_tmp, "part-00000.parquet"),
              *impostors):
        with open(p, "w") as f:
            f.write("x")
    # fresh leftovers could be an in-flight writer's — retained
    assert t.remove_orphans() == []
    old = time.time() - 4 * 24 * 3600
    for p in (orphan_dir, orphan_file, tmp_sidecar, cas_tmp, hint_tmp,
              base_tmp, *impostors):
        os.utime(p, (old, old))
    removed = set(t.remove_orphans())
    rel = lambda p: os.path.relpath(p, root)  # noqa: E731
    assert {rel(orphan_dir), rel(orphan_file), rel(tmp_sidecar),
            rel(cas_tmp), rel(hint_tmp), rel(base_tmp)} <= removed
    # everything load-bearing survives, however old
    for s in t.snapshots():
        assert os.path.exists(
            os.path.join(man_dir, f"snapshot-{s.snapshot_id}.json"))
    for ref in live_refs:
        assert os.path.exists(t.manifest.sidecar_path(ref))
    assert os.path.exists(os.path.join(man_dir, "CURRENT"))
    assert t.tags() == {"v1": t.manifest.load(load_files=False).snapshot_id}
    for p in impostors:  # unrecognized names are never deletion candidates
        assert os.path.exists(p)
    assert t.scan().count() == 2100
    assert t.remove_orphans() == []  # idempotent


def test_snapshot_total_bytes_projected_no_entry_parse(
        spark, tmp_path, small_inline_max):
    # r11 ADVICE: the index-store rebuild capacity gate summed
    # f.bytes via a FULL manifest load — JSON-parsing every sidecar
    # entry on the driver just to total one column. The projected
    # helper must agree with the full load and never materialize
    # entries.
    t = _mk_table(spark, str(tmp_path / "t"))
    full = t.manifest.load(load_files=True)
    want = sum(f.bytes for f in full.files)
    assert want > 0
    brief = t.manifest.load(load_files=False)
    assert brief.files_ref and not brief.files  # sidecar-backed
    # dedicated patch context: monkeypatch.undo() on the shared
    # function-scoped instance would also revert the small_inline_max
    # fixture's patch for the rest of the test
    mp = pytest.MonkeyPatch()
    try:
        _forbid_entry_materialization(mp)
        assert t.manifest.snapshot_total_bytes(brief) == want
    finally:
        mp.undo()
    # inline snapshots (files carried in the doc) sum directly
    small = IceTable.create(
        spark, str(tmp_path / "inline"),
        spark.range(10).selectExpr("id", "cast(id as string) as payload"),
        key_col="id")
    isnap = small.manifest.load()
    assert isnap.files_ref is None
    assert small.manifest.snapshot_total_bytes(isnap) == \
        sum(f.bytes for f in isnap.files)


def test_files_df_encoding_stable_across_inline_sidecar(spark, tmp_path,
                                                        monkeypatch):
    """r14 review: files_df must stringify partition/key stats in the
    NORMALIZED sidecar encoding on BOTH branches — a table crossing the
    inline→sidecar threshold must not change its files_df encoding
    mid-history (timestamp partitions: epoch micros, not str(datetime);
    the rule diff_stats already pins)."""
    import datetime

    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, d), i)
         for d in (1, 2) for i in range(4)],
        "ts timestamp, v int")
    t = IceTable.create(spark, root, df, partition_col="ts",
                        key_col="v", max_rows_per_file=2)
    inline_parts = {r.partition for r in t.files_df().collect()}
    monkeypatch.setattr(Manifest, "inline_max", 1)
    t.append(spark.createDataFrame(
        [(datetime.datetime(2024, 1, 3), 9)], "ts timestamp, v int"))
    snap = t.manifest.load(load_files=False)
    assert snap.files_ref, "append should have crossed to sidecar"
    sidecar_parts = {r.partition for r in t.files_df().collect()}
    # the pre-existing partitions must keep their encoding byte-for-byte
    assert inline_parts <= sidecar_parts
    # and every value is the normalized integer encoding, not
    # str(datetime) ('2024-01-01 00:00:00')
    assert all(p.lstrip("-").isdigit() for p in sidecar_parts)
    assert all(p.lstrip("-").isdigit() for p in inline_parts)
