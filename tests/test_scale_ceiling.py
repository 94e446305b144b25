"""Driver-side planning ceiling under a LARGE manifest.

The documented scale story for sidecar-backed snapshots is that the
driver materializes only (path, seq) STUBS for the files a plan
actually touches (scan_incremental's change feed, _pruned_files
survivors, compact victims) — never parsed entry_json documents. At
~100 bytes of JVM-side stub per file that is ~10 MB for 100k files;
this test VERIFIES the Python-side cost of that claim instead of
assuming it: a synthetic 100k-entry sidecar (hardlinks to one real
parquet file keep the table metadata-only) is planned end-to-end and
the stub materialization must stay inside a fixed time/memory budget.
"""

import json
import os
import time
import tracemalloc

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from iceberg_core_spark.table import IceTable
from iceberg_core_spark.table.manifest import Manifest, ManifestFile, Snapshot

N_FILES = 100_000
N_BASE = 100  # entries already present in the `since` snapshot


@pytest.fixture(scope="module")
def big_manifest_table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ceil") / "t")
    seed_df = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    t = IceTable.create(spark, root, seed_df, key_col="k")
    real = [f for f in t.manifest.load().files][0]
    real_abs = os.path.join(root, real.path)

    # 100k hardlinks: distinct paths, (almost) zero data copy. ext4
    # caps links/inode at ~65k, so spread the links over 4 physical
    # copies of the tiny seed file.
    import shutil as _sh

    link_dir = os.path.join(root, "data", "synthetic")
    os.makedirs(link_dir)
    sources = []
    for j in range(4):
        src = os.path.join(link_dir, f"_src{j}.parquet.orig")
        _sh.copyfile(real_abs, src)
        sources.append(src)
    entries = []
    for i in range(N_FILES):
        rel = os.path.join("data", "synthetic", f"f{i:06d}.parquet")
        os.link(sources[i % 4], os.path.join(root, rel))
        entries.append(ManifestFile(
            path=rel, partition=None, key_min=i * 10, key_max=i * 10 + 9,
            rows=5, bytes=real.bytes, content_hash=f"h{i:06d}",
            seq=0 if i < N_BASE else 1,
        ))

    man = t.manifest
    base_ref = "files-base-synth.parquet"
    cur_ref = "files-cur-synth.parquet"
    man._write_files_sidecar(entries[:N_BASE], ["k"], base_ref)
    man._write_files_sidecar(entries, ["k"], cur_ref)
    prev = man.load(load_files=False)

    def synth_snapshot(sid, parent, ref, count):
        return Snapshot(
            snapshot_id=sid, parent_id=parent,
            timestamp_ms=Manifest.now_ms(), operation="append",
            schema_json=prev.schema_json, partition_col=None, key_col="k",
            files=[], delete_predicates=[], stat_cols=["k"], zorder_by=[],
            files_ref=ref, files_count=count,
        )

    man.commit(synth_snapshot(prev.snapshot_id + 1, prev.snapshot_id,
                              base_ref, N_BASE))
    man.commit(synth_snapshot(prev.snapshot_id + 2, prev.snapshot_id + 1,
                              cur_ref, N_FILES))
    return IceTable(spark, root), prev.snapshot_id + 1


def test_sidecar_stub_budget_100k(big_manifest_table):
    """Reconstructing every stub of the 100k sidecar must cost ~100
    bytes/file Python-side — the documented planning budget."""
    t, _base = big_manifest_table
    snap = t.manifest.load(load_files=False)
    assert snap.files_count == N_FILES

    tracemalloc.start()
    pairs = t.manifest.read_sidecar_path_seq(snap.files_ref)
    stubs = [
        ManifestFile(path=p, partition=None, key_min=None, key_max=None,
                     rows=0, bytes=0, content_hash="", seq=s)
        for p, s in pairs
    ]
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert len(stubs) == N_FILES
    per_file = peak / N_FILES
    # budget: path string (~30 chars) + dataclass + list slot; the
    # assertion bounds it at 400 B/file (≈40 MB at 1M surviving files)
    assert per_file < 400, f"stub cost {per_file:.0f} B/file"


def test_incremental_planning_bounded_100k(big_manifest_table):
    """scan_incremental over a 100k-file sidecar: the anti-join runs as
    a Spark job and only the ADDED files' (path, seq) stubs reach the
    driver. Planning (feed construction + file index) must finish in
    seconds and stay within the stub budget — it must NOT parse 100k
    entry_json documents."""
    t, base = big_manifest_table
    t0 = time.monotonic()
    tracemalloc.start()
    feed = t.scan_incremental(since=base)
    n_inputs = len(feed.inputFiles())
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    elapsed = time.monotonic() - t0
    assert n_inputs == N_FILES - N_BASE
    assert peak < 100 * 1024 * 1024, f"planning peak {peak/1e6:.0f} MB"
    # generous wall budget: the claim is "not O(100k JSON parses)"
    # (minutes), not a latency SLO — host-elevation windows (BASELINE.md
    # r5 addendum) breached a 120 s budget once with the plan unchanged
    assert elapsed < 300, f"planning took {elapsed:.0f}s"


def test_changelog_planning_bounded_100k(big_manifest_table):
    """scan_changes over a 100k-file sidecar window: planning stays in
    the (path, seq) stub budget (column-projected pyarrow read, no
    entry_json parse) and the diff plan reads only the CHANGED files —
    an append-only window diffs as added-files-only, the since side
    contributes an empty scan."""
    t, base = big_manifest_table
    t0 = time.monotonic()
    tracemalloc.start()
    ch = t.scan_changes(since=base)
    n_inputs = len(ch.inputFiles())
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    elapsed = time.monotonic() - t0
    assert n_inputs == N_FILES - N_BASE
    assert peak < 100 * 1024 * 1024, f"planning peak {peak/1e6:.0f} MB"
    assert elapsed < 300, f"planning took {elapsed:.0f}s"


def test_pruned_query_survivor_stubs_100k(big_manifest_table):
    """A selective key-range query over the 100k-entry sidecar prunes
    with a DataFrame predicate; only the ~10 surviving stubs ever
    materialize on the driver (survivors-only planning)."""
    t, _base = big_manifest_table
    snap = t.manifest.load(load_files=False)
    t0 = time.monotonic()
    survivors = t._pruned_files(snap, lo=500_000, hi=500_099)
    elapsed = time.monotonic() - t0
    # keys are i*10..i*10+9 per file: 100 keys span ~10-11 files
    assert 0 < len(survivors) <= 12
    assert elapsed < 60, f"pruning took {elapsed:.0f}s"
    # stubs carry no parsed stats — the entry_json documents stay on disk
    assert all(f.key_min is None and not f.col_stats for f in survivors)


def test_partitions_df_distributed_100k(big_manifest_table):
    """partitions_df over a 100k-file sidecar must aggregate the
    sidecar SCAN (a Spark job), not driver-side entries: planning +
    execution stays in seconds and the driver never parses 100k
    entry_json documents."""
    t, _base = big_manifest_table
    t0 = time.monotonic()
    tracemalloc.start()
    rows = t.partitions_df().collect()
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    elapsed = time.monotonic() - t0
    # synthetic entries carry partition=None → a single rollup row
    assert len(rows) == 1
    assert rows[0].file_count == N_FILES
    assert rows[0].row_count == 5 * N_FILES
    assert peak < 50 * 1024 * 1024, f"driver peak {peak/1e6:.0f} MB"
    assert elapsed < 60, f"partitions_df took {elapsed:.0f}s"


def test_sidecar_bytes_on_disk_100k(big_manifest_table):
    """The 100k sidecar itself stays small on disk (column-compressed
    parquet) — the metadata plane scales sublinearly with entry count."""
    t, _base = big_manifest_table
    snap = t.manifest.load(load_files=False)
    size = os.path.getsize(t.manifest.sidecar_path(snap.files_ref))
    assert size < 64 * 1024 * 1024  # well under 640 B/file

    # entry_json reconstruction still works for a sampled stub
    tbl = pq.read_table(t.manifest.sidecar_path(snap.files_ref),
                        columns=["entry_json"])
    f = ManifestFile.from_json(json.loads(tbl["entry_json"][0].as_py()))
    assert f.path.endswith(".parquet")


def test_maintenance_probe_bounded_100k(big_manifest_table):
    """maintain()'s fragmentation probe on a sidecar-backed 100k-file
    snapshot must aggregate Spark-side and return ONE number — no entry
    materialization, bounded driver time/memory."""
    t, _ = big_manifest_table
    snap = t.manifest.load(load_files=False)
    assert snap.files_ref is not None
    tracemalloc.start()
    t0 = time.time()
    frag = t._max_files_per_partition(snap)
    elapsed = time.time() - t0
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # every synthetic entry shares partition=None → one partition
    assert frag == N_FILES
    assert elapsed < 30, f"probe took {elapsed:.1f}s"
    # Python-side peak: a scalar came back, not 100k entries (~10 MB)
    assert peak < 2_000_000, f"peak {peak} bytes"
