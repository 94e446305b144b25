"""Manifest + snapshot metadata for the native table layer.

Design (Iceberg-inspired, minimal):

- ``<root>/_manifest/snapshot-<id>.json`` — immutable snapshot document:
  schema, partition/key columns, operation, parent id, and the FULL list
  of live data files with per-file stats (partition value, key min/max,
  row count, byte size, content hash).
- ``<root>/_manifest/CURRENT`` — single-line pointer to the current
  snapshot id, replaced atomically (write-temp + ``os.replace``).

Optimistic concurrency (multi-writer, lock-free): snapshot ids are
consecutive (``id = parent_id + 1``) and the COMMIT POINT is the
exclusive creation of ``snapshot-<id>.json`` via ``os.link`` of a fully
written temp file — on any POSIX filesystem link(2) fails with EEXIST
if another writer already claimed that id, so at most one child of any
parent ever exists. That is the compare-and-swap: a loser gets
``CommitConflictError`` and must reload the new current snapshot,
rebase its change, and retry (IceTable does this automatically for
appends, whose rebase is trivially safe). The reference serializes all
writes through one BlockManager goroutine (reference blockManager.go:29)
— a single JVM-driver analog would bottleneck a 1000-executor cluster's
concurrent ingest jobs, so the commit protocol is contention-safe
instead. ``CURRENT`` is demoted to a monotonic HINT: readers advance
past it while a successor snapshot file exists, so a writer crashing
between claim and hint update (or a stale hint overwrite racing) never
loses or reorders commits.

File-level min/max pruning replaces the reference's filename-encoded
key ranges (reference block.go:109-115, 143-199). Filenames here carry a
content hash for idempotence/dedup (reference block.go:94-115, R16) but
never statistics — stats live in the manifest, so negative keys and any
orderable type work (the reference's filename scheme broke on negative
int64, block.go:147).

Metadata-as-data: a snapshot whose file list exceeds
``Manifest.inline_max`` entries stores it as a Parquet SIDECAR
(``files-<id>.parquet``) instead of inline JSON — one row per file with
the pruning stats normalized to plainly-orderable types (timestamps →
epoch micros, dates → epoch days) plus the full entry as a JSON string
column. Query-time pruning then runs as a Spark DataFrame predicate
over the sidecar and only the SURVIVING entries are materialized on the
driver (ice_table._pruned_files) — a 1M-file table never parses 1M JSON
entries to answer a point query. Small tables keep inline JSON for
debuggability and zero per-query job latency; the pruning predicate is
identical either way: ``partition == p AND key_max >= lo AND
key_min <= hi``.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
from datetime import date, datetime, timedelta, timezone
from typing import Any

_MANIFEST_DIR = "_manifest"
_CURRENT = "CURRENT"


class CommitConflictError(Exception):
    """Raised when another writer committed a snapshot with the same
    parent first (the exclusive-create claim of ``snapshot-<id>.json``
    found the id taken, or the current id moved past the expected
    parent). Reload the table state, rebase the change, retry."""

_EPOCH_DT = datetime(1970, 1, 1)
_EPOCH_D = date(1970, 1, 1)


def _norm_stat(v: Any) -> Any:
    """Normalize a stat value to a plainly-orderable parquet type for the
    sidecar columns: timestamps → epoch MICROS (int64), dates → epoch
    DAYS (int32-range int) — sidesteps every timestamp-type subtlety in
    the pruning comparison (the same raw-integer trick the nanos read
    path uses). Other types are stored natively."""
    import decimal

    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return (v - _EPOCH_DT) // timedelta(microseconds=1)
    if isinstance(v, date):
        return (v - _EPOCH_D).days
    if isinstance(v, decimal.Decimal):
        # no exactly-orderable plain encoding (strings sort wrong,
        # doubles round) — NULL stat, pruning keeps conservatively
        return None
    return v


def _encode_key(v: Any) -> Any:
    """JSON-encode a key-column stat value, tagging non-JSON types."""
    if isinstance(v, datetime):
        return {"__t": "ts", "v": v.isoformat()}
    if isinstance(v, date):
        return {"__t": "date", "v": v.isoformat()}
    return v


def _decode_key(v: Any) -> Any:
    if isinstance(v, dict) and "__t" in v:
        if v["__t"] == "ts":
            return datetime.fromisoformat(v["v"])
        if v["__t"] == "date":
            return date.fromisoformat(v["v"])
    return v


def _fold_chains(renames: list[dict]) -> dict[str, list[str]]:
    """Fold a snapshot's rename history into alias chains keyed by the
    CURRENT name, prior physical names newest-first: renames are stored
    oldest-first, so a→b then b→c folds to {"c": ["b", "a"]}. Shared by
    the read path (coalesce over retired columns), the pruning path
    (stat lookup under a file's then-physical name), and both commit
    paths' sidecar stat-column derivation."""
    chains: dict[str, list[str]] = {}
    for r in renames:
        chains[r["to"]] = [r["from"]] + chains.pop(r["from"], [])
    return chains


def sidecar_stat_cols(stat_cols: list[str], renames: list[dict]) -> list[str]:
    """The stat-column set a files sidecar must carry: the CURRENT
    stat_cols plus each one's retired aliases (files written before a
    rename keep their min/max under the then-physical name; pruning
    coalesces over the chain). The ONE copy both commit paths call, so
    the driver-side and Spark-side sidecar schemas cannot drift — the
    drift class behind r11 finding 4b. Renames of never-tracked
    columns contribute nothing: their aliases would only add permanent
    all-null smin_/smax_ pairs to every future sidecar."""
    chains = _fold_chains(renames)
    out = list(stat_cols)
    for c in stat_cols:
        out.extend(chains.get(c, []))
    return list(dict.fromkeys(out))


@dataclass
class ManifestFile:
    """Stats for one immutable data file (≈ one reference Block file).

    ``col_stats`` generalizes the key min/max to ANY tracked column
    (Iceberg keeps per-column bounds in its manifests the same way) —
    with z-order clustering this makes range queries prunable on every
    clustered dimension, not just the sort key."""

    path: str  # relative to table root
    partition: Any  # identity-partition value (None for unpartitioned)
    key_min: Any
    key_max: Any
    rows: int
    bytes: int
    content_hash: str  # sha256 of file bytes → idempotent writes (R16)
    col_stats: dict = field(default_factory=dict)  # col → [min, max]
    # Data sequence number (Iceberg v2): the snapshot id that ADDED the
    # file. Consecutive snapshot ids double as sequence numbers, so MoR
    # delete scoping is a single integer compare (seq < delete.seq)
    # instead of a per-predicate path list that grows with file count.
    seq: int = 0

    def overlaps(self, lo: Any, hi: Any) -> bool:
        """Inclusive range-overlap test — true min/max on both bounds."""
        if lo is not None and self.key_max is not None and self.key_max < lo:
            return False
        if hi is not None and self.key_min is not None and self.key_min > hi:
            return False
        return True

    def overlaps_col(self, col: str, lo: Any, hi: Any) -> bool:
        """Overlap test on any stats-tracked column; files without stats
        for the column are conservatively kept."""
        st = self.col_stats.get(col)
        if st is None:
            return True
        mn, mx = st
        if lo is not None and mx is not None and mx < lo:
            return False
        if hi is not None and mn is not None and mn > hi:
            return False
        return True

    def to_json(self) -> dict:
        d = asdict(self)
        d["partition"] = _encode_key(d["partition"])
        d["key_min"] = _encode_key(d["key_min"])
        d["key_max"] = _encode_key(d["key_max"])
        d["col_stats"] = {
            c: [_encode_key(v[0]), _encode_key(v[1])]
            for c, v in self.col_stats.items()
        }
        return d

    @classmethod
    def from_json(cls, d: dict) -> "ManifestFile":
        return cls(
            path=d["path"],
            partition=_decode_key(d["partition"]),
            key_min=_decode_key(d["key_min"]),
            key_max=_decode_key(d["key_max"]),
            rows=d["rows"],
            bytes=d["bytes"],
            content_hash=d["content_hash"],
            col_stats={
                c: (_decode_key(v[0]), _decode_key(v[1]))
                for c, v in d.get("col_stats", {}).items()
            },
            seq=d.get("seq", 0),
        )


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    timestamp_ms: int
    operation: str  # create | append | overwrite | compact | delete(-mor) | upsert
    schema_json: str
    partition_col: str | None
    key_col: str | None
    files: list[ManifestFile] = field(default_factory=list)
    # Merge-on-read deletes (Iceberg v2 predicate-delete analog): each
    # entry {"expr": <SQL boolean>, "seq": <snapshot id of the delete>}
    # hides matching rows of every file whose data sequence number is
    # STRICTLY BELOW seq at scan time — exactly Iceberg's sequence-number
    # rule, O(1) metadata per predicate regardless of file count. Later
    # appends (and compaction rewrites) carry a higher seq and are
    # unaffected. Compaction rewrites the predicates away.
    delete_predicates: list[dict] = field(default_factory=list)
    # Extra columns whose per-file min/max are tracked (beyond key_col),
    # and the clustering strategy ("key" sort or "zorder" on zorder_by).
    stat_cols: list[str] = field(default_factory=list)
    zorder_by: list[str] = field(default_factory=list)
    # Hash-bucket layout (co-located joins): files are written
    # bucketBy(n_buckets, bucket_col) with Spark's bucket-id file
    # naming, so any snapshot can be re-registered as a bucketed
    # catalog table and joined exchange-free (IceTable.as_bucketed_table).
    bucket_col: str | None = None
    n_buckets: int | None = None
    # Streaming exactly-once: (lineage, batch id) of the micro-batch
    # that produced this snapshot, recorded IN the atomic commit.
    # foreachBatch is at-least-once; a replayed batch is recognized by
    # (same lineage, batch_id <= max seen). Batch ids are ONLY
    # comparable within one checkpoint lineage — a fresh checkpoint
    # restarts numbering at 0 over ALL source files, which is
    # reprocessing, not replay, and must append.
    source_batch_id: int | None = None
    source_lineage: str | None = None
    # Partition-spec evolution history (Iceberg's spec evolution
    # adapted to seq scoping): entries {"col": <then partition_col or
    # None>, "until_seq": <first seq written under the NEXT spec>},
    # oldest first. A file's write-time spec is the first entry with
    # file.seq < until_seq (falling through to the current
    # partition_col) — O(1) metadata per spec change, nothing rewrites.
    partition_specs: list = field(default_factory=list)
    # Write-audit-publish staging (Iceberg's WAP / audit-branch
    # pattern adapted to this linear snapshot log): branch name →
    # list of snapshot ids whose appended files are STAGED — present
    # in the chain (audit scans see them via scan(branch=...)) but
    # hidden from every other read until a publish_branch() commit
    # removes the branch from this dict. Hiding is by data sequence
    # number (file.seq ∈ staged ids), the same integer scoping MoR
    # deletes use, so it costs one driver-side set test per file at
    # planning time and nothing at scan time.
    staged: dict = field(default_factory=dict)
    # Column-rename history, oldest first: each entry {"from": old,
    # "to": new}. The name-based analog of Iceberg's field-id rename:
    # a rename is a metadata-only commit, and the read path resolves a
    # renamed column as coalesce(current name, prior names) so files
    # written before the rename (whose physical column is the old name)
    # keep reading correctly. Retired names stay reserved — see
    # IceTable.rename_column / append(evolve_schema=True).
    renames: list[dict] = field(default_factory=list)
    # Set when the file list lives in a Parquet sidecar
    # (``_manifest/files-<id>.parquet`` — a single file when written by
    # the driver, a directory when written by a Spark job) rather than
    # inline JSON; ``files`` is then populated only when loaded with
    # load_files=True. ``files_count`` is the entry count (known without
    # materializing the sidecar).
    files_ref: str | None = None
    files_count: int | None = None

    def to_json(self) -> dict:
        return {
            "snapshot_id": self.snapshot_id,
            "parent_id": self.parent_id,
            "timestamp_ms": self.timestamp_ms,
            "operation": self.operation,
            "schema_json": self.schema_json,
            "partition_col": self.partition_col,
            "key_col": self.key_col,
            "files": [f.to_json() for f in self.files],
            "delete_predicates": self.delete_predicates,
            "stat_cols": self.stat_cols,
            "zorder_by": self.zorder_by,
            "bucket_col": self.bucket_col,
            "n_buckets": self.n_buckets,
            "source_batch_id": self.source_batch_id,
            "source_lineage": self.source_lineage,
            "partition_specs": self.partition_specs,
            "staged": self.staged,
            "renames": self.renames,
        }

    def spec_col_for(self, seq: int) -> Any:
        """Partition column a file with data sequence number ``seq``
        was written under (see ``partition_specs``)."""
        for e in self.partition_specs:
            if seq < e["until_seq"]:
                return e["col"]
        return self.partition_col

    def child(self, operation: str, **overrides) -> "Snapshot":
        """Skeleton for the NEXT snapshot, inheriting every carry-over
        field (schema, layout config, MoR predicates, staged branches,
        rename history, partition-spec history, and the file list BY
        REFERENCE — same files_ref / same inline entries). Metadata-only
        commits (publish, rename, rollback, spec change, MoR delete)
        build on this so no carry-over field can be forgotten; pass
        ``overrides`` for what the operation actually changes."""
        d = dict(
            snapshot_id=self.snapshot_id + 1,
            parent_id=self.snapshot_id,
            timestamp_ms=Manifest.now_ms(),
            operation=operation,
            schema_json=self.schema_json,
            partition_col=self.partition_col,
            key_col=self.key_col,
            files=list(self.files),
            delete_predicates=list(self.delete_predicates),
            stat_cols=list(self.stat_cols),
            zorder_by=list(self.zorder_by),
            bucket_col=self.bucket_col,
            n_buckets=self.n_buckets,
            partition_specs=[dict(e) for e in self.partition_specs],
            staged={b: list(v) for b, v in self.staged.items()},
            renames=list(self.renames),
            files_ref=self.files_ref,
            files_count=self.files_count,
        )
        d.update(overrides)
        if "files" in overrides:
            # An overridden file LIST invalidates the inherited sidecar
            # reference: the caller is declaring a complete new list
            # (drop-branch, add_files), and a silently-inherited
            # files_ref would resurrect the parent's sidecar on the
            # next load_files=True read (r11 review finding 4a). An
            # explicit files_ref/files_count override still wins — the
            # Spark commit path sets all three together.
            if "files_ref" not in overrides:
                d["files_ref"] = None
            if "files_count" not in overrides:
                d["files_count"] = None
        return Snapshot(**d)

    @classmethod
    def from_json(cls, d: dict) -> "Snapshot":
        return cls(
            snapshot_id=d["snapshot_id"],
            parent_id=d["parent_id"],
            timestamp_ms=d["timestamp_ms"],
            operation=d["operation"],
            schema_json=d["schema_json"],
            partition_col=d["partition_col"],
            key_col=d["key_col"],
            files=[ManifestFile.from_json(f) for f in d["files"]],
            delete_predicates=d.get("delete_predicates", []),
            stat_cols=d.get("stat_cols", []),
            zorder_by=d.get("zorder_by", []),
            bucket_col=d.get("bucket_col"),
            n_buckets=d.get("n_buckets"),
            source_batch_id=d.get("source_batch_id"),
            source_lineage=d.get("source_lineage"),
            partition_specs=d.get("partition_specs", []),
            staged=d.get("staged", {}),
            renames=d.get("renames", []),
            files_ref=d.get("files_ref"),
            files_count=d.get("files_count"),
        )


class Manifest:
    """Reads/writes snapshot documents under ``<root>/_manifest``."""

    # File lists longer than this go to a Parquet sidecar; tests lower
    # it to exercise the sidecar path on small tables.
    inline_max = 512

    def __init__(self, root: str):
        self.root = root
        self.dir = os.path.join(root, _MANIFEST_DIR)

    # -- read side ---------------------------------------------------
    def current_snapshot_id(self) -> int | None:
        """Current id = the CURRENT hint advanced past any committed
        successors. Snapshot ids are consecutive, so the loop usually
        costs a single stat() miss; it only walks when a writer crashed
        between claim and hint update or a stale hint write raced."""
        try:
            with open(os.path.join(self.dir, _CURRENT)) as f:
                cur = int(f.read().strip())
        except (FileNotFoundError, ValueError):
            # a writer can die between the snapshot-0 link and the
            # FIRST hint write (missing CURRENT), or mid-hint-write
            # on a filesystem without atomic replace semantics
            # (corrupt CURRENT) — either way the hint is gone but the
            # table may EXIST. Recover from the directory listing, NOT
            # from snapshot-0 alone: expire_snapshots(keep_last=1)
            # deletes the bootstrap document, so a post-expiry table
            # that loses its hint (crash, partial directory copy)
            # would otherwise read as absent — hiding committed data
            # and letting a re-create claim the freed snapshot-0 id
            # and fork the table's id space (r15 review).
            ids = self.snapshot_ids()
            if not ids:
                return None
            cur = max(ids)
        while os.path.exists(os.path.join(self.dir, f"snapshot-{cur + 1}.json")):
            cur += 1
        return cur

    def load(self, snapshot_id: int | None = None,
             load_files: bool = True) -> Snapshot:
        """``load_files=False`` skips materializing a sidecar-backed file
        list (``snap.files`` stays empty) — the pruned-query path reads
        the sidecar with a DataFrame predicate instead."""
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id()
        if sid is None:
            raise FileNotFoundError(f"no current snapshot in {self.dir}")
        with open(os.path.join(self.dir, f"snapshot-{sid}.json")) as f:
            snap = Snapshot.from_json(json.load(f))
        if load_files and snap.files_ref:
            snap.files = self._read_files_sidecar(snap.files_ref)
        return snap

    def snapshot_ids(self, newest_first: bool = False) -> list[int]:
        """Snapshot ids from the directory listing alone — no JSON
        parsed. The one place that knows the on-disk naming."""
        if not os.path.isdir(self.dir):
            return []
        ids = [
            int(n[len("snapshot-"):-len(".json")])
            for n in os.listdir(self.dir)
            if n.startswith("snapshot-") and n.endswith(".json")
        ]
        ids.sort(reverse=newest_first)
        return ids

    def snapshots(self, load_files: bool = True) -> list[Snapshot]:
        out = []
        if not os.path.isdir(self.dir):
            return out
        for name in sorted(os.listdir(self.dir)):
            if name.startswith("snapshot-") and name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    snap = Snapshot.from_json(json.load(f))
                if load_files and snap.files_ref:
                    snap.files = self._read_files_sidecar(snap.files_ref)
                out.append(snap)
        out.sort(key=lambda s: s.snapshot_id)
        return out

    def sidecar_path(self, files_ref: str) -> str:
        return os.path.join(self.dir, files_ref)

    def _sidecar_columns(self, files_ref: str,
                         columns: list[str]) -> list[list]:
        """Column-projected sidecar read with the seq None->0
        normalization — the ONE copy of the pattern both read paths
        share, so a layout/seq-semantics change cannot drift the
        scan path from the incremental-feed path."""
        import pyarrow.parquet as pq

        tbl = pq.read_table(self.sidecar_path(files_ref),
                            columns=columns)
        out = [tbl[c].to_pylist() for c in columns]
        if "seq" in columns:
            i = columns.index("seq")
            out[i] = [s if s is not None else 0 for s in out[i]]
        return out

    def _read_files_sidecar(self, files_ref: str) -> list[ManifestFile]:
        entries, seqs = self._sidecar_columns(
            files_ref, ["entry_json", "seq"])
        out = []
        for s, seq in zip(entries, seqs):
            f = ManifestFile.from_json(json.loads(s))
            # seq lives in its own column (a Spark-side rebase retargets
            # it with one lit(), never rewriting entry_json strings)
            f.seq = seq
            out.append(f)
        return out

    def snapshot_total_bytes(self, snap: "Snapshot") -> int:
        """Total data bytes of a snapshot WITHOUT materializing
        ManifestFile entries: sidecar-backed snapshots column-project
        the ``bytes`` column (no entry_json JSON parse — a 1M-file
        recovery path must not deserialize the whole manifest on the
        driver just to sum one column); inline snapshots sum their
        (≤ inline_max) entries directly."""
        if snap.files_ref and not snap.files:
            (vals,) = self._sidecar_columns(snap.files_ref, ["bytes"])
            return sum(v or 0 for v in vals)
        return sum(f.bytes for f in snap.files)

    def read_sidecar_path_seq(self, files_ref: str) -> list[tuple[str, int]]:
        """(path, seq) pairs of a sidecar WITHOUT parsing entry_json —
        for consumers that only need to locate files and scope MoR
        predicates (full scans, incremental feeds): column-projected
        pyarrow read, no JSON parse, no Spark job."""
        paths, seqs = self._sidecar_columns(files_ref, ["path", "seq"])
        return list(zip(paths, seqs))

    def _write_files_sidecar(self, fs: list[ManifestFile],
                             stat_cols: list[str], files_ref: str) -> None:
        """One row per file: normalized orderable pruning stats + the
        full entry as JSON (survivors of a pruning predicate are
        reconstructed from entry_json alone; ``seq`` rides in its own
        column)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        def col(vals):
            if all(v is None for v in vals):
                return pa.array(vals, type=pa.int64())
            return pa.array(vals)

        data = {
            "path": pa.array([f.path for f in fs], type=pa.string()),
            "partition_n": col([_norm_stat(f.partition) for f in fs]),
            "key_min_n": col([_norm_stat(f.key_min) for f in fs]),
            "key_max_n": col([_norm_stat(f.key_max) for f in fs]),
            "rows": pa.array([f.rows for f in fs], type=pa.int64()),
            "bytes": pa.array([f.bytes for f in fs], type=pa.int64()),
        }
        for c in stat_cols:
            data[f"smin_{c}"] = col(
                [_norm_stat(f.col_stats.get(c, (None, None))[0]) for f in fs]
            )
            data[f"smax_{c}"] = col(
                [_norm_stat(f.col_stats.get(c, (None, None))[1]) for f in fs]
            )
        data["entry_json"] = pa.array(
            [json.dumps(f.to_json()) for f in fs], type=pa.string()
        )
        data["seq"] = pa.array([f.seq for f in fs], type=pa.int64())
        tmp = self.sidecar_path(files_ref) + ".tmp"
        pq.write_table(pa.table(data), tmp)
        os.replace(tmp, self.sidecar_path(files_ref))

    def remove_sidecar(self, files_ref: str) -> None:
        """Delete a sidecar — single parquet file (driver-written) or
        directory (Spark-job-written)."""
        import shutil

        p = self.sidecar_path(files_ref)
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        elif os.path.exists(p):
            os.remove(p)

    # -- write side (commit point = exclusive snapshot-file claim) ---
    def commit(self, snapshot: Snapshot) -> None:
        """Atomically publish ``snapshot`` as the child of its
        ``parent_id``. Raises :class:`CommitConflictError` if another
        writer already claimed that child id — the snapshot document is
        fully written to a temp file first, then ``os.link`` both
        validates the claim and makes the complete document visible in
        one atomic step (readers never observe a partial file)."""
        os.makedirs(self.dir, exist_ok=True)
        expected = 0 if snapshot.parent_id is None else snapshot.parent_id + 1
        if snapshot.snapshot_id != expected:
            raise ValueError(
                f"snapshot_id {snapshot.snapshot_id} must be parent+1 "
                f"({expected}) for the commit claim to serialize writers"
            )
        # don't serialize a large file list inline just to overwrite
        # it with [] on the sidecar branches — to_json's per-entry
        # deep-copy/encode would double the commit CPU and peak
        # memory of a 100k-file driver-side commit
        spills = (len(snapshot.files) > self.inline_max
                  or (snapshot.files_ref is not None
                      and not snapshot.files))
        if spills:
            stash, snapshot.files = snapshot.files, []
            try:
                doc = snapshot.to_json()
            finally:
                snapshot.files = stash
        else:
            doc = snapshot.to_json()
        sidecar_ref = None
        if snapshot.files_ref is not None and not snapshot.files:
            # sidecar was built externally (by a Spark job over the file
            # entries — the 1M-file commit path); reference it as-is
            doc["files"] = []
            doc["files_ref"] = snapshot.files_ref
            doc["files_count"] = snapshot.files_count
        elif len(snapshot.files) > self.inline_max:
            # token keeps racing writers' sidecars from clobbering each
            # other before the claim decides the winner
            sidecar_ref = (
                f"files-{snapshot.snapshot_id}-{os.urandom(4).hex()}.parquet"
            )
            # Retired alias names included via the shared derivation:
            # a sidecar written with only the CURRENT stat_cols would
            # silently drop pre-rename files' min/max columns and cost
            # them file-level pruning (r11 review finding 4b).
            self._write_files_sidecar(
                snapshot.files,
                sidecar_stat_cols(snapshot.stat_cols, snapshot.renames),
                sidecar_ref)
            snapshot.files_ref = sidecar_ref
            snapshot.files_count = len(snapshot.files)
            doc["files"] = []
            doc["files_ref"] = sidecar_ref
            doc["files_count"] = len(snapshot.files)
        snap_path = os.path.join(self.dir, f"snapshot-{snapshot.snapshot_id}.json")
        tmp = snap_path + f".tmp-{os.urandom(4).hex()}"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1)
        try:
            os.link(tmp, snap_path)  # the CAS: EEXIST ⇒ we lost the race
        except FileExistsError:
            if sidecar_ref is not None:
                self.remove_sidecar(sidecar_ref)
                snapshot.files_ref = None
                snapshot.files_count = None
            raise CommitConflictError(
                f"snapshot {snapshot.snapshot_id} already committed by "
                f"another writer (parent {snapshot.parent_id})"
            ) from None
        finally:
            os.remove(tmp)
        # CURRENT is a monotonic best-effort HINT; never move it
        # backwards over a racing writer's newer value, and never let
        # a hint failure mask the commit: the os.link claim above
        # already made the snapshot durable, so an error past this
        # point (ENOSPC creating the tmp, a corrupt hint failing to
        # parse) must NOT make a committed append look failed — the
        # caller would retry and append the same rows again. Readers
        # recover from a stale/missing hint via the walk-forward.
        try:
            try:
                with open(os.path.join(self.dir, _CURRENT)) as f:
                    if int(f.read().strip()) >= snapshot.snapshot_id:
                        return
            except (FileNotFoundError, ValueError):
                pass
            cur_tmp = os.path.join(
                self.dir, _CURRENT + f".tmp-{os.urandom(4).hex()}")
            with open(cur_tmp, "w") as f:
                f.write(str(snapshot.snapshot_id))
            os.replace(cur_tmp, os.path.join(self.dir, _CURRENT))
        except OSError:
            pass

    def next_snapshot_id(self) -> int:
        cur = self.current_snapshot_id()
        return 0 if cur is None else cur + 1

    @staticmethod
    def now_ms() -> int:
        return int(time.time() * 1000)
