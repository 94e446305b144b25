#!/usr/bin/env python
"""r10 VERDICT task 5 — measure before changing crash-discipline
code: ``SnapshotSyncedStore._write_increment`` runs one count() job
plus one write per kind (4 for FuzzyIndex / 3 for AdmissionIndex),
each re-deriving the increment scan. Would persisting the increment
frame (with explicit unpersist) actually cut multi-snapshot sync
wall-clock, or is the increment scan cheap enough that persist
overhead washes out?

Builds one table with K appended snapshots, syncs a FuzzyIndex twice
(fresh roots): once with the stock _write_increment (which persists
the increment since r11 — this script's cold-cache measurement is
why), once with a no-persist variant that re-derives the increment
per action (the pre-r11 behavior). Prints one JSON line; run on an
otherwise idle host. Result that drove the change: cold-cache
8-snapshot sync 23.1 s (no persist) -> 18.8 s (persist); warm-cache
parity (~18 s both) — and production remote storage is always cold.

Usage: PYTHONPATH=. python scripts/measure_sync_persist.py \
    [n_docs_per_snap] [n_snaps] [order: nopersist_first|persist_first]
(run BOTH orders — the second variant rides a warmer page cache)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_per = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_snaps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from pyspark.sql import functions as F

    from iceberg_core_spark.functions.fuzzy_index import FuzzyIndex
    from iceberg_core_spark.session import get_spark
    from iceberg_core_spark.table import IceTable

    spark = get_spark("measure-sync-persist")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    def doc_frame(lo: int, hi: int):
        return (
            spark.range(lo, hi, 1, par)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.sha2(F.col("id").cast("string"), 256),
                    F.expr("substring('abcdefghijklmnop', 1, "
                           "cast(id % 17 as int))"),
                ).alias("text"),
            )
        )

    class NoPersistFuzzyIndex(FuzzyIndex):
        # the pre-r11 behavior: every action re-derives the increment
        def _write_increment(self, rows, snapshot_id):
            n = rows.count()
            parts = max(1, -(-n // self._ROWS_PER_FILE))
            sub = f"snap={snapshot_id}"
            for kind, frame in self._frames(rows).items():
                frame.coalesce(parts).write.mode("overwrite").parquet(
                    os.path.join(self._kind_dir(kind), sub))

    base = tempfile.mkdtemp(prefix="ice_sync_persist_")
    out = {"n_docs_per_snap": n_per, "n_snaps": n_snaps}
    try:
        t = IceTable.create(spark, os.path.join(base, "corpus"),
                            doc_frame(0, n_per),
                            partition_col=None, key_col="doc_id")
        for i in range(1, n_snaps):
            t.append(doc_frame(i * n_per, (i + 1) * n_per))
        variants = [("nopersist", NoPersistFuzzyIndex),
                    ("persist", FuzzyIndex)]
        if len(sys.argv) > 3 and sys.argv[3] == "persist_first":
            variants.reverse()
        for tag, cls in variants:
            idx = cls(spark, os.path.join(base, f"idx_{tag}"))
            t0 = time.perf_counter()
            n = idx.sync(t)
            out[f"sync_{tag}_sec"] = round(time.perf_counter() - t0, 2)
            out[f"sync_{tag}_snaps"] = n
        out["speedup"] = round(
            out["sync_nopersist_sec"] / out["sync_persist_sec"], 3)
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
