#!/usr/bin/env python
"""Isolated clean-host re-anchor for admission_index (r13 verdict's one
`weak` row: 3.50 s driver sample = 2.07x its 1.69 anchor) and
dedup_incremental (1.76x in the same driver run) — the discipline that
closed dedup_incremental in r12 and corpus_fuzzy_admission in r13: prep
the bench layout + the persisted AdmissionIndex OUTSIDE measurement,
then time 1 cold + 8 warm runs of each registered query at sf0.1 and
report the warm median vs the pinned anchors. Also anchors the new
bench host-mode sentinel (fixed-size pure-JVM compute) on the same
idle host.

Run on an idle host (1-min load < 1):
  PYTHONPATH=/root/repo python scripts/reanchor_r14.py
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["admission_index", "dedup_incremental"]
ANCHORS = {"admission_index": 1.69, "dedup_incremental": 2.42}
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    with open("/proc/loadavg") as f:
        load1 = float(f.read().split()[0])
    print(f"host 1-min load at start: {load1}")

    from bench import _prep_layout

    from iceberg_core_spark import get_spark
    from iceberg_core_spark.registry import all_queries

    spark = get_spark("r14-reanchor")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    sf_dir, prep_sec = _prep_layout(spark, SF_DIR)
    t0 = time.perf_counter()
    from iceberg_core_spark.functions.dedup_incremental import (
        _admission_index_root,
    )

    _admission_index_root(spark, sf_dir)
    prep_sec += round(time.perf_counter() - t0, 3)
    print(f"prep_sec: {prep_sec}")

    # the bench's host-mode sentinel, anchored on the same idle host
    def sentinel() -> float:
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 64).selectExpr(
            "sum(id * 2 + 1) as s"
        ).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    sent = [sentinel() for _ in range(9)]
    print(f"sentinel: cold {sent[0]}  warm {sent[1:]}  "
          f"warm-median {statistics.median(sent[1:]):.3f}")

    for name in QUERIES:
        fn = queries[name][0]
        times = []
        for _i in range(9):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        cold, warm = times[0], times[1:]
        wm = statistics.median(warm)
        print(f"{name}: cold {cold}  warm {warm}  "
              f"warm-median {wm:.3f}  "
              f"vs anchor {ANCHORS[name]} = {wm / ANCHORS[name]:.2f}x")

    with open("/proc/loadavg") as f:
        print("host 1-min load at end:", f.read().split()[0])


if __name__ == "__main__":
    main()
