#!/usr/bin/env python
"""Isolated clean-host re-anchor for corpus_fuzzy_admission (r12
verdict task 2 — the same discipline that closed dedup_incremental's
watch item in r12): prep the bench layout + persisted FuzzyIndex
OUTSIDE measurement, then time 1 cold + 8 warm runs of the registered
query at sf0.1 and report the warm median vs the pinned anchor.

Run on an idle host (1-min load < 1):
  PYTHONPATH=/root/repo python scripts/reanchor_fuzzy_admission.py
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERY = "corpus_fuzzy_admission"
TWIN = "admission_index"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    with open("/proc/loadavg") as f:
        load1 = float(f.read().split()[0])
    print(f"host 1-min load at start: {load1}")

    from bench import _prep_layout

    from iceberg_core_spark import get_spark
    from iceberg_core_spark.registry import all_queries

    spark = get_spark("fuzzy-admission-reanchor")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    sf_dir, prep_sec = _prep_layout(spark, SF_DIR)
    t0 = time.perf_counter()
    from iceberg_core_spark.functions.fuzzy_index import _fuzzy_index_root

    _fuzzy_index_root(spark, sf_dir)
    from iceberg_core_spark.functions.dedup_incremental import (
        _admission_index_root,
    )

    _admission_index_root(spark, sf_dir)  # the twin's index, same prep
    prep_sec += round(time.perf_counter() - t0, 3)
    print(f"prep_sec: {prep_sec}")

    for name in (QUERY, TWIN):
        fn = queries[name][0]
        times = []
        for i in range(9):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        cold, warm = times[0], times[1:]
        print(f"{name}: cold {cold}  warm {warm}  "
              f"warm-median {statistics.median(warm):.3f}")

    with open("/proc/loadavg") as f:
        print("host 1-min load at end:", f.read().split()[0])


if __name__ == "__main__":
    main()
