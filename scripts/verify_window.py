#!/usr/bin/env python
"""Pre-driver window validation: run the first N registry entries the
way the driver does — Spark query vs DuckDB oracle, value-hash strict —
at the driver's scale factor (sf0.01 by default).

Run:  PYTHONPATH=. python scripts/verify_window.py [N] [sf_dir]

Exits non-zero if any query fails, so it can gate a round's final
commit. The stricter-than-driver compare (exact values, not hashes)
comes from tests/oracle.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from iceberg_core_spark.registry import all_queries
    from iceberg_core_spark.session import get_spark
    from tests.oracle import compare, duck_connection

    spark = get_spark("verify_window")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf)
    fails = []
    for i, (name, (fn, sql)) in enumerate(list(all_queries().items())[:n], 1):
        try:
            df = fn(spark, sf)
            if sql:
                compare(df, con, sql, name)
                print(f"{i:3d} {name}: MATCH", flush=True)
            else:
                print(f"{i:3d} {name}: rows-only {df.count()}", flush=True)
        except Exception as ex:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"{i:3d} {name}: FAIL {type(ex).__name__}: "
                  f"{str(ex)[:200]}", flush=True)
    print(f"failures: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
