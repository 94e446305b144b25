#!/usr/bin/env python
"""One-off probe: report Arrow-level type differences between each
registry query's Spark result and its DuckDB oracle, without failing.
Used to calibrate the typed compare in tests/oracle.py so it flags
exactly what the driver's type-sensitive value hash would flag."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    from iceberg_core_spark.registry import all_queries
    from iceberg_core_spark.session import get_spark
    from tests.oracle import duck_connection

    spark = get_spark("probe_arrow_types")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf)
    for i, (name, (fn, sql)) in enumerate(list(all_queries().items())[:n], 1):
        if not sql:
            continue
        try:
            s_tab = fn(spark, sf).toArrow()
            d_tab = con.sql(sql).arrow()
            s_types = {f.name: str(f.type) for f in s_tab.schema}
            d_types = {f.name: str(f.type) for f in d_tab.schema}
            diffs = {
                c: (s_types.get(c), d_types.get(c))
                for c in set(s_types) | set(d_types)
                if s_types.get(c) != d_types.get(c)
            }
            if diffs:
                print(f"{i:3d} {name}: {diffs}", flush=True)
            else:
                print(f"{i:3d} {name}: types identical", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"{i:3d} {name}: ERR {type(ex).__name__}: {str(ex)[:150]}",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
