#!/usr/bin/env python
"""Snapshot (or verify) canonical output hashes of named registry
queries — the result-identity proof for r15 optimization rewrites.

For each query: run at the given sf dirs, collect rows, normalize
(NaN/ts), sort order-insensitively, and md5 the repr together with the
sorted column names and value classes. Write to (or compare against) a
JSON file.

Usage:
  python scripts/snapshot_outputs_r15.py write  /tmp/snap.json q1,q2 [sfdirs]
  python scripts/snapshot_outputs_r15.py verify /tmp/snap.json q1,q2 [sfdirs]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

DEFAULT_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"]


def main() -> None:
    mode, path, qlist = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    sfs = sys.argv[4].split(",") if len(sys.argv) > 4 else DEFAULT_SFS

    from oracle import _norm, _sort_key, _spark_class  # tests/oracle.py

    from iceberg_core_spark import get_spark
    from iceberg_core_spark.registry import all_queries

    spark = get_spark("snapshot-r15")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    out: dict[str, str] = {}
    for name in qlist:
        fn, _sql = queries[name]
        for sf in sfs:
            df = fn(spark, sf)
            cols = sorted(df.columns)
            classes = [_spark_class(df.schema[c].dataType) for c in cols]
            rows = [tuple(_norm(r[c]) for c in cols) for r in df.collect()]
            rows.sort(key=_sort_key)
            h = hashlib.md5()
            h.update(repr(cols).encode())
            h.update(repr(classes).encode())
            for r in rows:
                h.update(repr(r).encode())
            key = f"{name}@{os.path.basename(sf.rstrip('/'))}"
            out[key] = f"{len(rows)}:{h.hexdigest()}"
            print(f"{key} = {out[key]}")

    if mode == "write":
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {path}")
    else:
        with open(path) as f:
            ref = json.load(f)
        bad = {k: (ref.get(k), v) for k, v in out.items()
               if ref.get(k) != v}
        if bad:
            print(f"MISMATCH: {bad}")
            sys.exit(1)
        print("all match")


if __name__ == "__main__":
    main()
