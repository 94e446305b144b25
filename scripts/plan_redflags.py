#!/usr/bin/env python
"""Red-flag sweep over EVERY registry query's physical plan (r15
optimization round): for each declared query, build the DataFrame and
grep its formatted plan for scale anti-patterns —

- BatchEvalPython / ArrowEvalPython / PythonMapInArrow nodes (the
  Python boundary; expected only where an operator is documented to
  use Arrow) and duplicated UDF evaluation (two eval nodes for one fn)
- CartesianProduct / BroadcastNestedLoopJoin
- Exchange count (for eyeballing: more than expected => look closer)
- scans with no PushedFilters where the query filters the table

Prints one line per query: name, n_exchanges, joins, python nodes,
flags. Uses sf0.01 by default (plan shape only — fast side-builds).

Usage: python scripts/plan_redflags.py [sf_dir] [only,names]
"""

from __future__ import annotations

import os
import re
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    from iceberg_core_spark import get_spark
    from iceberg_core_spark.registry import all_queries

    spark = get_spark("plan-redflags-r15")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")

    rows = []
    for name, (fn, _sql) in all_queries().items():
        if only is not None and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            text = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # streaming frames etc.
            rows.append((name, f"SKIP: {type(e).__name__}: {e}"))
            if "--trace" in sys.argv:
                traceback.print_exc()
            continue
        n_ex = len(re.findall(r"\bExchange\b", text))
        joins = sorted(set(re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)", text)))
        py = sorted(set(re.findall(
            r"(BatchEvalPython|ArrowEvalPython|MapInPandas|"
            r"PythonMapInArrow|FlatMapGroupsInPandas)", text)))
        flags = []
        if "CartesianProduct" in text:
            flags.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in text:
            flags.append("BNLJ")
        if text.count("BatchEvalPython") > 0:
            flags.append("ROW_UDF")
        rows.append((name, f"ex={n_ex:2d} joins={','.join(joins) or '-'} "
                           f"py={','.join(py) or '-'} "
                           f"{' '.join(flags)}"))
    width = max(len(n) for n, _ in rows)
    for name, desc in rows:
        print(f"{name:<{width}}  {desc}")


if __name__ == "__main__":
    main()
