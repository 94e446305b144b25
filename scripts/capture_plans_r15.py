#!/usr/bin/env python
"""Capture .explain("formatted") output for bench HEADLINE queries into
plans/r15/<query>_<tag>.txt (tag = before/after). Uses the SAME prepped
layout bench.py times against, so the captured plans are the plans the
bench measures. Optionally restrict to a comma-separated query list.

Usage: python scripts/capture_plans_r15.py <tag> [q1,q2,...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, _prep_layout  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    from iceberg_core_spark import get_spark
    from iceberg_core_spark.registry import all_queries

    spark = get_spark("plan-capture-r15")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_dir, _ = _prep_layout(spark, sf_dir)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    names = sorted(only) if only is not None else HEADLINE
    for name in names:
        fn, _sql = queries[name]
        df = fn(spark, sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
