"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``    — flagship: ingest sf0.001 events into the native
                      IceTable layer (partitioned on user_id, clustered
                      on ts) and run the reference-shaped range query
                      (reference storageAdapter.go:4 Query(part, lo, hi)).
``queries()``       — every declared operator from SURVEY.md §2.B.
``oracle_sql()``    — matching DuckDB ANSI SQL (omitted for ops whose
                      values are engine-specific, e.g. HLL sketches —
                      driver records rows-only).
"""

from __future__ import annotations

import datetime
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the package importable when the driver runs this file from /root/repo.
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: streaming-store write → manifest-pruned range query."""
    from iceberg_core_spark.session import load_table
    from iceberg_core_spark.table import IceTable

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    root = os.path.join(tempfile.mkdtemp(prefix="ice_entry_"), "events_table")
    shutil.rmtree(root, ignore_errors=True)
    table = IceTable.create(
        spark, root, events, partition_col="user_id", key_col="ts",
        max_rows_per_file=4096,
    )
    return table.query(
        partition=7,
        lo=datetime.datetime(2024, 1, 5),
        hi=datetime.datetime(2024, 1, 25),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from iceberg_core_spark.registry import all_queries

    return {name: fn for name, (fn, _sql) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from iceberg_core_spark.registry import all_queries

    return {
        name: sql for name, (fn, sql) in all_queries().items() if sql is not None
    }
