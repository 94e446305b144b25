"""Registry queries that exercise the native table layer end-to-end
(storage semantics under the driver's DuckDB oracle gate, beyond the
flagship ``entry()`` smoke check).

``table_incremental``: documents are ingested in two commits (a
deterministic 4/5 base, then the 1/5 remainder); the query returns the
snapshot-diff change feed — exactly the second commit's rows. The
oracle is the same split expressed as plain SQL, so the driver verifies
the feed's VALUES, not just its row count. This is the reference's
write→read lifecycle (reference filesystemStorageAdapter_test.go:8-75)
upgraded to incremental consumption.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from iceberg_core_spark.session import load_table

_INC_CACHE: dict[str, str] = {}


def _incremental_root(spark: SparkSession, sf: str) -> str:
    """Build (once per corpus) the two-commit documents table."""
    root = _INC_CACHE.get(sf)
    if root is not None and os.path.isdir(root):
        return root
    from iceberg_core_spark.table import IceTable

    docs = load_table(spark, sf, "documents")
    root = os.path.join(tempfile.mkdtemp(prefix="ice_inc_"), "docs")
    shutil.rmtree(root, ignore_errors=True)
    IceTable.create(
        spark, root, docs.filter("doc_id % 5 != 0"), key_col="doc_id",
    ).append(docs.filter("doc_id % 5 = 0"), dedupe_identical_files=False)
    _INC_CACHE[sf] = root
    return root


def table_incremental(spark: SparkSession, sf: str) -> DataFrame:
    from iceberg_core_spark.table import IceTable

    t = IceTable(spark, _incremental_root(spark, sf))
    first = t.manifest.snapshots(load_files=False)[0].snapshot_id
    return t.scan_incremental(since=first)


TABLE_INCREMENTAL_SQL = """
SELECT * FROM documents WHERE doc_id % 5 = 0
"""


QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "table_incremental": (table_incremental, TABLE_INCREMENTAL_SQL),
}
