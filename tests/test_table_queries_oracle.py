"""Oracle checks for the table-layer registry queries."""

import pytest

from iceberg_core_spark.operators.table_queries import QUERIES
from tests.oracle import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"

ORACLE_CASES = [(n, fn, sql) for n, (fn, sql) in QUERIES.items() if sql]


@pytest.fixture(scope="module")
def con():
    return duck_connection(SF_DIR)


@pytest.mark.parametrize("name,fn,sql", ORACLE_CASES,
                         ids=[c[0] for c in ORACLE_CASES])
def test_table_query_matches_oracle(spark, con, name, fn, sql):
    compare(fn(spark, SF_DIR), con, sql, name)


def test_zorder_range_scan_prunes_files(spark):
    """The registered z-order query must actually PRUNE: a narrow
    range on the non-key dimension reads a strict subset of the
    table's files (manifest min/max stats on the Morton-clustered
    n_chars column), like test_manifest_pruning's ≤N-of-M gate."""
    from iceberg_core_spark.operators.table_queries import _zorder_root
    from iceberg_core_spark.table import IceTable

    t = IceTable(spark, _zorder_root(spark, SF_DIR))
    total = t.file_count()
    assert total >= 4  # multi-file, else pruning is vacuous
    narrow = t.range_scan({"n_chars": (150, 200)})
    assert len(narrow.inputFiles()) < total
    # and the pruned scan is still exact vs the full-scan filter
    full = t.scan().filter("n_chars BETWEEN 150 AND 200")
    assert sorted(r.doc_id for r in narrow.collect()) == \
        sorted(r.doc_id for r in full.collect())
