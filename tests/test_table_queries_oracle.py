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
