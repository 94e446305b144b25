"""Every declared relational operator hash-matches its DuckDB oracle at
sf0.001 (the driver repeats this at sf0.01)."""

import pytest

from iceberg_core_spark.operators.relational import QUERIES
from tests.oracle import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_DIR)
    yield c
    c.close()


ORACLE_CASES = [(n, fn, sql) for n, (fn, sql) in QUERIES.items() if sql]
ROWS_ONLY_CASES = [(n, fn) for n, (fn, sql) in QUERIES.items() if not sql]


@pytest.mark.parametrize("name,fn,sql", ORACLE_CASES,
                         ids=[c[0] for c in ORACLE_CASES])
def test_oracle_match(spark, con, name, fn, sql):
    compare(fn(spark, SF_DIR), con, sql, name)


@pytest.mark.parametrize("name,fn", ROWS_ONLY_CASES,
                         ids=[c[0] for c in ROWS_ONLY_CASES])
def test_rows_only_runs(spark, name, fn):
    df = fn(spark, SF_DIR)
    assert df.count() >= 0 and len(df.columns) > 0
