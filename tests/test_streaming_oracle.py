"""Streaming-surface declared queries vs DuckDB oracles at sf0.001."""

import pytest

from iceberg_core_spark.streaming.queries import QUERIES
from tests.oracle import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_DIR)
    yield c
    c.close()


CASES = [(n, fn, sql) for n, (fn, sql) in QUERIES.items() if sql]


@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_streaming_oracle_match(spark, con, name, fn, sql):
    compare(fn(spark, SF_DIR), con, sql, name)
