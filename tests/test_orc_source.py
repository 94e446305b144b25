"""ORC source: lossless parquet -> ORC -> DataFrame round trip (the
DuckDB oracle IS the parquet original), schema fidelity, and pushdown
reaching the ORC scan."""

import pytest

from iceberg_core_spark.sources.orc_format import (
    QUERIES,
    SCAN_ORC_SQL,
    _stage,
    read_orc_corpus,
    scan_orc,
)
from tests.oracle import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_DIR)
    yield c
    c.close()


def test_scan_orc_roundtrip_oracle(spark, con):
    fn, sql = QUERIES["scan_orc"]
    compare(fn(spark, SF_DIR), con, sql, "scan_orc")


def test_orc_schema_matches_parquet_original(spark):
    from iceberg_core_spark.session import load_table

    orc = scan_orc(spark, SF_DIR)
    pq = load_table(spark, SF_DIR, "documents") \
        .select(*orc.columns)
    assert orc.schema == pq.schema


def test_orc_filter_pushdown_reaches_scan(spark):
    df = read_orc_corpus(spark, _stage(spark, SF_DIR)) \
        .filter("n_chars > 100").select("doc_id", "lang")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # predicate pushed into the ORC scan + column-pruned read schema
    assert "PushedFilters: [" in plan and "n_chars" in plan.split(
        "PushedFilters:")[1][:120]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema
