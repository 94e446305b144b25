"""Oracle parity for the extended relational + UDF-family queries."""

import pytest

from iceberg_core_spark.functions.sampling import QUERIES as SAMPLING
from iceberg_core_spark.operators.bucketed import QUERIES as BUCKETED
from iceberg_core_spark.operators.relational_ext import QUERIES as RELX
from iceberg_core_spark.operators.udfs import QUERIES as UDF
from tests.oracle import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"

ALL = {**RELX, **UDF, **BUCKETED, **SAMPLING}


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_DIR)
    yield c
    c.close()


CASES = [(n, fn, sql) for n, (fn, sql) in ALL.items() if sql]


@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_ext_oracle_match(spark, con, name, fn, sql):
    compare(fn(spark, SF_DIR), con, sql, name)


from iceberg_core_spark.operators.tpch import QUERIES as TPCH

TPCH_CASES = [(n, fn, sql) for n, (fn, sql) in TPCH.items() if sql]


@pytest.mark.parametrize("name,fn,sql", TPCH_CASES,
                         ids=[c[0] for c in TPCH_CASES])
def test_tpch_oracle_match(spark, con, name, fn, sql):
    df = fn(spark, SF_DIR)
    assert df.count() > 0, f"{name} degenerate (0 rows)"
    compare(df, con, sql, name)


from iceberg_core_spark.sources.avro_ocf import QUERIES as AVRO
from iceberg_core_spark.streaming.stateful import QUERIES as STATEFUL

R3_CASES = [(n, fn, sql) for n, (fn, sql) in {**AVRO, **STATEFUL}.items()
            if sql]


@pytest.mark.parametrize("name,fn,sql", R3_CASES,
                         ids=[c[0] for c in R3_CASES])
def test_r3_source_oracle_match(spark, con, name, fn, sql):
    """Round-3 registered sources: OCF ingest roundtrip + stateful
    streaming stats, driver-style oracle compare."""
    compare(fn(spark, SF_DIR), con, sql, name)
