"""Driver-style oracle comparison: run a Spark DataFrame and a DuckDB SQL
side by side, compare row count + column names + order-insensitive values.
Stricter than the driver: exact value equality (we engineer determinism)."""

import datetime
import math

import duckdb
import pyarrow as pa
from pyspark.sql import types as T

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    return v


def _sort_key(t):
    return tuple((x is None, str(type(x)), str(x)) for x in t)


def _spark_class(dt) -> str:
    """Canonical value-class of a Spark type, at the granularity the
    driver's type-sensitive value hash distinguishes (calibrated r6:
    int32↔int64 and tz-aware↔naive timestamps hash alike on green rows,
    but DuckDB HUGEINT → decimal128 red-rowed tpch_q12, so integer vs
    decimal vs float must differ)."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType):
        return f"array<{_spark_class(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return (f"map<{_spark_class(dt.keyType)},"
                f"{_spark_class(dt.valueType)}>")
    if isinstance(dt, T.StructType):
        inner = ",".join(_spark_class(f.dataType) for f in dt.fields)
        return f"struct<{inner}>"
    return dt.simpleString()


def _arrow_class(at) -> str:
    """Canonical value-class of an Arrow type (DuckDB oracle side)."""
    if pa.types.is_integer(at):
        return "int"
    if pa.types.is_floating(at):
        return "float"
    if pa.types.is_decimal(at):
        return "decimal"
    if pa.types.is_timestamp(at):
        return "timestamp"
    if pa.types.is_date(at):
        return "date"
    if pa.types.is_string(at) or pa.types.is_large_string(at):
        return "string"
    if pa.types.is_boolean(at):
        return "bool"
    if pa.types.is_binary(at) or pa.types.is_large_binary(at):
        return "binary"
    if pa.types.is_list(at) or pa.types.is_large_list(at):
        return f"array<{_arrow_class(at.value_type)}>"
    if pa.types.is_map(at):
        return (f"map<{_arrow_class(at.key_type)},"
                f"{_arrow_class(at.item_type)}>")
    if pa.types.is_struct(at):
        inner = ",".join(_arrow_class(f.type) for f in at)
        return f"struct<{inner}>"
    return str(at)


def check_types(spark_df, con, sql: str, name: str = "?"):
    """Typed pre-driver gate: the driver's value hash distinguishes
    value classes (e.g. DuckDB HUGEINT arrives as Decimal, Spark bigint
    as int — identical values, different hash). Compare the Spark
    schema against the oracle's Arrow schema at that granularity so
    such mismatches fail BEFORE a driver round burns a row. Cheap: the
    Spark side reads df.schema (no job); the oracle runs once."""
    d_schema = con.sql(sql).arrow().schema
    d_cls = {f.name: _arrow_class(f.type) for f in d_schema}
    s_cls = {f.name: _spark_class(f.dataType) for f in spark_df.schema.fields}
    diffs = {
        c: (s_cls.get(c), d_cls.get(c))
        for c in set(s_cls) | set(d_cls)
        if s_cls.get(c) != d_cls.get(c)
    }
    assert not diffs, (
        f"{name}: value-class mismatch spark-vs-oracle {diffs} — the "
        f"driver's type-sensitive hash would red-row this; cast the "
        f"oracle (or query) so both sides agree"
    )


def compare(spark_df, con, sql: str, name: str = "?"):
    check_types(spark_df, con, sql, name)
    duck = con.sql(sql)
    duck_cols = [d[0] for d in duck.description]
    spark_cols = spark_df.columns
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    order = sorted(duck_cols)
    s_rows = [
        tuple(_norm(r[c]) for c in order) for r in spark_df.collect()
    ]
    idx = [duck_cols.index(c) for c in order]
    d_rows = [tuple(_norm(r[i]) for i in idx) for r in duck.fetchall()]
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_rows.sort(key=_sort_key)
    d_rows.sort(key=_sort_key)
    bad = [
        (i, s, d) for i, (s, d) in enumerate(zip(s_rows, d_rows)) if s != d
    ]
    assert not bad, f"{name}: {len(bad)} value mismatches, first: {bad[:3]}"
