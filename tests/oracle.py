"""Driver-style oracle comparison: run a Spark DataFrame and a DuckDB SQL
side by side, compare row count + column names + order-insensitive values.
Stricter than the driver: exact value equality (we engineer determinism)."""

import datetime
import math

import duckdb

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


def compare(spark_df, con, sql: str, name: str = "?"):
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
