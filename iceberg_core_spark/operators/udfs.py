"""UDF / UDAF / UDTF surface (SURVEY.md §2.B "UDF/UDAF/UDTF").

The reference's only extension points are Go interfaces (StreamAdapter /
StorageAdapter, streamAdapter.go:10-13, storageAdapter.go:3-8); Spark's
are user functions. Policy: Arrow-vectorized pandas UDFs only — no
row-at-a-time Python (10-100x slower). Each demo op is deterministic so
it carries a full DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from iceberg_core_spark.session import load_table, spread


# ---------------------------------------------------------------------------
# scalar pandas UDF
# ---------------------------------------------------------------------------

@F.pandas_udf(StringType())
def _normalize_text(s: pd.Series) -> pd.Series:
    """Vectorized normalize: lowercase, collapse whitespace, strip."""
    return s.str.lower().str.replace(r"[ \t\n\x0B\f\r]+", " ", regex=True).str.strip()


def udf_scalar(spark: SparkSession, sf: str) -> DataFrame:
    """Arrow-batched scalar pandas UDF (the sanctioned UDF form)."""
    d = spread(load_table(spark, sf, "documents"))
    return d.select(
        "doc_id",
        _normalize_text(F.col("text")).alias("norm_text"),
        F.length(_normalize_text(F.col("text"))).alias("norm_len"),
    )


UDF_SCALAR_SQL = """
SELECT doc_id,
       trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS norm_text,
       length(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS norm_len
FROM documents
"""


# ---------------------------------------------------------------------------
# grouped UDAF via applyInPandas
# ---------------------------------------------------------------------------

def udaf_group_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Custom per-group aggregate in pandas (full-group Arrow batch).
    Values are summed as exact integer cents so the result is
    engine-deterministic."""
    ev = load_table(spark, sf, "events")
    out_schema = StructType([
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
        StructField("total_cents", LongType()),
        StructField("max_event_id", LongType()),
    ])

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        # NULL values: SQL SUM skips them and an all-NULL group sums
        # to NULL — and NaN.astype("int64") raises outright, so the
        # dropna is load-bearing on NULL-bearing corpora even though
        # the driver testdata has none (r13 review; the streaming
        # twin stateful.py made the same distinction in r12)
        vals = pdf["value"].dropna()
        cents = (vals * 100).round().astype("int64")
        return pd.DataFrame({
            "event_type": [pdf["event_type"].iloc[0]],
            "n_events": [len(pdf)],
            "total_cents": [int(cents.sum()) if len(cents) else None],
            "max_event_id": [int(pdf["event_id"].max())],
        })

    return ev.groupBy("event_type").applyInPandas(stats, out_schema)


UDAF_GROUP_STATS_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents,
       MAX(event_id) AS max_event_id
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# UDTF (table function) — one input row → many output rows
# ---------------------------------------------------------------------------

def udtf_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    """Python UDTF: doc → (pos, token) rows. (The builtin twin is
    posexplode — see relational.explode_tokens; this demonstrates the
    arbitrary-Python table-function surface.)"""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: long, tok: string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.lower().split()):
                yield i + 1, tok

    spark.udtf.register("ice_tokenize", Tokenize)
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT doc_id, t.pos, t.tok "
        "FROM udtf_docs, LATERAL ice_tokenize(text) t"
    )


UDTF_TOKENIZE_SQL = """
WITH limited AS (SELECT * FROM documents WHERE doc_id < 50)
SELECT doc_id,
       generate_subscripts(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+'), 1) AS pos,
       unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+')) AS tok
FROM limited
"""


QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "udf_scalar": (udf_scalar, UDF_SCALAR_SQL),
    "udaf_group_stats": (udaf_group_stats, UDAF_GROUP_STATS_SQL),
    "udtf_tokenize": (udtf_tokenize, UDTF_TOKENIZE_SQL),
}
