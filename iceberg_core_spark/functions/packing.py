"""Sequence packing: assign documents to fixed token-budget bins — the
pretraining-batch construction step (docs concatenate into ~budget-token
training sequences). The reference has no notion of tokens or batching
(its unit is the row, blockManager.go:65-67 flushes by row COUNT); this
is pipeline capability on top.

Deterministic streaming formulation: within each shard, docs in id
order fill bins by exclusive-prefix token sum — ``bin_id =
floor(prefix_excl / budget)``. The same integer arithmetic runs in any
engine, so the assignment is exactly reproducible (and DuckDB-oracle
checkable), unlike heuristic best-fit packers.

Scale shape: ONE shuffle (the window partition on the shard column);
the running sum is a sequential scan within each shard, so the shard
column is the parallelism unit — at 100 TB shard by (source, date) or
a hash bucket rather than a 5-value language column. Token counts are
pure Column expressions (whole-stage codegen, zero Python).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_core_spark.functions import text as T
from iceberg_core_spark.session import load_table


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "lang",
    budget: int = 512,
) -> DataFrame:
    """Per-doc bin assignment: (id, shard, n_tokens, bin_id). Docs fill
    bins in ``id_col`` order within each ``shard_col`` value; a doc's
    bin is the budget-quotient of the tokens packed before it, so bins
    overflow by at most one document (the standard greedy-stream
    trade: no doc splitting, no lookahead)."""
    toks = df.select(
        F.col(id_col),
        F.col(shard_col),
        T.token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    w = (Window.partitionBy(shard_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    excl = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return toks.withColumn(
        "bin_id", F.floor(excl / F.lit(float(budget))).cast("long"))


def corpus_pack(spark: SparkSession, sf: str) -> DataFrame:
    """Registry query: documents packed into 512-token bins per lang."""
    return pack_sequences(load_table(spark, sf, "documents"))


CORPUS_PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         CAST(len(regexp_extract_all(lower(text), '{T.TOKEN_RE}'))
              AS BIGINT) AS n_tokens
  FROM documents
), pref AS (
  SELECT doc_id, lang, n_tokens,
         SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_tokens AS excl
  FROM toks
)
SELECT doc_id, lang, n_tokens,
       CAST(FLOOR(excl / 512.0) AS BIGINT) AS bin_id
FROM pref
"""


QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "corpus_pack": (corpus_pack, CORPUS_PACK_SQL),
}
