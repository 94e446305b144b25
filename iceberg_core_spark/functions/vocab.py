"""Vocabulary building: corpus-wide token frequencies and the top-k
vocab seed a tokenizer trainer starts from (word-level counts are the
input to BPE/WordPiece merge learning; the merge loop itself is an
offline single-node step over this compact frequency table).

Scale shape: explode is map-side; the ONE shuffle is the hash
aggregation on the token (partial counts combine map-side, so the
shuffle moves near-vocabulary-sized data, not token occurrences —
Zipf makes this collapse dramatic at 100 TB). Top-k then flows
through ``orderBy(...).limit(k)`` — Spark plans TakeOrderedAndProject
(per-partition heaps + driver merge of k rows), never a global sort.
The rank column is computed AFTER the limit, a window over k rows.

Reference has no notion of tokens (SURVEY.md §2.C); north-star
pipeline surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_core_spark.session import load_table

TOP_K = 100


def token_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(token, tf, df) — term frequency and document frequency."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[ \t\n\x0B\f\r]+"), lambda t: t != F.lit("")
    )
    return (
        df.select(F.col(id_col), F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct(id_col).alias("df"),
        )
    )


def top_k_vocab(freq: DataFrame, k: int = TOP_K) -> DataFrame:
    """Deterministic top-k by (tf desc, token asc) with a dense 1-based
    rank. Ordering ties break lexicographically so the vocab is
    reproducible across engines and runs."""
    top = freq.orderBy(F.desc("tf"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("tf"), F.asc("token"))
    return top.select(
        "token", "tf", "df", F.row_number().over(w).alias("rnk")
    )


def vocab_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Registry query: top-100 vocabulary of the documents corpus."""
    return top_k_vocab(token_frequencies(load_table(spark, sf, "documents")))


VOCAB_TOPK_SQL = f"""
WITH tok AS (
  SELECT doc_id, u.token AS token
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                           x -> x <> '') AS t
        FROM documents),
       UNNEST(t) AS u(token)
), freq AS (
  SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
  FROM tok GROUP BY token
), ranked AS (
  SELECT token, tf, df,
         ROW_NUMBER() OVER (ORDER BY tf DESC, token ASC) AS rnk
  FROM freq
)
SELECT token, tf, df, rnk FROM ranked WHERE rnk <= {TOP_K}
"""


QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "vocab_topk": (vocab_topk, VOCAB_TOPK_SQL),
}
