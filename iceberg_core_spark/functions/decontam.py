"""Eval-set decontamination: flag training documents that near-match a
held-out evaluation corpus — the training-data guard against benchmark
leakage. The reference's only identity notion is block-level content
hashing (reference block.go:94-115, R16), which catches byte-identical
re-ingest; semantic cross-corpus matching is new capability.

Scale shape (same discipline as dedup.ngram_jaccard_pairs): candidates
come from an EQUI join on (block cols, length band) with band±1
multiprobe on the (small) eval side — the shuffle carries skinny
(id, block, band) rows only; token arrays re-join by id on just the
surviving candidates; the exact Jaccard verify is width-repartitioned.
At 100 TB the eval corpus is benchmark-sized (thousands of docs), so
its exploded band copies broadcast and the train side never shuffles
more than its skinny projection.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_core_spark.functions.dedup import (
    _distinct_tokens,
    _spread_verify,
    fround,
    fround_sql,
    jaccard,
)
from iceberg_core_spark.session import load_table


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    length_col: str = "n_chars",
    length_tol: int = 20,
    threshold: float = 0.5,
) -> DataFrame:
    """Contaminated training docs: token-set Jaccard >= ``threshold``
    against ANY eval doc sharing the block cols with |length diff| <=
    ``length_tol``. Returns one row per contaminated train doc:
    (id_col, n_eval_matches, max_jacc)."""
    band = F.floor(F.col(length_col) / length_tol).cast("long")
    a = train.select(
        F.col(id_col).alias("train_id"),
        *[F.col(c).alias(f"a_{c}") for c in block_cols],
        F.col(length_col).alias("a_len"),
        band.alias("a_band"),
    )
    b = eval_df.select(
        F.col(id_col).alias("eval_id"),
        *[F.col(c).alias(f"b_{c}") for c in block_cols],
        F.col(length_col).alias("b_len"),
        F.explode(F.array(band - 1, band, band + 1)).alias("b_band"),
    )
    eq = F.col("a_band") == F.col("b_band")
    for c in block_cols:
        eq = eq & (F.col(f"a_{c}") == F.col(f"b_{c}"))
    cand = _spread_verify(
        a.join(b, eq)
        .filter(F.abs(F.col("a_len") - F.col("b_len")) <= length_tol)
        .select("train_id", "eval_id"),
        cols=("train_id", "eval_id"),
    )
    t_toks = train.select(F.col(id_col).alias("train_id"),
                          _distinct_tokens(F.col(text_col)).alias("a_toks"))
    e_toks = eval_df.select(F.col(id_col).alias("eval_id"),
                            _distinct_tokens(F.col(text_col)).alias("b_toks"))
    jc = fround(jaccard(F.col("a_toks"), F.col("b_toks")), 4)
    return (
        cand.join(t_toks, "train_id")
        .join(e_toks, "eval_id")
        .select("train_id", jc.alias("jacc"))
        .filter(F.col("jacc") >= threshold)
        .groupBy(F.col("train_id").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_eval_matches"),
             F.max("jacc").alias("max_jacc"))
    )


def corpus_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Registry query: documents split into pseudo train/eval corpora
    (doc_id % 53 == 0 is "the benchmark"), contaminated train docs
    reported with match count + max similarity."""
    docs = load_table(spark, sf, "documents")
    return decontaminate(
        docs.filter("doc_id % 53 <> 0"),
        docs.filter("doc_id % 53 = 0"),
    )


_JACC_RAW = (
    "len(list_intersect(a_toks, b_toks))"
    " / (len(a_toks) + len(b_toks) - len(list_intersect(a_toks, b_toks)))"
)

CORPUS_DECONTAMINATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, n_chars,
         list_distinct(string_split_regex(lower(text), '\\s+')) AS t
  FROM documents
), pairs AS (
  SELECT a.doc_id AS doc_id, a.t AS a_toks, b.t AS b_toks
  FROM toks a JOIN toks b
    ON a.lang = b.lang
   AND a.doc_id % 53 <> 0 AND b.doc_id % 53 = 0
   AND abs(a.n_chars - b.n_chars) <= 20
)
SELECT doc_id, COUNT(*) AS n_eval_matches,
       MAX({fround_sql(_JACC_RAW, 4)}) AS max_jacc
FROM pairs
WHERE {fround_sql(_JACC_RAW, 4)} >= 0.5
GROUP BY doc_id
"""


QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "corpus_decontaminate": (corpus_decontaminate,
                             CORPUS_DECONTAMINATE_SQL),
}
