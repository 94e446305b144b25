"""Unigram language-model quality scoring — the classic corpus-level
quality proxy (docs whose token distribution diverges from the corpus
score low), completing the quality family (quality.py has the
length/punctuation/repetition signals; this is the statistical one).

Model: maximum-likelihood unigram over the scoring corpus itself (the
registry shape) or a separate training frame; score = mean token
log-probability, ``(Σ_t c_dt · ln p_t) / n_d``.

Scale shape: training is ONE hash aggregate to a vocabulary-sized
count table; the corpus total folds off that same table; scoring
explodes doc tokens once, joins the (broadcastable) model, and
aggregates per doc — two token passes, no window, no UDF.

Cross-engine determinism (the house pattern): a per-DOC sum of double
log-probs would be fold-order dependent, so each distinct term's
``ln p_t`` is quantized ONCE to DECIMAL(18,9) (vocabulary-sized set
of conversions, identical inputs in both engines), the per-doc fold
is exact decimal arithmetic (integer in-doc count × decimal logprob),
and only the final per-token division runs in double.

Staged for registration (window capacity per TODO.md): the query fn
and oracle below follow the registry (spark, sf_dir) contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_core_spark.functions.text import WS_RE
from iceberg_core_spark.session import load_table

_LOGP_T = "decimal(18,9)"


def _toks(text_col: str):
    return F.filter(F.split(F.lower(F.col(text_col)), WS_RE + "+"),
                    lambda t: t != "")


def unigram_model(train: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, logp) — ML unigram log-probabilities over ``train``,
    quantized to DECIMAL(18,9) so downstream sums fold exactly."""
    counts = (
        train.select(F.explode(_toks(text_col)).alias("term"))
        .groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select("term",
                F.log(F.col("cnt").cast("double")
                      / F.col("total").cast("double"))
                .cast(_LOGP_T).alias("logp"))
    )


def lm_score(docs: DataFrame, model: DataFrame,
             text_col: str = "text", id_col: str = "doc_id",
             ) -> DataFrame:
    """Per-document mean token log-probability under ``model``.
    Out-of-vocabulary tokens are dropped from the sum but still count
    in ``n_tokens`` (an unseen token is evidence of divergence — the
    denominator keeps it; ``n_oov`` surfaces how many). Empty docs
    score NULL."""
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(_toks(text_col)).alias("term"))
    joined = toks.join(F.broadcast(model), "term", "left")
    return (
        joined.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.sum(F.when(F.col("logp").isNull(), 1)
                   .otherwise(0)).alias("n_oov"),
             F.sum("logp").alias("__slp"))
        .select("doc_id", "n_tokens", "n_oov",
                (F.col("__slp").cast("double") / F.col("n_tokens"))
                .alias("lm_logprob_per_token"))
    )


def corpus_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    """Registry-shaped query: every document scored under the unigram
    model of its own corpus (the self-scoring quality pass a filter
    thresholds)."""
    docs = load_table(spark, sf, "documents")
    return lm_score(docs, unigram_model(docs))


CORPUS_LM_SCORE_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text),
                '[ \t\n\x0b\f\r]+'), t -> t != '')) AS term
  FROM documents
),
counts AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY 1),
total AS (SELECT SUM(cnt) AS total FROM counts),
model AS (
  SELECT term,
         CAST(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
              AS DECIMAL(18,9)) AS logp
  FROM counts CROSS JOIN total
)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN m.logp IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_oov,
       CAST(SUM(m.logp) AS DOUBLE) / COUNT(*)
         AS lm_logprob_per_token
FROM toks t LEFT JOIN model m ON m.term = t.term
GROUP BY 1
"""

QUERIES = {
    "corpus_lm_score": (corpus_lm_score, CORPUS_LM_SCORE_SQL),
}
