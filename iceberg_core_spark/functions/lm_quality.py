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

Registered in the r9 window (staged in r8 for capacity): the query fn
and oracle below follow the registry (spark, sf_dir) contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_core_spark.functions.text import ws_tokens_nonempty
from iceberg_core_spark.session import load_table

_LOGP_T = "decimal(18,9)"


def _toks(text_col: str):
    return ws_tokens_nonempty(F.col(text_col))


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
    denominator keeps it; ``n_oov`` surfaces how many). Docs with no
    tokens at all stay in the output with n_tokens=0 and a NULL score
    (explode_outer — a quality pass that never SEES the degenerate
    empty doc would wave it through unexamined)."""
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       F.explode_outer(_toks(text_col)).alias("term"))
    joined = toks.join(F.broadcast(model), "term", "left")
    return (
        joined.groupBy("doc_id")
        # count(term) skips explode_outer's NULL row, so it IS the
        # token count — 0 for empty docs, with the doc still present
        .agg(F.count("term").alias("n_tokens"),
             F.sum(F.when(F.col("term").isNotNull()
                          & F.col("logp").isNull(), 1)
                   .otherwise(0)).alias("n_oov"),
             F.sum("logp").alias("__slp"))
        .select("doc_id", "n_tokens", "n_oov",
                F.when(F.col("n_tokens") > 0,
                       F.col("__slp").cast("double")
                       / F.col("n_tokens"))
                .alias("lm_logprob_per_token"))
    )


def corpus_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    """Registry-shaped query: every document scored under the unigram
    model of its own corpus (the self-scoring quality pass a filter
    thresholds)."""
    docs = load_table(spark, sf, "documents")
    return lm_score(docs, unigram_model(docs))


CORPUS_LM_SCORE_SQL = """
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text),
                     '[ \t\n\x0b\f\r]+'), t -> t != '') AS tk
  FROM documents
),
toks AS (SELECT doc_id, unnest(tk) AS term FROM tk),
counts AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY 1),
total AS (SELECT SUM(cnt) AS total FROM counts),
model AS (
  SELECT term,
         CAST(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
              AS DECIMAL(18,9)) AS logp
  FROM counts CROSS JOIN total
),
sums AS (
  SELECT t.doc_id,
         SUM(CASE WHEN m.logp IS NULL THEN 1 ELSE 0 END) AS n_oov,
         SUM(m.logp) AS slp
  FROM toks t LEFT JOIN model m ON m.term = t.term
  GROUP BY 1
)
SELECT k.doc_id,
       len(k.tk) AS n_tokens,
       CAST(COALESCE(s.n_oov, 0) AS BIGINT) AS n_oov,
       CASE WHEN len(k.tk) > 0
            THEN CAST(s.slp AS DOUBLE) / len(k.tk) END
         AS lm_logprob_per_token
FROM tk k LEFT JOIN sums s USING (doc_id)
"""

QUERIES = {
    "corpus_lm_score": (corpus_lm_score, CORPUS_LM_SCORE_SQL),
}
