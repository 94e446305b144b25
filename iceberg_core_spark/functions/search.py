"""Lexical (BM25) search over the documents corpus — the keyword half
of the retrieval story (sim_search/* covers the embedding half).

Scale shape, per stage:

- Document lengths are a map-side ``size(split(..))`` — no explode.
- The term explode is FILTERED to the query vocabulary before the
  shuffle (``array_intersect`` with a literal term array), so the
  (doc, term) exchange carries only query-term hits, not the corpus
  vocabulary — at 100 TB this is the difference between shuffling a
  few hit rows per document and shuffling every token.
- Corpus stats (N, avgdl) are one scalar aggregate; per-term document
  frequencies are ≤ |query terms| rows. Both join back as broadcasts.
- Top-k per query is a window over the scored hits partitioned by
  query_id (k small, queries parallel).

Cross-engine determinism: tf/df/dl/N are integers; avgdl is pinned as
``CAST(SUM(dl) AS DOUBLE)/N`` (one division, same tree both engines);
the BM25 formula uses +,*,/ (correctly-rounded IEEE) plus ONE ``ln``
per distinct (N, df) input — at most |query terms| distinct
transcendental evaluations, which the oracle test verifies agree.
Scores surface rounded to 9 decimals in both engines and ranking
orders by the rounded score with a doc_id tiebreak, so the emitted
top-k is stable cross-engine.

Staged for registration (window capacity per TODO.md): the query fn
and oracle below follow the registry (spark, sf_dir) contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_core_spark.functions.text import WS_RE
from iceberg_core_spark.session import load_table

K1 = 1.2
B = 0.75


def bm25_search(docs: DataFrame, queries: list[tuple[int, str]],
                text_col: str = "text", id_col: str = "doc_id",
                k: int = 10, k1: float = K1, b: float = B) -> DataFrame:
    """Score ``docs`` against each whitespace-tokenized query string in
    ``queries`` (``(query_id, query_text)`` pairs) with Lucene-style
    BM25 (idf = ln(1 + (N - df + ½)/(df + ½))) and return the top ``k``
    documents per query as (query_id, doc_id, score, n_terms_hit),
    ranked by rounded score then doc_id.
    """
    spark = docs.sparkSession
    q_terms = [(qid, t) for qid, qs in queries
               for t in dict.fromkeys(qs.lower().split())]
    qdf = spark.createDataFrame(q_terms, "query_id long, term string")
    vocab = sorted({t for _, t in q_terms})

    toks = F.filter(F.split(F.lower(F.col(text_col)), WS_RE + "+"),
                    lambda t: t != "")
    base = docs.select(F.col(id_col).alias("doc_id"),
                       toks.alias("__toks"))
    lens = base.select("doc_id", F.size("__toks").alias("dl"))

    # corpus stats: one scalar row, broadcast everywhere below
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)))
        .alias("avgdl"))

    # per-(doc, query-term) frequencies: the explode is pre-filtered
    # to the query vocabulary, so only hits reach the exchange
    hits = (
        base.select(
            "doc_id",
            F.explode(F.array_intersect(
                "__toks",
                F.array(*[F.lit(t) for t in vocab]))).alias("term"),
            "__toks")
        .select("doc_id", "term",
                F.size(F.filter(
                    "__toks",
                    lambda x: x == F.col("term"))).alias("tf"))
    )
    df_ = hits.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"))

    scored = (
        hits.join(F.broadcast(qdf), "term")
        .join(F.broadcast(df_), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(F.lit(1.0)
                  + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                  / (F.col("df") + F.lit(0.5))))
        .withColumn(
            "__s",
            F.col("__idf") * F.col("tf") * F.lit(k1 + 1.0)
            / (F.col("tf") + F.lit(k1)
               * (F.lit(1.0 - b)
                  + F.lit(b) * F.col("dl") / F.col("avgdl"))))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("__s"), 9).alias("score"),
             F.count(F.lit(1)).alias("n_terms_hit"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "n_terms_hit", "rank")
    )


SEARCH_QUERIES = [
    (1, "spark shuffle join"),
    (2, "table scan filter merge"),
    (3, "window hash"),
]


def corpus_bm25(spark: SparkSession, sf: str) -> DataFrame:
    """Registry-shaped query: BM25 top-10 over the documents corpus
    for three fixed keyword queries."""
    docs = load_table(spark, sf, "documents")
    return bm25_search(docs, SEARCH_QUERIES, k=10)


def _sql_queries_values() -> str:
    rows = ", ".join(
        f"({qid}, '{t}')"
        for qid, qs in SEARCH_QUERIES
        for t in dict.fromkeys(qs.lower().split()))
    return rows


CORPUS_BM25_SQL = f"""
WITH q(query_id, term) AS (VALUES {_sql_queries_values()}),
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text),
                     '[ \t\n\x0b\f\r]+'), t -> t != '') AS tk
  FROM documents
),
lens AS (SELECT doc_id, len(tk) AS dl FROM toks),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM lens
),
hits AS (
  SELECT t.doc_id, v.term,
         len(list_filter(t.tk, x -> x = v.term)) AS tf
  FROM toks t
  JOIN (SELECT DISTINCT term FROM q) v ON list_contains(t.tk, v.term)
),
dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY 1
),
scored AS (
  SELECT q.query_id, h.doc_id,
         ROUND(SUM(
           ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * h.tf * {K1 + 1.0}
           / (h.tf + {K1} * ({1.0 - B} + {B} * l.dl / s.avgdl))
         ), 9) AS score,
         COUNT(*) AS n_terms_hit
  FROM hits h
  JOIN q ON q.term = h.term
  JOIN dfreq d ON d.term = h.term
  JOIN lens l ON l.doc_id = h.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
)
SELECT query_id, doc_id, score, n_terms_hit, rank FROM (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY score DESC, doc_id) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= 10
"""

QUERIES = {
    "corpus_bm25": (corpus_bm25, CORPUS_BM25_SQL),
}
