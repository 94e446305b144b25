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


def decontaminate_ngram_exact(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Exact n-gram COLLISION decontamination — the GPT-3/PaLM-style
    check, complementary to the Jaccard path above: a training doc is
    flagged when any of its token n-grams appears verbatim anywhere in
    the eval corpus (substring containment, which whole-doc similarity
    misses — a benchmark question quoted inside a long web page).
    ``n=13`` is the published default; the registry query uses a
    smaller n sized to the synthetic corpus's tiny vocabulary.

    Returns (id_col, n_collisions, n_grams, hit_frac): distinct
    colliding n-grams, the doc's distinct n-gram count, their ratio.

    Scale shape: the eval corpus is benchmark-sized, so its distinct
    gram set BROADCASTS; the train side explodes map-side and the only
    shuffle is the final per-doc count-distinct aggregation. No
    train×train or gram×gram pair ever materializes.
    """
    def grams_of(df: DataFrame):
        toks = F.filter(
            F.split(F.lower(F.col(text_col)), r"[ \t\n\x0B\f\r]+"),
            lambda t: t != F.lit(""),
        )
        g = F.expr(
            f"transform(sequence(1, size(__t) - {n - 1}), "
            f"i -> concat_ws(' ', slice(__t, i, {n})))"
        )
        return df.withColumn("__t", toks).select(
            F.col(id_col),
            F.array_distinct(
                F.when(F.size("__t") >= n, g)
                .otherwise(F.array().cast("array<string>"))
            ).alias("grams"),
        )

    # gram construction (per-doc n-gram slices + concat_ws) is the
    # CPU hot spot on BOTH sides — spread() so a single-file scan
    # can't serialize it on one core (no-op at real scale)
    from iceberg_core_spark.session import spread

    # explode_outer, not explode: InferFiltersFromGenerate would add a
    # size(grams)>0 guard for plain explode, and because the gram
    # expression is deterministic the optimizer pushes that guard
    # through the spread() exchange down to the scan — re-evaluating
    # the ENTIRE n-gram construction per row on the narrow pre-spread
    # stage (observed: one task doing all the work twice). The outer
    # variant emits NULL for empty gram arrays, which the inner
    # broadcast join drops anyway — same result, no inferred filter,
    # and the hot expression evaluates exactly once, post-spread.
    eval_grams = (
        grams_of(spread(eval_df))
        .select(F.explode_outer("grams").alias("g"))
        .filter(F.col("g").isNotNull()).distinct()
    )
    train = spread(train)
    t = grams_of(train).select(
        id_col, F.size("grams").cast("long").alias("n_grams"),
        F.explode_outer("grams").alias("g"),
    )
    return (
        t.join(F.broadcast(eval_grams), "g")
        .groupBy(id_col)
        .agg(
            F.countDistinct("g").alias("n_collisions"),
            F.first("n_grams").alias("n_grams"),
        )
        .select(
            id_col, "n_collisions", "n_grams",
            fround(F.col("n_collisions") / F.col("n_grams"), 6).alias(
                "hit_frac"
            ),
        )
    )


N_EXACT = 4  # registry n: 31-word synthetic vocab ⇒ 13-grams never collide


def corpus_decontaminate_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Registry query: exact 4-gram collisions against the pseudo eval
    split (doc_id % 53 == 0), same split as corpus_decontaminate."""
    docs = load_table(spark, sf, "documents")
    return decontaminate_ngram_exact(
        docs.filter("doc_id % 53 <> 0"),
        docs.filter("doc_id % 53 = 0"),
        n=N_EXACT,
    )


_JACC_RAW = (
    "len(list_intersect(a_toks, b_toks))"
    " / (len(a_toks) + len(b_toks) - len(list_intersect(a_toks, b_toks)))"
)

CORPUS_DECONTAMINATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, n_chars,
         list_distinct(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+')) AS t
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


CORPUS_DECONTAMINATE_EXACT_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                     x -> x <> '') AS t
  FROM documents
), tg AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(t) >= {N_EXACT} THEN
           list_transform(range(1, len(t) - {N_EXACT - 2}),
                          i -> array_to_string(t[i:i+{N_EXACT - 1}], ' '))
           ELSE [] END) AS grams
  FROM t
), train AS (SELECT * FROM tg WHERE doc_id % 53 <> 0),
   eg AS (
  SELECT DISTINCT u.g AS g
  FROM (SELECT * FROM tg WHERE doc_id % 53 = 0), UNNEST(grams) AS u(g)
), hits AS (
  SELECT train.doc_id, len(train.grams) AS n_grams, u.g AS g
  FROM train, UNNEST(grams) AS u(g)
  JOIN eg ON u.g = eg.g
)
SELECT doc_id,
       COUNT(DISTINCT g) AS n_collisions,
       MIN(n_grams) AS n_grams,
       {fround_sql('COUNT(DISTINCT g) / CAST(MIN(n_grams) AS DOUBLE)', 6)}
         AS hit_frac
FROM hits GROUP BY doc_id
"""


QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "corpus_decontaminate": (corpus_decontaminate,
                             CORPUS_DECONTAMINATE_SQL),
    "corpus_decontaminate_exact": (corpus_decontaminate_exact,
                                   CORPUS_DECONTAMINATE_EXACT_SQL),
}
