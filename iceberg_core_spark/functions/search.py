"""Lexical (BM25) search over the documents corpus — the keyword half
of the retrieval story (sim_search/* covers the embedding half).

Scale shape — the query vocabulary is a LITERAL (keyword queries are
a handful of terms), so term frequencies are per-term COLUMNS
computed map-side (``size(filter(tokens, = t))``), never an explode:

- the tf projection (doc_id, dl, one int per term — tens of bytes
  per document, never tokens) computes ONCE behind a MAP-SIDE
  explode(array(struct(tokens))) CSE barrier and persists
  (persist_site, the dedup-signature lifecycle): the corpus text is
  read and tokenized a single time regardless of the query-batch
  size, and token arrays never shuffle (r16 — the r15 repartition
  barrier moved the tokenized corpus through an exchange; the
  un-persisted two-branch r14 form re-evaluated the split per tf
  column and per branch);
- the corpus stats (N, avgdl, per-term document frequencies) are ONE
  scalar aggregate over that frame; scoring cross-joins the
  broadcast stats row, scores EVERY query as struct fields of one
  |queries|-wide array, and melts it with a single explode — the
  melt explodes |queries| skinny structs per document, never
  tokens. The per-query top-k plans as a native WindowGroupLimit
  (partial pass below the exchange, r15 — replacing the Arrow
  pre-top-k hop), so the window's shuffle carries ~k × partitions
  skinny (query_id, doc_id, score, n_hit) rows — never every hit
  document in the corpus.

Cross-engine determinism: tf/df/dl/N are integers; avgdl is pinned
as ``CAST(SUM(dl) AS DOUBLE)/N``; every per-query score is a chain of
+ over the query's terms in FIXED order with identical
parenthesization in both engines — no aggregate ever folds doubles
in engine-chosen order (the hazard the earlier explode/SUM design
had). ``ln`` runs once per distinct (N, df) input; scores surface
rounded to 9 decimals and rank ties break on doc_id.

Registered in the r9 window (staged in r8 for capacity): the query fn
and oracle below follow the registry (spark, sf_dir) contract.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_core_spark.functions.text import ws_tokens_nonempty
from iceberg_core_spark.session import load_table, spread

K1 = 1.2
B = 0.75
MAX_VOCAB = 64  # per-term columns: keyword queries, not documents


def _merge_query_terms(
        queries: list[tuple[int, str]]) -> dict[int, list[str]]:
    """(query_id, text) pairs → per-query ordered unique term lists —
    the ONE parsing both engines' builders share, so the Spark
    expressions and the oracle SQL can never disagree on term order."""
    if not queries:
        raise ValueError("queries must be non-empty")
    q_terms: dict[int, list[str]] = {}
    for qid, qs in queries:
        merged = q_terms.setdefault(qid, [])
        merged += [t for t in dict.fromkeys(qs.lower().split())
                   if t not in merged]
    for qid, terms in q_terms.items():
        if not terms:
            raise ValueError(f"query {qid} has no tokens")
    return q_terms


def local_group_topk(df: DataFrame, group_col: str, order_col: str,
                     id_col: str, k: int) -> DataFrame:
    """Per-partition Arrow-batched top-k per group, run BEFORE a
    global rank window ordered by (``order_col`` DESC, ``id_col``
    ASC): the rank order is row-local, so any global top-k row is
    necessarily in its partition's local top-k — each task forwards
    at most k rows per group and the window's shuffle sees
    ~k × partitions × |groups| skinny rows instead of every scored
    row (the same partial/final split TakeOrderedAndProject does for
    global top-k, done per group). Selection only — values pass
    through byte-identical, and per-Arrow-batch top-k is a superset
    of per-partition top-k, so correctness does not depend on batch
    boundaries.

    NULL ``order_col`` values sort LAST (na_position), matching
    Spark's DESC-NULLS-LAST window default — a NULL row survives
    locally only when its batch has < k better rows, exactly when it
    can reach the global top-k. NaN is folded into the same rule: the
    mapInPandas pandas→Arrow RETURN path converts NaN to NULL anyway
    (pa.Array.from_pandas), so ranking NaN as-if-NULL on the way in
    is the only self-consistent treatment (under this repo's default
    ANSI sessions a 0/0 raises before ever producing one). A NULL
    ``group_col`` key forms its OWN group (groupby dropna=False),
    matching the downstream window, which ranks NULL keys in their
    own partition — pandas' dropna default would silently drop those
    rows from the pre-top-k (r12 ADVICE; current callers' keys are
    non-null by construction, but the shared helper must not depend
    on that). r15 moved BOTH production callers (bm25's _rank_topk
    and similarity.cosine_topk_batch) onto the native
    WindowGroupLimit plan; this helper is retained as the Arrow-path
    oracle/reference for those plans (its regression test pins the
    selection semantics the native path must match) and for callers
    on Spark builds without WindowGroupLimit."""
    def _local_topk(batches):
        for pdf in batches:
            if len(pdf):
                yield (pdf.sort_values([group_col, order_col, id_col],
                                       ascending=[True, False, True],
                                       na_position="last")
                       .groupby(group_col, sort=False,
                                dropna=False).head(k))

    return df.mapInPandas(_local_topk, df.schema)


def _rank_topk(melted: DataFrame, k: int) -> DataFrame:
    """(doc_id, query_id, score, n_terms_hit) → per-query top-k with
    rank. The rank-<=-k filter triggers Spark's native
    ``WindowGroupLimit`` (3.5+): each map task forwards at most k rows
    per query BEFORE the exchange — the same per-partition pre-top-k
    the Arrow ``local_group_topk`` pass used to do here, now entirely
    in the JVM (r15 optimization, guide §4.1: the MapInPandas hop
    serialized every scored row out to Python and back for a
    selection the engine already performs; plan gained
    WindowGroupLimit(partial) below the exchange, lost MapInPandas)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id"))
    return (
        melted.withColumn("rank",
                          F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "n_terms_hit", "rank")
    )


def bm25_search(docs: DataFrame, queries: list[tuple[int, str]],
                text_col: str = "text", id_col: str = "doc_id",
                k: int = 10, k1: float = K1, b: float = B) -> DataFrame:
    """Score ``docs`` against each whitespace-tokenized query string in
    ``queries`` (``(query_id, query_text)`` pairs) with Lucene-style
    BM25 (idf = ln(1 + (N - df + ½)/(df + ½))) and return the top ``k``
    documents per query as (query_id, doc_id, score, n_terms_hit,
    rank), ranked by rounded score then doc_id. Only documents hitting
    at least one query term rank. A query_id listed twice scores the
    UNION of its entries' terms; a token-less query or an empty batch
    is rejected loudly."""
    q_terms = _merge_query_terms(queries)
    vocab = list(dict.fromkeys(t for ts in q_terms.values() for t in ts))
    if len(vocab) > MAX_VOCAB:
        raise ValueError(
            f"query vocabulary {len(vocab)} exceeds {MAX_VOCAB} — "
            "bm25_search materializes one tf column per term, which "
            "only pays off for keyword-sized term sets. For "
            "document-length queries use bm25_search_exploded: it "
            "explodes the corpus tokens, equi-joins the (query_id, "
            "term) list, and folds per-term BM25 contributions "
            "grouped by (query_id, doc_id) — one token-granularity "
            "shuffle, no per-term column blowup.")
    idx = {t: i for i, t in enumerate(vocab)}

    def _eq(term: str):
        # NB: a two-parameter lambda would receive (element, index)
        # from F.filter — close over the term instead
        return lambda x: x == F.lit(term)

    toks_field = F.col("__w").getField("t")
    tf_cols = [
        F.size(F.filter(toks_field, _eq(t))).alias(f"tf_{i}")
        for i, t in enumerate(vocab)
    ]
    # NULL-text docs have no tokens and no length: size(NULL) is -1 on
    # Spark (poisoning avgdl) while DuckDB's len(NULL) is NULL-skipped —
    # exclude them from the corpus statistics in BOTH engines (r9 review)
    base0 = spread(docs.filter(F.col(text_col).isNotNull())
                   .select(F.col(id_col).alias("doc_id"), text_col))
    # r15/r16 optimization, two layers (the r15 before-plan evaluated
    # the regex split ~20x per document):
    # 1. a MAP-SIDE CSE barrier between the tokenize and the tf
    #    columns: the token array rides a one-element
    #    explode(array(struct(...))) — the Generate evaluates the
    #    split() ONCE per row and every tf column references the
    #    generated attribute, which the optimizer cannot inline
    #    through. r15 used a repartition barrier here, which shuffled
    #    corpus-scale TOKEN ARRAYS — at the 100 TB design point that
    #    materializes the tokenized corpus to shuffle disk (the exact
    #    trade bm25_search_exploded's comment declines, r15 ADVICE).
    #    The Generate is row-local: no exchange at all. spread() on
    #    the skinny (doc_id, text) input covers the one-task
    #    single-file-scan case the repartition also handled, and is a
    #    structural no-op on any real multi-file layout.
    # 2. the SKINNY per-document tf frame (doc_id, dl, |vocab| ints —
    #    ~tens of bytes/doc, never tokens) persists via persist_site:
    #    the corpus-stats branch and the scoring branch both read it,
    #    so the whole tokenize+tf map runs ONCE per document instead
    #    of once per branch (ReuseExchange cannot be relied on here —
    #    column pruning gives the two branches different exchange
    #    subtrees). Same lifecycle as the dedup signature frames.
    from iceberg_core_spark.caching import persist_site

    wrapped = F.explode(F.array(F.struct(
        ws_tokens_nonempty(F.col(text_col)).alias("t"))))
    base = persist_site("search.bm25_tf", base0
                        .select("doc_id", wrapped.alias("__w"))
                        .select("doc_id",
                                F.size(toks_field).alias("dl"),
                                *tf_cols))

    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0))
          .alias(f"df_{i}") for i in range(len(vocab))])

    scored = base.crossJoin(F.broadcast(stats))
    norm = F.lit(k1) * (F.lit(1.0 - b)
                        + F.lit(b) * (F.col("dl") / F.col("avgdl")))

    def term_score(i: int):
        idf = F.log(F.lit(1.0)
                    + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
                    / (F.col(f"df_{i}") + F.lit(0.5)))
        return idf * ((F.col(f"tf_{i}") * F.lit(k1 + 1.0))
                      / (F.col(f"tf_{i}") + norm))

    q_structs = []
    for qid, terms in q_terms.items():
        ids = [idx[t] for t in terms]
        score = F.round(
            reduce(lambda a, b_: a + b_, [term_score(i) for i in ids]),
            9)
        n_hit = reduce(
            lambda a, b_: a + b_,
            [F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0) for i in ids])
        q_structs.append(F.struct(
            F.lit(qid).cast("long").alias("query_id"),
            score.alias("score"),
            n_hit.cast("long").alias("n_terms_hit")))
    # No pre-melt any-hit filter (r15): a deterministic filter over
    # the tf columns pushes through the repartition barrier down to
    # the scan (PushDownPredicates crosses Repartition), where it
    # re-tokenizes every document once per vocab term AND breaks the
    # stats/scoring ReuseExchange (the r15 before-plan showed exactly
    # that). Miss-documents now ride the melt as |queries| skinny
    # structs and die at the n_terms_hit filter right after — no
    # shuffle sees them, and the corpus tokenize stays a single
    # shared pass.
    melted = (
        scored.select("doc_id", F.explode(F.array(*q_structs)).alias("q"))
        .select("doc_id", "q.query_id", "q.score", "q.n_terms_hit")
        .filter(F.col("n_terms_hit") > 0)
    )
    return _rank_topk(melted, k)


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


def _bm25_sql(queries: list[tuple[int, str]], k: int = 10,
              k1: float = K1, b: float = B) -> str:
    """The DuckDB twin, generated from the SAME query list with the
    SAME term order and parenthesization as the Spark expressions
    (duplicate query_ids merge identically; quotes escape)."""
    q_terms = _merge_query_terms(queries)
    vocab = list(dict.fromkeys(t for ts in q_terms.values() for t in ts))
    idx = {t: i for i, t in enumerate(vocab)}
    tf_defs = ",\n         ".join(
        "len(list_filter(tk, x -> x = '{}')) AS tf_{}".format(
            t.replace("'", "''"), i)
        for i, t in enumerate(vocab))
    df_defs = ",\n         ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(vocab)))
    norm = f"({k1} * ({1.0 - b} + ({b} * (dl / avgdl))))"

    def term_score(i: int) -> str:
        idf = f"ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        return f"({idf} * ((tf_{i} * {k1 + 1.0}) / (tf_{i} + {norm})))"

    blocks = []
    for qid, terms in q_terms.items():
        ids = [idx[t] for t in terms]
        score = " + ".join(term_score(i) for i in ids)
        n_hit = " + ".join(
            f"(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)" for i in ids)
        any_hit = " OR ".join(f"tf_{i} > 0" for i in ids)
        blocks.append(f"""(
  SELECT CAST({qid} AS BIGINT) AS query_id, doc_id,
         ROUND({score}, 9) AS score,
         CAST({n_hit} AS BIGINT) AS n_terms_hit
  FROM scored WHERE {any_hit}
  ORDER BY score DESC, doc_id LIMIT {k}
)""")
        # left-to-right + in SQL == the Spark reduce() association
    union = "\nUNION ALL\n".join(blocks)
    return f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text),
                     '[ \t\n\x0b\f\r]+'), t -> t != '') AS tk
  FROM documents
  WHERE text IS NOT NULL
),
tf AS (
  SELECT doc_id, len(tk) AS dl,
         {tf_defs}
  FROM tk
),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
         {df_defs}
  FROM tf
),
scored AS (SELECT tf.*, s.* FROM tf CROSS JOIN stats s)
SELECT query_id, doc_id, score, n_terms_hit,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY score DESC, doc_id)
         AS BIGINT) AS rank
FROM ({union})
"""


CORPUS_BM25_SQL = _bm25_sql(SEARCH_QUERIES, k=10)

QUERIES = {
    "corpus_bm25": (corpus_bm25, CORPUS_BM25_SQL),
}


# ---------------------------------------------------------------------------
# document-scale term sets: the explode-based formulation the vocab
# cap points at. No per-term columns — the corpus tokens explode
# ONCE, semi-join the (broadcast) query vocabulary, and fold per-term
# contributions per (query, doc).

_CONTRIB_T = "decimal(18,9)"


def bm25_search_exploded(docs: DataFrame,
                         queries: list[tuple[int, str]],
                         text_col: str = "text", id_col: str = "doc_id",
                         k: int = 10, k1: float = K1,
                         b: float = B) -> DataFrame:
    """BM25 for DOCUMENT-SCALE query term sets (hundreds+ of terms —
    past ``bm25_search``'s per-term-column sweet spot). Same scoring,
    same output schema and ranking as ``bm25_search``.

    Scale shape: one token explode semi-joined to the broadcast query
    vocabulary (tokens outside every query never shuffle), one hash
    aggregate per (doc, term), broadcast joins for document
    frequencies and the 1-row corpus stats, one hash aggregate per
    (query, doc). The per-(query, doc) score fold uses the house
    exact-decimal pattern (lm_quality.py): each per-term contribution
    is quantized ONCE to DECIMAL(18,9), the fold is exact decimal
    addition (engine-fold-order independent), and only the final
    round-to-9 runs on the double. The top-k reuses the shared
    pre-top-k + rank window (``_rank_topk``).

    Scores differ from ``bm25_search`` only by the per-term
    DECIMAL(18,9) quantization — up to ~0.5e-9 per MATCHED term, so a
    query matching m terms can diverge by ~m·0.5e-9 (near-tied docs
    may rank differently between the two paths at that granularity);
    ranking ties still break on doc_id."""
    q_terms = _merge_query_terms(queries)
    spark = docs.sparkSession
    qterms = spark.createDataFrame(
        [(qid, t) for qid, ts in q_terms.items() for t in ts],
        "query_id long, term string")
    return bm25_search_exploded_frame(docs, qterms, text_col=text_col,
                                      id_col=id_col, k=k, k1=k1, b=b)


def bm25_search_exploded_frame(docs: DataFrame, qterms: DataFrame,
                               text_col: str = "text",
                               id_col: str = "doc_id",
                               k: int = 10, k1: float = K1,
                               b: float = B) -> DataFrame:
    """``bm25_search_exploded`` with the query term sets as a
    DATAFRAME ``(query_id long, term string)`` — the zero-driver
    variant for query batches too large to ship as a Python list
    (query documents derived from another table: decontamination
    probes, related-document retrieval). Terms must be pre-normalized
    the way the corpus tokenizes (lowercased, whitespace-split);
    duplicate (query_id, term) rows, NULL terms, and NULL query_ids
    are dropped. Unlike the list variant, emptiness cannot be
    validated without forcing a job — an empty (or all-NULL) term
    frame yields an EMPTY result, so validate upstream when an empty
    query batch should be an error.

    The term-set frame broadcasts (query batches are probe-sized next
    to a 100 TB corpus), and the plan references it TWICE (the vocab
    semi-join and the scoring melt) — persist ``qterms`` upstream if
    its lineage is expensive to recompute."""
    qmap = (qterms.select(F.col("query_id").cast("long").alias("query_id"),
                          F.col("term"))
            .filter(F.col("term").isNotNull()
                    & F.col("query_id").isNotNull())
            .distinct())
    vocab_df = qmap.select("term").distinct()

    toks = ws_tokens_nonempty(F.col(text_col))
    # deliberately NO barrier/persist here (r15): the stats branch
    # needs only dl (one tokenize-and-count pass) and the tf branch
    # explodes the tokens — sharing would mean shuffling or pinning
    # corpus-scale token arrays to save one split() pass, the trade
    # the dedup family also declines (shingles stay recompute-on-use)
    base = (docs.filter(F.col(text_col).isNotNull())
            .select(F.col(id_col).alias("doc_id"),
                    toks.alias("__toks"))
            .select("doc_id", F.size("__toks").alias("dl"), "__toks"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"))

    tf = (base.select("doc_id", "dl",
                      F.explode("__toks").alias("term"))
          .join(F.broadcast(vocab_df), "term")
          .groupBy("doc_id", "term")
          .agg(F.max("dl").alias("dl"),
               F.count(F.lit(1)).alias("tf")))
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log(F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    norm = F.lit(k1) * (F.lit(1.0 - b)
                        + F.lit(b) * (F.col("dl") / F.col("avgdl")))
    contrib = (tf.join(F.broadcast(dfs), "term")
               .crossJoin(F.broadcast(stats))
               .select("doc_id", "term",
                       (idf * ((F.col("tf") * F.lit(k1 + 1.0))
                               / (F.col("tf") + norm)))
                       .cast(_CONTRIB_T).alias("c")))

    melted = (
        contrib.join(F.broadcast(qmap), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("c").cast("double"), 9).alias("score"),
             F.count(F.lit(1)).alias("n_terms_hit"))
        .select("doc_id", "query_id", "score", "n_terms_hit")
    )
    return _rank_topk(melted, k)


# a "document as query": every corpus vocabulary word plus 40
# out-of-vocabulary terms — 71 terms, past MAX_VOCAB by design
DOC_QUERY_TEXT = (
    "spark join hash row batch scan customer column filter small slow "
    "merge order vector line data table agg value key stream window "
    "group part big sort query fast dup the a "
    + " ".join(f"oov{i}term" for i in range(40)))
DOC_QUERY = [(42, DOC_QUERY_TEXT)]


def corpus_bm25_exploded(spark: SparkSession, sf: str) -> DataFrame:
    """Registry-shaped query: BM25 top-20 for one 71-term
    document-scale query via the explode-based path."""
    docs = load_table(spark, sf, "documents")
    return bm25_search_exploded(docs, DOC_QUERY, k=20)


def _bm25_exploded_sql(queries: list[tuple[int, str]], k: int = 10,
                       k1: float = K1, b: float = B) -> str:
    """DuckDB twin of ``bm25_search_exploded`` — same vocabulary,
    same decimal quantization, same fold."""
    q_terms = _merge_query_terms(queries)
    vocab = sorted(set(t for ts in q_terms.values() for t in ts))

    def _q(t: str) -> str:
        return "'" + t.replace("'", "''") + "'"

    vocab_rows = ", ".join(f"({_q(t)})" for t in vocab)
    qmap_rows = ", ".join(f"({qid}, {_q(t)})"
                          for qid, ts in q_terms.items() for t in ts)
    idf = "ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"
    norm = f"({k1} * ({1.0 - b} + ({b} * (dl / avgdl))))"
    return f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text),
                     '[ \t\n\x0b\f\r]+'), t -> t != '') AS tk
  FROM documents
  WHERE text IS NOT NULL
),
base AS (SELECT doc_id, len(tk) AS dl, tk FROM tk),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM base
),
vocab(term) AS (VALUES {vocab_rows}),
tf AS (
  SELECT t.doc_id, t.term, MAX(t.dl) AS dl, COUNT(*) AS tf
  FROM (SELECT doc_id, dl, unnest(tk) AS term FROM base) t
  JOIN vocab v USING (term)
  GROUP BY 1, 2
),
dfs AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT t.doc_id, t.term,
         CAST(({idf}) * ((tf * {k1 + 1.0}) / (tf + {norm}))
              AS DECIMAL(18,9)) AS c
  FROM tf t JOIN dfs USING (term) CROSS JOIN stats
),
qmap(query_id, term) AS (VALUES {qmap_rows}),
scores AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, c.doc_id,
         ROUND(CAST(SUM(c.c) AS DOUBLE), 9) AS score,
         CAST(COUNT(*) AS BIGINT) AS n_terms_hit
  FROM contrib c JOIN qmap q USING (term)
  GROUP BY 1, 2
)
SELECT query_id, doc_id, score, n_terms_hit, rank FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, doc_id)
    AS BIGINT) AS rank
  FROM scores
) WHERE rank <= {k}
"""


CORPUS_BM25_EXPLODED_SQL = _bm25_exploded_sql(DOC_QUERY, k=20)

# registered r10 (staged r9, oracle-green at sf0.001 + sf0.01)
QUERIES["corpus_bm25_exploded"] = (corpus_bm25_exploded,
                                   CORPUS_BM25_EXPLODED_SQL)
