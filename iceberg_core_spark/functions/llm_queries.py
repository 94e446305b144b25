"""Declared LLM-data-pipeline queries with DuckDB oracles
(SURVEY.md §2.B last row; north-star ops).

Oracle policy: exact/deterministic ops (text analysis, exact dedup,
Jaccard pairs, brute-force cosine) carry full SQL oracles; hash-family
ops built on Spark's xxhash64 (MinHash-LSH, SimHash) and the LSH/
multimodal paths have no DuckDB equivalent → rows-only checks, with
their exact twins (dedup_near_jaccard, dedup_embedding, sim_search)
serving as the verified baseline.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_core_spark.functions import dedup as D
from iceberg_core_spark.functions.dedup import fround, fround_sql
from iceberg_core_spark.functions import similarity as S
from iceberg_core_spark.functions import text as T
from iceberg_core_spark.multimodal import (
    attach_metadata,
    decode_and_featurize,
    to_binary,
)
from iceberg_core_spark.session import load_table, scan_partition_estimate

_STOP_SQL = {
    lang: "[" + ", ".join(f"'{w}'" for w in ws) + "]"
    for lang, ws in T.STOPWORDS.items()
}
_ALL_STOP_SQL = "[" + ", ".join(
    f"'{w}'" for w in sorted({w for ws in T.STOPWORDS.values() for w in ws})
) + "]"


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def _contains(stoplist):
    def f(t):
        return F.array_contains(stoplist, t)

    return f


def text_analysis(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage shape: tokenize ONCE below a repartition barrier, then
    compute every metric from the materialized token column. Without the
    barrier, CollapseProject inlines the split() into each of ~12 uses
    and interpreted HOFs re-evaluate it every time (no CSE) — measured
    ~40% slower. The repartition doubles as spread() for the
    single-row-group scan."""
    d = load_table(spark, sf, "documents")
    txt = F.col("text")
    # the repartition is a CSE barrier AND a spread; never DOWNSIZE the
    # partition count (a large scan coalesced to defaultParallelism
    # would shuffle the token arrays for nothing)
    base = d.select(
        "doc_id", "text",
        T.ws_tokens(txt).alias("toks"),
        T.bpe_tokens(txt).alias("btoks"),
    )
    base = base.repartition(
        max(spark.sparkContext.defaultParallelism,
            scan_partition_estimate(base))
    )

    toks = F.col("toks")
    all_words = sorted({w for ws in T.STOPWORDS.values() for w in ws})
    stop_ratio = (
        F.size(F.filter(toks, _contains(F.array(*map(F.lit, all_words)))))
        / F.size(toks)
    )
    punct = (
        F.size(F.regexp_extract_all(F.col("text"), F.lit(T.PUNCT_RE), 0))
        / F.length("text")
    )
    hits = {
        lang: F.size(F.filter(
            toks, _contains(F.array(*map(F.lit, T.STOPWORDS[lang])))
        ))
        for lang in T.LANG_ORDER
    }
    best = F.greatest(*hits.values())
    lang_case = F.lit("unknown")
    for lang in reversed(T.LANG_ORDER):
        lang_case = F.when(hits[lang] == best, F.lit(lang)).otherwise(lang_case)
    quality = (
        0.5 * stop_ratio + 0.3 * (1.0 - punct)
        + 0.2 * F.least(F.lit(1.0), F.size(toks) / 100.0)
    )
    return base.select(
        "doc_id",
        F.size("btoks").alias("n_bpe_tokens"),
        F.size(toks).alias("n_ws_tokens"),
        fround(punct, 6).alias("punct_ratio"),
        fround(stop_ratio, 6).alias("stop_ratio"),
        fround(quality, 6).alias("quality"),
        F.when(best > 0, lang_case).otherwise(F.lit("unknown")).alias("lang_pred"),
        T.fingerprint(F.col("text")).alias("fp"),
    )


_LANG_HIT = (
    "len(list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'), "
    "t -> list_contains({stop}, t)))"
)


def _lang_case_sql() -> str:
    hits = {
        lang: _LANG_HIT.format(stop=_STOP_SQL[lang]) for lang in T.LANG_ORDER
    }
    best = "greatest(" + ", ".join(hits.values()) + ")"
    case = "'unknown'"
    for lang in reversed(T.LANG_ORDER):
        case = f"CASE WHEN {hits[lang]} = __best THEN '{lang}' ELSE {case} END"
    return best, case


_BEST_SQL, _CASE_SQL = _lang_case_sql()

_QUALITY_RAW = (
    "0.5 * stop_raw + 0.3 * (1.0 - punct_raw)"
    " + 0.2 * least(1.0, n_ws_tokens / 100.0)"
)

TEXT_ANALYSIS_SQL = f"""
WITH parts AS (
  SELECT doc_id, text,
         len(regexp_extract_all(lower(text), '{T.TOKEN_RE}')) AS n_bpe_tokens,
         len(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+')) AS n_ws_tokens,
         len(regexp_extract_all(text, '[.,!?;:]')) / length(text) AS punct_raw,
         len(list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                         t -> list_contains({_ALL_STOP_SQL}, t)))
           / len(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+')) AS stop_raw,
         {_BEST_SQL} AS __best
  FROM documents
)
SELECT doc_id, n_bpe_tokens, n_ws_tokens,
       {fround_sql('punct_raw', 6)} AS punct_ratio,
       {fround_sql('stop_raw', 6)} AS stop_ratio,
       {fround_sql(_QUALITY_RAW, 6)} AS quality,
       CASE WHEN __best > 0 THEN {_CASE_SQL} ELSE 'unknown' END AS lang_pred,
       md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS fp
FROM parts
"""


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    return D.dedup_exact(load_table(spark, sf, "documents"))


DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies, md5(text) AS text_md5
FROM documents GROUP BY text
"""


def dedup_near_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    return D.ngram_jaccard_pairs(load_table(spark, sf, "documents"))


_JACC_RAW = (
    "len(list_intersect(a_toks, b_toks))"
    " / (len(a_toks) + len(b_toks) - len(list_intersect(a_toks, b_toks)))"
)

DEDUP_NEAR_JACCARD_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, n_chars,
         list_distinct(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+')) AS t
  FROM documents
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.t AS a_toks, b.t AS b_toks
  FROM toks a JOIN toks b
    ON a.lang = b.lang AND a.doc_id < b.doc_id
   AND abs(a.n_chars - b.n_chars) <= 20
)
SELECT doc_a, doc_b, {fround_sql(_JACC_RAW, 4)} AS jacc
FROM pairs
WHERE {fround_sql(_JACC_RAW, 4)} >= 0.5
"""


def dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Pairs → canonical groups: connected components over the
    ngram-Jaccard pair graph, every document labeled with its cluster's
    min doc_id, the canonical member flagged ``keep``. The iterative
    min-label propagation is oracle-checked against DuckDB's WITH
    RECURSIVE transitive closure."""
    docs = load_table(spark, sf, "documents")
    pairs = D.ngram_jaccard_pairs(docs)
    return D.dedup_cluster_assign(docs, pairs)


DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, lang, n_chars,
         list_distinct(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+')) AS t
  FROM documents
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.t AS a_toks, b.t AS b_toks
  FROM toks a JOIN toks b
    ON a.lang = b.lang AND a.doc_id < b.doc_id
   AND abs(a.n_chars - b.n_chars) <= 20
), pairs AS (
  SELECT doc_a, doc_b FROM cand WHERE {fround_sql(_JACC_RAW, 4)} >= 0.5
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
), reach(id, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id
), cc AS (
  SELECT id AS doc_id, MIN(label) AS canon_id FROM reach GROUP BY id
)
SELECT doc_id, canon_id, doc_id = canon_id AS keep,
       COUNT(*) OVER (PARTITION BY canon_id) AS cluster_size
FROM cc
"""


def dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Rows-only: xxhash64 has no DuckDB twin; exact-verified against
    dedup_near_jaccard semantics in tests."""
    return D.minhash_lsh_pairs(load_table(spark, sf, "documents"))


def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """Rows-only (xxhash64-based)."""
    return D.simhash_pairs(load_table(spark, sf, "documents"))


def dedup_clusters_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """The 100 TB clustering path: canonical groups over the
    MinHash-LSH pair graph — same connected-components step as
    ``dedup_clusters`` but fed by the banded-LSH candidate generator
    instead of the exact-Jaccard oracle pairs, so the end-to-end
    pipeline (shingle → band join → verify → cluster) is what a
    production dedup job runs. Rows-only (xxhash64 has no DuckDB twin);
    the exact twin ``dedup_clusters`` and the union-find cross-check
    bound it."""
    docs = load_table(spark, sf, "documents")
    pairs = D.minhash_lsh_pairs(docs)
    return D.dedup_cluster_assign(docs, pairs)


def dedup_embedding(spark: SparkSession, sf: str) -> DataFrame:
    return D.embedding_dup_pairs(load_table(spark, sf, "embeddings"),
                                 threshold=0.4)


def dedup_embedding_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Rows-only: the bucketed (hyperplane-LSH + 1-bit multiprobe)
    production twin of dedup_embedding — approximate recall, so no SQL
    oracle; the planted-pair recall test and the all-pairs twin bound
    it. threshold matches dedup_embedding so results are comparable."""
    return D.embedding_dup_pairs_lsh(
        load_table(spark, sf, "embeddings"), dim=64, threshold=0.4,
    )


_COS_RAW = (
    "list_dot_product(av, bv)"
    " / (sqrt(list_dot_product(av, av)) * sqrt(list_dot_product(bv, bv)))"
)

DEDUP_EMBEDDING_SQL = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.dv AS av, b.dv AS bv
  FROM v a JOIN v b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, {fround_sql(_COS_RAW, 4)} AS sim
FROM pairs
WHERE {fround_sql(_COS_RAW, 4)} >= 0.4
"""


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def _query_vec(spark: SparkSession, sf: str) -> list[float]:
    row = (
        load_table(spark, sf, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row[0]]


def sim_search(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force exact cosine top-10 for vec_id 0's embedding."""
    emb = load_table(spark, sf, "embeddings").filter(F.col("vec_id") != 0)
    return S.cosine_topk(emb, _query_vec(spark, sf), k=10,
                         extra_cols=("label",))


_QCOS_RAW = (
    "list_dot_product(dv, qv)"
    " / (sqrt(list_dot_product(dv, dv)) * sqrt(list_dot_product(qv, qv)))"
)

SIM_SEARCH_SQL = f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
), v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS dv
  FROM embeddings WHERE vec_id <> 0
)
SELECT vec_id, label, {fround_sql(_QCOS_RAW, 4)} AS sim
FROM v, q
ORDER BY sim DESC, vec_id
LIMIT 10
"""


def sim_search_batch(spark: SparkSession, sf: str) -> DataFrame:
    """Batch exact top-5 for 5 query vectors against the rest — the
    broadcast-queries × streaming-corpus shape (zero shuffle before the
    per-query top-k window)."""
    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    return S.cosine_topk_batch(corpus, queries, k=5)


SIM_SEARCH_BATCH_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv
  FROM embeddings WHERE vec_id >= 5
), scored AS (
  SELECT qid, vec_id, {fround_sql(_QCOS_RAW, 4)} AS sim FROM c, q
)
SELECT qid, vec_id, sim, rn FROM (
  SELECT qid, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
  FROM scored
) WHERE rn <= 5
"""


def sim_search_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Rows-only: approximate (bucket recall is probabilistic); exact
    twin is sim_search."""
    emb = load_table(spark, sf, "embeddings").filter(F.col("vec_id") != 0)
    return S.lsh_topk(emb, _query_vec(spark, sf), k=10)


_IVF_INDEX_CACHE: dict[str, "S.IvfIndex"] = {}


def sim_search_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """Rows-only: k-means IVF probe + exact rerank (the second ANN
    scale path beside LSH); exact twin is sim_search. Uses the
    build-once/query-many IvfIndex: the coarse quantizer is fit and the
    cell-partitioned table written ONCE per corpus (cached per sf dir
    here; a real deployment builds at ingest time), so each query only
    reads its n_probe cell partitions — manifest-pruned, no re-fit."""
    import tempfile

    idx = _IVF_INDEX_CACHE.get(sf)
    if idx is None:
        emb = load_table(spark, sf, "embeddings").filter(F.col("vec_id") != 0)
        root = tempfile.mkdtemp(prefix="ivf_index_")
        idx = S.IvfIndex.build(spark, emb, root)
        _IVF_INDEX_CACHE[sf] = idx
    return idx.topk(_query_vec(spark, sf), k=10)


# ---------------------------------------------------------------------------
# end-to-end corpus prep pipeline
# ---------------------------------------------------------------------------

def corpus_clean(spark: SparkSession, sf: str) -> DataFrame:
    """The whole training-corpus prep as ONE declarative plan — quality
    gate → exact-dedup keep → reproducible split → per-cohort counts —
    showing the operators compose without materialization barriers:

      1. quality gate: drop docs under 5 tokens (map-side filter,
         pushed below everything else by Catalyst);
      2. exact dedup: keep the min-doc_id row per identical text — the
         window keys on md5(text) and the text column is DROPPED
         before the exchange, so the dedup shuffle carries 32 hex
         chars + three skinny columns per row, never document bodies
         (the r12 dedup_exact key choice applied here in r13; same
         collision stance, and the oracle's per-text grouping yields
         identical output);
      3. split: md5-bucket train/val/test (map-side, engine-portable);
      4. report: docs + tokens per (lang, split) (second, tiny shuffle).

    Two shuffles total for the whole pipeline; everything between them
    is whole-stage-codegen'd."""
    from pyspark.sql import Window

    from iceberg_core_spark.functions.sampling import split_assign

    d = load_table(spark, sf, "documents")
    toks = F.split(F.lower(F.col("text")), r"[ \t\n\x0B\f\r]+")
    base = d.select(
        "doc_id", "lang", F.md5(F.col("text")).alias("__k"),
        F.size(toks).alias("n_toks")
    ).filter(F.col("n_toks") >= 5)
    w = Window.partitionBy("__k").orderBy("doc_id")
    kept = (
        base.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1).drop("rn", "__k")
    )
    return (
        split_assign(kept, test_pct=10, val_pct=5)
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )


CORPUS_CLEAN_SQL = """
WITH base AS (
  SELECT doc_id, lang, text,
         len(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+')) AS n_toks
  FROM documents
), gated AS (
  SELECT * FROM base WHERE n_toks >= 5
), kept AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM gated
), split AS (
  SELECT lang, n_toks,
         CASE WHEN b < 10 THEN 'test'
              WHEN b < 15 THEN 'val'
              ELSE 'train' END AS split
  FROM (SELECT *,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
            AS b
        FROM kept WHERE rn = 1)
)
SELECT lang, split, COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens
FROM split
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------

def multimodal_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Binary payload + typed metadata, all JVM-side (oracle-checkable)."""
    d = to_binary(load_table(spark, sf, "documents"), "text")
    return attach_metadata(d).select(
        "doc_id",
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.checksum").alias("checksum"),
    )


MULTIMODAL_META_SQL = """
SELECT doc_id,
       'text/plain' AS media_type,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS checksum
FROM documents
"""


def multimodal_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """Frame-sampling plumbing: payload → every-4th 256-byte chunk;
    output is (doc, chunk_idx, chunk_bytes) so the byte-exact chunking
    is oracle-checkable without hashing raw binary."""
    from iceberg_core_spark.multimodal import sample_chunks

    d = to_binary(load_table(spark, sf, "documents"), "text")
    return sample_chunks(d).select("doc_id", "chunk_idx", "chunk_bytes")


MULTIMODAL_CHUNKS_SQL = """
SELECT doc_id, i AS chunk_idx,
       least(256, L - i * 256) AS chunk_bytes
FROM (SELECT doc_id, octet_length(encode(text)) AS L FROM documents) t,
     LATERAL (SELECT unnest(range(0, CAST(ceil(L / 256.0) AS BIGINT), 4)) AS i) u
"""


def text_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus bigram counts (n-gram generation + frequency) — the
    vocabulary-building primitive. Map-side exploding, one hash-agg
    shuffle on the bigram."""
    from iceberg_core_spark.session import spread

    d = load_table(spark, sf, "documents")
    toks = F.split(F.trim(F.lower("text")), r"[ \t\n\x0B\f\r]+")
    bigrams = F.expr(
        "transform(sequence(1, size(__toks) - 1), "
        "i -> concat(element_at(__toks, i), ' ', element_at(__toks, i + 1)))"
    )
    # the >=2 guard lives INSIDE the expression (sequence(1, 0) is
    # DESCENDING in Spark) and the explode is the outer variant: an
    # explicit or explode-inferred size filter is deterministic, so
    # the optimizer would push it through the spread() exchange and
    # re-tokenize every row on the narrow scan stage
    guarded = F.when(F.size("__toks") >= 2, bigrams).otherwise(
        F.array().cast("array<string>"))
    return (
        spread(d).withColumn("__toks", toks)
        .select(F.explode_outer(guarded).alias("bigram"))
        .filter(F.col("bigram").isNotNull())
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
    )


TEXT_NGRAMS_SQL = """
WITH toks AS (
  SELECT string_split_regex(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+') AS l
  FROM documents
  WHERE len(string_split_regex(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+')) >= 2
), grams AS (
  SELECT unnest(list_transform(range(1, len(l)),
                               i -> l[i] || ' ' || l[i + 1])) AS bigram
  FROM toks
)
SELECT bigram, COUNT(*) AS n FROM grams GROUP BY bigram HAVING COUNT(*) >= 5
"""


def multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """REAL media decode, fully oracle-checkable: documents become
    actual WAV audio (even ids) / P6 PPM images (odd ids) via
    ``encode_media``, then ``decode_media_features`` parses each
    container from its bytes alone (RIFF chunk walk / PPM ASCII header,
    stdlib struct + numpy) and emits integer sample statistics. The
    oracle reproduces encode∘decode arithmetic over the text bytes.
    Both stages are narrow Arrow-batched maps — no shuffle at any
    scale; reference analog: block decode streamAdapter.go:15-42."""
    from iceberg_core_spark.multimodal import decode_media_features, encode_media

    # byte-based filter: encode/decode operate on UTF-8 BYTES, so the
    # oracle filter must see the identical length for non-ASCII text
    # (octet_length != length once multibyte chars appear)
    d = load_table(spark, sf, "documents").filter(F.octet_length("text") >= 3)
    return decode_media_features(encode_media(d))


# Byte-based on both sides: the engine encodes text as UTF-8 bytes, so
# the oracle walks hex(encode(text)) two hex digits at a time — byte i is
# ('0x' || substr(hx, 2i-1, 2))::BIGINT. Correct for any non-ASCII text
# (DuckDB 1.0 has no get_byte; ord(substr(text,..)) would yield code
# points, not bytes).
MULTIMODAL_FEATURES_SQL = """
WITH d AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS len,
         CASE WHEN doc_id % 2 = 0 THEN octet_length(encode(text))
              ELSE 3 * (octet_length(encode(text)) // 3) END AS used
  FROM documents WHERE octet_length(encode(text)) >= 3
), pos AS (
  SELECT doc_id, hx, len, used,
         unnest(generate_series(1, used)) AS i
  FROM d
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'audio/wav'
            ELSE 'image/ppm' END AS media_type,
       CAST(CASE WHEN doc_id % 2 = 0 THEN max(len)
                 ELSE max(len) // 3 END AS BIGINT) AS n_units,
       CAST(sum(('0x' || substr(hx, 2 * i - 1, 2))::BIGINT) AS BIGINT) AS sum_val,
       CAST(min(('0x' || substr(hx, 2 * i - 1, 2))::BIGINT) AS BIGINT) AS min_val,
       CAST(max(('0x' || substr(hx, 2 * i - 1, 2))::BIGINT) AS BIGINT) AS max_val,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 16000
                 ELSE max(len) // 3 END AS BIGINT) AS rate_or_width
FROM pos
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "text_analysis": (text_analysis, TEXT_ANALYSIS_SQL),
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_near_jaccard": (dedup_near_jaccard, DEDUP_NEAR_JACCARD_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh, None),
    "dedup_simhash": (dedup_simhash, None),
    "dedup_embedding": (dedup_embedding, DEDUP_EMBEDDING_SQL),
    "dedup_embedding_lsh": (dedup_embedding_lsh, None),
    "dedup_clusters": (dedup_clusters, DEDUP_CLUSTERS_SQL),
    "dedup_clusters_minhash": (dedup_clusters_minhash, None),
    "corpus_clean": (corpus_clean, CORPUS_CLEAN_SQL),
    "sim_search": (sim_search, SIM_SEARCH_SQL),
    "sim_search_batch": (sim_search_batch, SIM_SEARCH_BATCH_SQL),
    "sim_search_lsh": (sim_search_lsh, None),
    "sim_search_ivf": (sim_search_ivf, None),
    "multimodal_meta": (multimodal_meta, MULTIMODAL_META_SQL),
    "multimodal_features": (multimodal_features, MULTIMODAL_FEATURES_SQL),
    "multimodal_chunks": (multimodal_chunks, MULTIMODAL_CHUNKS_SQL),
    "text_ngrams": (text_ngrams, TEXT_NGRAMS_SQL),
}
