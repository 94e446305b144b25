"""Exact duplicated-SPAN detection — substring-level dedup.

Document-level dedup (dedup_exact / dedup_near_jaccard) removes whole
near-copies; training corpora also carry shorter verbatim passages
repeated ACROSS otherwise-distinct documents (boilerplate, licenses,
quoted headers). The standard remedy (Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022) finds exact
duplicated substrings and clips them. This module is that operator at
fixed token-gram granularity: every K-token window whose exact text
occurs in more than one document is marked, and per document the
marked windows are merged into maximal duplicated spans (the classic
gaps-and-islands construction).

Scale design: the only wide exchange carries (gram-md5, doc_id,
position) triples — 16-byte keys, never text. The duplicated-gram set
comes from one hash aggregate with a distinct-doc count; marking is an
equi-join on the md5 (AQE broadcasts it when the dup set is small, the
common case); span-merging is a per-document window — partitioned by
``doc_id``, so 1000 executors merge disjoint document sets with no
coordination. Gram identity is md5 ON BOTH ENGINES (like
dedup_minhash_portable, dedup_portable.py:71), so build and oracle
cannot disagree on collisions. Reference analog: content-hash block
identity, filesystemStorageAdapter.go:96-99, generalized from whole
blocks to sliding token windows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_core_spark.session import load_table, spread

# minimum duplicated run, in tokens: one 8-token gram. Lee et al. use
# 50 BPE tokens on web-scale corpora; 8 whitespace tokens keeps the
# operator observable on the driver corpus while exercising the
# identical plan shape. The production threshold is exposed as
# ``min_span_tokens`` on both operators — spans shorter than it are
# reported/clipped only when they reach the threshold.
GRAM_TOKENS = 8

_WS = r"[ \t\n\x0B\f\r]+"


def _gram_positions(docs: DataFrame, k: int, id_col: str,
                    text_col: str) -> DataFrame:
    """(id, start_pos, h) for every K-token window: 1-based token
    position paired with the window's md5 digest BYTES (case-folded
    gram text) — ``unhex(md5(..))`` BinaryType, 16 bytes on the wire
    where the hex string form was 32 (the gram exchange is the
    operator's one wide shuffle, so this halves it).

    The struct array is built in ONE expression pass; the >= k guard
    lives inside the expression so the optimizer cannot push an
    inferred size() filter below a spread() exchange and re-tokenize
    on the narrow scan stage (the text_ngrams lesson,
    llm_queries.py:513).
    """
    toks = F.split(F.trim(F.lower(text_col)), _WS)
    grams = F.expr(
        f"transform(sequence(1, size(__toks) - {k - 1}), i -> "
        f"struct(i AS s, "
        f"unhex(md5(concat_ws(' ', slice(__toks, i, {k})))) AS h))"
    )
    guarded = F.when(F.size("__toks") >= k, grams).otherwise(
        F.array().cast("array<struct<s:int,h:binary>>"))
    return (
        spread(docs).withColumn("__toks", toks)
        .select(id_col, F.explode_outer(guarded).alias("g"))
        .filter(F.col("g").isNotNull())
        .select(id_col, F.col("g.s").alias("start_pos"),
                F.col("g.h").alias("h"))
    )


def _merge_islands(marked: DataFrame, id_col: str) -> DataFrame:
    """Gaps-and-islands merge of marked windows into maximal spans:
    (id, span_start, span_end, span_tokens), 1-based inclusive.
    Per-document window — partitioned by id, so executors merge
    disjoint document sets with no coordination."""
    w = Window.partitionBy(id_col).orderBy("start_pos")
    prev_end = F.max("end_pos").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    is_new = F.when(
        prev_end.isNull() | (F.col("start_pos") > prev_end + 1), 1
    ).otherwise(0)
    island = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        marked.withColumn("__island", island)
        .groupBy(id_col, "__island")
        .agg(F.min("start_pos").alias("span_start"),
             F.max("end_pos").alias("span_end"))
        .select(
            id_col,
            "span_start", "span_end",
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long").alias("span_tokens"),
        )
    )


def duplicated_spans(docs: DataFrame, k: int = GRAM_TOKENS,
                     id_col: str = "doc_id", text_col: str = "text",
                     min_span_tokens: int | None = None) -> DataFrame:
    """Maximal cross-document duplicated token spans per document.

    Returns (id, span_start, span_end, span_tokens) with 1-based
    inclusive token indices; overlapping or adjacent marked windows
    merge into one span (adjacent windows come from consecutive
    positions of one duplicated passage, so merging them reconstructs
    the passage's full extent). ``min_span_tokens`` drops merged spans
    shorter than the threshold — Lee et al. report on >= 50-token
    duplicates; every span is >= k by construction, so the default
    (None) reports all of them.
    """
    pos = _gram_positions(docs, k, id_col, text_col)
    # "appears in >1 distinct doc" as min(id) != max(id) rather than
    # COUNT(DISTINCT id) > 1 (r15 optimization, guide §2.3): the
    # distinct-count plans as a two-level aggregate whose FIRST
    # exchange repartitions every (h, id) gram row — a second full
    # gram-scale shuffle; min/max is one partial+final aggregate pair
    # over ONE exchange of near-distinct (h, min, max) rows. The sets
    # are identical: every h-group is non-empty, so it holds two
    # distinct ids iff its min and max differ.
    dup = (
        pos.groupBy("h")
        .agg(F.min(id_col).alias("__mn"), F.max(id_col).alias("__mx"))
        .filter(F.col("__mn") != F.col("__mx"))
        .select("h")
    )
    marked = (
        pos.join(dup, "h", "semi")
        .select(id_col, "start_pos",
                (F.col("start_pos") + (k - 1)).alias("end_pos"))
    )
    spans = _merge_islands(marked, id_col)
    if min_span_tokens is not None and min_span_tokens > k:
        spans = spans.filter(F.col("span_tokens") >= min_span_tokens)
    return spans


def dedup_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Registry query: maximal duplicated 8-token spans across the
    documents corpus."""
    return duplicated_spans(load_table(spark, sf, "documents"))


def dedup_spans_min16(spark: SparkSession, sf: str) -> DataFrame:
    """Registry query: the same span report at a production-style
    length threshold — only merged duplicated runs of >= 16 tokens
    (Lee et al. clip >= 50-token spans at web scale; 16 keeps the
    threshold observable on the driver corpus)."""
    return duplicated_spans(load_table(spark, sf, "documents"),
                            min_span_tokens=16)


def despan(docs: DataFrame, k: int = GRAM_TOKENS,
           id_col: str = "doc_id", text_col: str = "text",
           min_span_tokens: int | None = None) -> DataFrame:
    """CLIP duplicated spans: rewrite each document with every token
    removed that sits inside a duplicated window whose canonical owner
    is another document. The owner of a gram is the MINIMUM id among
    the documents containing it (deterministic, order-free), so
    exactly one copy of every duplicated passage survives the corpus —
    the Lee et al. clipping step at gram granularity. Within-owner
    repeats are kept (the owner keeps its own text untouched).
    ``min_span_tokens`` clips only merged removal spans of at least
    that many tokens (Lee et al. clip >= 50-token duplicates).

    Returns (id, clean_text, n_removed, n_spans_removed). Output
    tokens keep their ORIGINAL case — only gram identity is
    case-folded — and are re-joined with single spaces
    (tokenizer-normal form, the same whitespace normalization
    corpus_clean applies).

    Scale: the non-owner marked windows merge into maximal (lo, hi)
    SPANS per document (the same gaps-and-islands pass the span
    report uses) and travel as one small span array per affected
    document; the clip filter is ``exists(spans, ..)`` — O(tokens x
    islands) per document, not O(tokens x removed positions). The
    only full-text exchange is the final join of that array back
    onto the corpus, which AQE broadcasts whenever few documents are
    affected (the common case).
    """
    pos = _gram_positions(docs, k, id_col, text_col)
    # min != max ⇔ COUNT(DISTINCT id) > 1 (see duplicated_spans): one
    # exchange instead of the distinct-count's two, and min_doc rides
    # the same aggregate for free
    gm = (
        pos.groupBy("h")
        .agg(F.min(id_col).alias("min_doc"),
             F.max(id_col).alias("__mx"))
        .filter(F.col("min_doc") != F.col("__mx"))
        .select("h", "min_doc")
    )
    # (id, start_pos) is unique in pos and h is unique in gm, so the
    # marked windows need no dedup — no extra exchange before the
    # per-document islands window
    marked = (
        pos.join(gm, "h")
        .filter(F.col(id_col) > F.col("min_doc"))
        .select(id_col, "start_pos",
                (F.col("start_pos") + (k - 1)).alias("end_pos"))
    )
    spans = _merge_islands(marked, id_col)
    if min_span_tokens is not None and min_span_tokens > k:
        spans = spans.filter(F.col("span_tokens") >= min_span_tokens)
    rm = (
        spans.groupBy(id_col)
        .agg(F.collect_list(
            F.struct(F.col("span_start").alias("lo"),
                     F.col("span_end").alias("hi"))).alias("__sp"))
    )
    toks = F.split(F.trim(text_col), _WS)
    kept = F.expr(
        "filter(zip_with(__toks, sequence(1, size(__toks)), "
        "(t, i) -> struct(t AS t, i AS i)), "
        "x -> __sp IS NULL OR "
        "NOT exists(__sp, s -> x.i >= s.lo AND x.i <= s.hi))"
    )
    return (
        docs.join(rm, id_col, "left")
        .withColumn("__toks", toks)
        .withColumn("__kept", kept)
        .select(
            id_col,
            F.array_join(F.expr("transform(__kept, x -> x.t)"), " ")
             .alias("clean_text"),
            (F.size("__toks") - F.size("__kept")).cast("long")
             .alias("n_removed"),
            F.coalesce(F.size("__sp"), F.lit(0)).cast("long")
             .alias("n_spans_removed"),
        )
    )


def corpus_despan(spark: SparkSession, sf: str) -> DataFrame:
    """Registry query: the documents corpus with duplicated 8-token
    spans clipped everywhere but their canonical (min doc_id) owner."""
    return despan(load_table(spark, sf, "documents"))


def corpus_despan_min16(spark: SparkSession, sf: str) -> DataFrame:
    """Registry query: clipping at the production-style threshold —
    only merged duplicated runs of >= 16 tokens are removed; shorter
    cross-doc duplicates stay (they are likelier to be natural
    collisions than boilerplate)."""
    return despan(load_table(spark, sf, "documents"),
                  min_span_tokens=16)


DEDUP_SPANS_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         string_split_regex(trim(lower(text)), '[ \t\n\x0B\f\r]+') AS l
  FROM documents
), pos AS (
  SELECT doc_id, unnest(list_transform(range(1, len(l) - 6),
         i -> {'s': i, 'h': md5(array_to_string(l[i:i+7], ' '))}),
         recursive := true)
  FROM toks WHERE len(l) >= 8
), dup AS (
  SELECT h FROM pos GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1
), marked AS (
  SELECT p.doc_id, p.s AS start_pos, p.s + 7 AS end_pos
  FROM pos p JOIN dup USING (h)
), islands AS (
  SELECT doc_id, start_pos, end_pos,
         MAX(end_pos) OVER (PARTITION BY doc_id ORDER BY start_pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM marked
), flagged AS (
  SELECT doc_id, start_pos, end_pos,
         SUM(CASE WHEN prev_end IS NULL OR start_pos > prev_end + 1
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY start_pos
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM islands
)
SELECT doc_id, CAST(MIN(start_pos) AS INT) AS span_start,
       CAST(MAX(end_pos) AS INT) AS span_end,
       MAX(end_pos) - MIN(start_pos) + 1 AS span_tokens
FROM flagged GROUP BY doc_id, island
"""


# threshold-parameterized variant of the span report: identical CTEs,
# one extra HAVING on the merged span length
_ANCHOR = "FROM flagged GROUP BY doc_id, island"
assert _ANCHOR in DEDUP_SPANS_SQL  # a reword must not silently drop the HAVING
DEDUP_SPANS_MIN16_SQL = DEDUP_SPANS_SQL.replace(
    _ANCHOR,
    _ANCHOR + "\nHAVING MAX(end_pos) - MIN(start_pos) + 1 >= 16",
)


# COALESCE on clean_text: DuckDB's array_to_string([]) is NULL where
# Spark's array_join([]) is '' — a fully-clipped document must read as
# the empty string on both engines. The removal set derives from the
# MERGED islands (>= {thr} tokens), mirroring the Spark span-based
# clip; at the default threshold the island ranges cover exactly the
# marked windows' positions, so results are unchanged from a
# per-window removal set.
_CORPUS_DESPAN_SQL_TMPL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS lt,
         string_split_regex(trim(lower(text)), '[ \t\n\x0B\f\r]+') AS ll
  FROM documents
), pos AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ll) - 6),
         i -> {{'s': i, 'h': md5(array_to_string(ll[i:i+7], ' '))}}),
         recursive := true)
  FROM toks WHERE len(ll) >= 8
), gm AS (
  SELECT h, MIN(doc_id) AS min_doc FROM pos
  GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1
), marked AS (
  SELECT p.doc_id, p.s AS start_pos, p.s + 7 AS end_pos
  FROM pos p JOIN gm USING (h)
  WHERE p.doc_id > gm.min_doc
), prevs AS (
  SELECT doc_id, start_pos, end_pos,
         MAX(end_pos) OVER (PARTITION BY doc_id ORDER BY start_pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM marked
), flagged AS (
  SELECT doc_id, start_pos, end_pos,
         SUM(CASE WHEN prev_end IS NULL OR start_pos > prev_end + 1
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY start_pos
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM prevs
), spans AS (
  SELECT doc_id, MIN(start_pos) AS lo, MAX(end_pos) AS hi
  FROM flagged GROUP BY doc_id, island
  HAVING MAX(end_pos) - MIN(start_pos) + 1 >= {thr}
), rm AS (
  SELECT s.doc_id, u.p
  FROM spans s, unnest(range(s.lo, s.hi + 1)) AS u(p)
), rml AS (
  SELECT doc_id, list(p) AS lp FROM rm GROUP BY doc_id
), nsp AS (
  SELECT doc_id, COUNT(*) AS ns FROM spans GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(array_to_string(list_filter(lt, (x, i) ->
         r.lp IS NULL OR NOT list_contains(r.lp, i)), ' '), '')
         AS clean_text,
       CAST(len(lt) - len(list_filter(lt, (x, i) ->
         r.lp IS NULL OR NOT list_contains(r.lp, i))) AS BIGINT)
         AS n_removed,
       CAST(COALESCE(n.ns, 0) AS BIGINT) AS n_spans_removed
FROM toks t LEFT JOIN rml r USING (doc_id) LEFT JOIN nsp n USING (doc_id)
"""

CORPUS_DESPAN_SQL = _CORPUS_DESPAN_SQL_TMPL.format(thr=8)
CORPUS_DESPAN_MIN16_SQL = _CORPUS_DESPAN_SQL_TMPL.format(thr=16)


QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "dedup_spans": (dedup_spans, DEDUP_SPANS_SQL),
    "corpus_despan": (corpus_despan, CORPUS_DESPAN_SQL),
    # NEW r8: the Lee et al. production-style length threshold
    "dedup_spans_min16": (dedup_spans_min16, DEDUP_SPANS_MIN16_SQL),
    "corpus_despan_min16": (corpus_despan_min16,
                            CORPUS_DESPAN_MIN16_SQL),
}
