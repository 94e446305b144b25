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
# identical plan shape.
GRAM_TOKENS = 8

_WS = r"[ \t\n\x0B\f\r]+"


def duplicated_spans(docs: DataFrame, k: int = GRAM_TOKENS,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Maximal cross-document duplicated token spans per document.

    Returns (id, span_start, span_end, span_tokens) with 1-based
    inclusive token indices; overlapping or adjacent marked windows
    merge into one span (adjacent windows come from consecutive
    positions of one duplicated passage, so merging them reconstructs
    the passage's full extent).
    """
    toks = F.split(F.trim(F.lower(text_col)), _WS)
    # positions paired with the gram's md5 — struct array built in ONE
    # expression pass; the >= k guard lives inside the expression so
    # the optimizer cannot push an inferred size() filter below a
    # spread() exchange and re-tokenize on the narrow scan stage (the
    # text_ngrams lesson, llm_queries.py:513)
    grams = F.expr(
        f"transform(sequence(1, size(__toks) - {k - 1}), i -> "
        f"struct(i AS s, md5(concat_ws(' ', slice(__toks, i, {k}))) AS h))"
    )
    guarded = F.when(F.size("__toks") >= k, grams).otherwise(
        F.array().cast("array<struct<s:int,h:string>>"))
    pos = (
        spread(docs).withColumn("__toks", toks)
        .select(id_col, F.explode_outer(guarded).alias("g"))
        .filter(F.col("g").isNotNull())
        .select(id_col, F.col("g.s").alias("start_pos"),
                F.col("g.h").alias("h"))
    )
    dup = (
        pos.groupBy("h")
        .agg(F.count_distinct(id_col).alias("nd"))
        .filter(F.col("nd") > 1)
        .select("h")
    )
    marked = (
        pos.join(dup, "h", "semi")
        .select(id_col, "start_pos",
                (F.col("start_pos") + (k - 1)).alias("end_pos"))
    )
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


def dedup_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Registry query: maximal duplicated 8-token spans across the
    documents corpus."""
    return duplicated_spans(load_table(spark, sf, "documents"))


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


QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "dedup_spans": (dedup_spans, DEDUP_SPANS_SQL),
}
