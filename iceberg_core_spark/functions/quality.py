"""Repetition-based quality signals and PII redaction — the two
standard "clean the crawl" passes of a training-data pipeline
(public precedent: the Gopher/MassiveText repetition filters and the
C4/CCNet-style scrubbing passes).

The reference has no text processing at all (SURVEY.md §2.C); this is
north-star pipeline surface on top.

Scale shapes
------------
``repetition_signals``: documents explode ONCE into (doc_id, gram)
rows covering unigrams AND bigrams (bigrams carry an embedded space so
the two populations can't collide — tokens are whitespace-split (explicit class, text.WS_RE) and never
contain one), then two hash aggregations: (doc, gram) → count, then
doc → {max count per population, totals}. Both aggregate map-side
first (partial aggregation), so the one shuffle moves near-distinct
(doc, gram) pairs, not raw token occurrences. No window, no driver
state — the same plan runs at 100 TB with the doc id as the natural
parallelism unit.

``redact_pii``: pure Column ``regexp_replace``/``regexp_extract_all``
chain — whole-stage codegen, zero Python, embarrassingly parallel.
Patterns are deliberately RE2-safe (no backrefs/lookaround) so the
DuckDB oracle evaluates the identical language.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_core_spark.functions.dedup import fround, fround_sql
from iceberg_core_spark.functions.text import ws_tokens_nonempty
from iceberg_core_spark.session import load_table

# ---------------------------------------------------------------------------
# repetition signals (Gopher-style)
# ---------------------------------------------------------------------------


def _ws_tokens(text: Column) -> Column:
    """The canonical lowercase/split/drop-empties tokenizer — shared
    with search.py and lm_quality.py via functions/text.py."""
    return ws_tokens_nonempty(text)


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_cols: tuple = ("doc_id", "lang")
) -> DataFrame:
    """Per-document repetition profile:

    - ``n_tokens``      total whitespace tokens
    - ``n_distinct``    distinct tokens
    - ``rep_ratio``     1 - distinct/total (duplicate-token mass)
    - ``top_tok_frac``  most frequent token's share of all tokens
    - ``top_bigram_frac`` most frequent bigram's share of all bigrams
      (NULL for single-token docs — no bigram population exists)

    The classic repetition filter thresholds these (e.g. drop docs with
    top_bigram_frac > 0.18); emitting the raw signals keeps the
    thresholding declarative and the query oracle-checkable.
    """
    from iceberg_core_spark.session import spread

    toks = _ws_tokens(F.col(text_col))
    # spread() first: tokenization is the CPU hot spot and must not
    # inherit a single-file scan's one-task parallelism. No explicit
    # size>=1 filter and explode_OUTER, for the same reason: a
    # deterministic array-size guard (explicit, or inferred from plain
    # explode by InferFiltersFromGenerate) pushes through the exchange
    # to the scan and re-evaluates the whole tokenize there; the outer
    # explode emits NULL for empty docs, dropped right after the
    # Generate — zero-token docs are absent from the output either way
    d = spread(df).withColumn("__t", toks)
    bigrams = F.expr(
        "transform(sequence(1, size(__t) - 1), "
        "i -> concat(element_at(__t, i), ' ', element_at(__t, i + 1)))"
    )
    # one explode covers both gram populations; single-token docs get
    # sequence(1, 0) = [] for bigrams and concat keeps just the tokens
    grams = F.concat(
        F.col("__t"),
        F.when(F.size("__t") >= 2, bigrams).otherwise(F.array()),
    )
    ids = [F.col(c) for c in id_cols]
    exploded = d.select(*ids, F.explode_outer(grams).alias("gram")) \
        .filter(F.col("gram").isNotNull())
    counted = exploded.groupBy(*ids, "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    is_uni = ~F.col("gram").contains(" ")
    stats = counted.groupBy(*ids).agg(
        F.sum(F.when(is_uni, F.col("cnt"))).alias("n_tokens"),
        F.count(F.when(is_uni, F.lit(1))).alias("n_distinct"),
        F.max(F.when(is_uni, F.col("cnt"))).alias("__top_tok"),
        F.sum(F.when(~is_uni, F.col("cnt"))).alias("__n_big"),
        F.max(F.when(~is_uni, F.col("cnt"))).alias("__top_big"),
    )
    return stats.select(
        *ids,
        F.col("n_tokens"),
        F.col("n_distinct"),
        fround(1.0 - F.col("n_distinct") / F.col("n_tokens"), 6).alias(
            "rep_ratio"
        ),
        fround(F.col("__top_tok") / F.col("n_tokens"), 6).alias(
            "top_tok_frac"
        ),
        fround(
            F.col("__top_big") / F.nullif(F.col("__n_big"), F.lit(0)), 6
        ).alias("top_bigram_frac"),
    )


def corpus_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Registry query: repetition profile of every document."""
    return repetition_signals(load_table(spark, sf, "documents"))


CORPUS_QUALITY_SQL = f"""
WITH d AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                     x -> x <> '') AS t
  FROM documents
), nonempty AS (
  SELECT * FROM d WHERE len(t) >= 1
), g AS (
  SELECT doc_id, lang, u.gram AS gram
  FROM nonempty,
       UNNEST(list_concat(
         t,
         list_transform(list_zip(t[1:len(t) - 1], t[2:len(t)]),
                        x -> x[1] || ' ' || x[2])
       )) AS u(gram)
), c AS (
  SELECT doc_id, lang, gram, COUNT(*) AS cnt
  FROM g GROUP BY 1, 2, 3
), s AS (
  SELECT doc_id, lang,
         SUM(CASE WHEN NOT contains(gram, ' ') THEN cnt END) AS n_tokens,
         COUNT(CASE WHEN NOT contains(gram, ' ') THEN 1 END) AS n_distinct,
         MAX(CASE WHEN NOT contains(gram, ' ') THEN cnt END) AS top_tok,
         SUM(CASE WHEN contains(gram, ' ') THEN cnt END) AS n_big,
         MAX(CASE WHEN contains(gram, ' ') THEN cnt END) AS top_big
  FROM c GROUP BY 1, 2
)
SELECT doc_id, lang,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       {fround_sql('1.0 - n_distinct / CAST(n_tokens AS DOUBLE)', 6)}
         AS rep_ratio,
       {fround_sql('top_tok / CAST(n_tokens AS DOUBLE)', 6)}
         AS top_tok_frac,
       {fround_sql('top_big / CAST(NULLIF(n_big, 0) AS DOUBLE)', 6)}
         AS top_bigram_frac
FROM s
"""


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# RE2-safe (and Java-regex-identical) patterns: character classes and
# bounded counts only — no backreferences, no lookaround. Case covered
# by explicit classes rather than (?i) so the pattern text needs no
# dialect-specific flag handling.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,2}[ -]\d{3}[ -]\d{4}"

# Redaction order matters and is part of the contract: emails first
# (their local/domain parts may contain digit runs an IP/phone pattern
# could bite into), then IPs, then phones. Placeholders are uppercase
# with no digits, so later patterns can't match inside an earlier
# replacement.
_PASSES = [(EMAIL_RE, "<EMAIL>"), (IPV4_RE, "<IP>"), (PHONE_RE, "<PHONE>")]


def pii_counts(text: Column) -> dict[str, Column]:
    """Match counts per PII class (pre-redaction)."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)),
        "n_ips": F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), 0)),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0)),
    }


def redact_pii(text: Column) -> Column:
    """Replace every email/IPv4/phone match with a typed placeholder."""
    out = text
    for pattern, placeholder in _PASSES:
        out = F.regexp_replace(out, pattern, placeholder)
    return out


def corpus_pii(spark: SparkSession, sf: str) -> DataFrame:
    """Registry query: detect-and-redact over the documents table.

    The synthetic corpus contains no PII, so the query appends a
    deterministic contact line (email + IP + phone derived from
    doc_id) before scrubbing — the redaction path is exercised on
    every row and the oracle reproduces the identical augmentation.
    Output: per-doc match counts plus the md5 of the scrubbed text
    (proves byte-identical redaction without shipping the text).
    """
    d = load_table(spark, sf, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com ip 10.0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(".7 tel +1 555 01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
    )
    d = d.withColumn("__aug", aug)
    counts = pii_counts(F.col("__aug"))
    return d.select(
        "doc_id",
        *[c.alias(name) for name, c in counts.items()],
        F.md5(redact_pii(F.col("__aug"))).alias("clean_fp"),
    )


CORPUS_PII_SQL = f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com ip 10.0.'
              || CAST(doc_id % 250 AS VARCHAR)
              || '.7 tel +1 555 01'
              || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS a
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(a, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(a, '{IPV4_RE}')) AS n_ips,
       len(regexp_extract_all(a, '{PHONE_RE}')) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(a,
             '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{IPV4_RE}', '<IP>', 'g'),
             '{PHONE_RE}', '<PHONE>', 'g')) AS clean_fp
FROM aug
"""


QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "corpus_quality": (corpus_quality, CORPUS_QUALITY_SQL),
    "corpus_pii": (corpus_pii, CORPUS_PII_SQL),
}
