"""Text analysis: tokenization, quality scoring, language ID,
fingerprinting. Pure Column expressions (whole-stage codegen; zero
Python in the data path) so they run unchanged at 100 TB.

Reference has no text ops at all (SURVEY.md §2.C); this is north-star
surface. Every function has an exact DuckDB-SQL twin in llm_queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword lists (language-ID heuristic signal).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "que", "en", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "un"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit"],
    "zh": ["的", "是", "了", "在", "和"],
}
# Deterministic argmax preference order on ties.
LANG_ORDER = ["en", "es", "fr", "de", "zh"]

# Whitespace spelled as an explicit class, identical in Java regex
# (Spark) and RE2 (DuckDB oracles): Java's \s includes U+000B
# (vertical tab) but RE2's does not, so the \s shorthand silently
# diverges on \x0B text. This class IS Java's \s, so Spark-side
# behavior — and every recorded driver row — is unchanged; the SQL
# oracles now share the exact same pattern language.
WS_RE = r"[ \t\n\x0B\f\r]"

# "BPE-ish" token pattern: word runs or single punctuation marks
# (non-word, non-whitespace — whitespace via the shared explicit class).
TOKEN_RE = r"\w+|[^\w \t\n\x0B\f\r]"
PUNCT_RE = r"[.,!?;:]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens (lowercased)."""
    return F.split(F.lower(text), WS_RE + "+")


def ws_tokens_nonempty(text: Column) -> Column:
    """Whitespace tokens, lowercased, empties dropped (split() emits
    '' for leading/trailing whitespace; both engines filter it). The
    ONE canonical tokenizer for quality/search/LM scoring — a
    tokenization fix must land here, not in per-module copies."""
    return F.filter(ws_tokens(text), lambda t: t != F.lit(""))


def bpe_tokens(text: Column) -> Column:
    """Regex word/punct tokens — a tokenizer-grade count proxy."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0)


def token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text))


def stopword_hits(text: Column, lang: str) -> Column:
    """Non-distinct count of stopword occurrences for one language."""
    stoplist = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(ws_tokens(text), lambda t: F.array_contains(stoplist, t)))


def lang_id(text: Column) -> Column:
    """Argmax of per-language stopword hits, ties broken by LANG_ORDER.
    Heuristic n-gram-free language ID; deterministic by construction."""
    hits = {lang: stopword_hits(text, lang) for lang in LANG_ORDER}
    best = F.greatest(*hits.values())
    expr = F.lit("unknown")
    for lang in reversed(LANG_ORDER):
        expr = F.when(hits[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("unknown"))


def punct_ratio(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(PUNCT_RE), 0)) / F.length(text)


def stopword_ratio(text: Column) -> Column:
    """All-language stopword tokens / total tokens."""
    all_words = sorted({w for ws in STOPWORDS.values() for w in ws})
    stoplist = F.array(*[F.lit(w) for w in all_words])
    toks = ws_tokens(text)
    return F.size(F.filter(toks, lambda t: F.array_contains(stoplist, t))) / F.size(toks)


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish quality heuristic: stopword density (fluency),
    low punctuation noise, and adequate length. IEEE-deterministic."""
    return (
        0.5 * stopword_ratio(text)
        + 0.3 * (1.0 - punct_ratio(text))
        + 0.2 * F.least(F.lit(1.0), F.size(ws_tokens(text)) / 100.0)
    )


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint: md5 over lowercased,
    whitespace-collapsed, trimmed text. Identical content → identical
    fingerprint across engines and runs (the reference's content-hash
    idea, block.go:94-107, applied per document)."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"[ \t\n\x0B\f\r]+", " "))
    return F.md5(norm)
