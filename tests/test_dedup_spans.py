"""Duplicated-span dedup: oracle match at sf0.001 plus hand-checked
span semantics (marking, merging, cross-doc requirement) and a plan
gate that the wide exchange carries gram hashes, not text."""

import pytest
from pyspark.sql import Row

from iceberg_core_spark.functions.dedup_spans import (
    CORPUS_DESPAN_SQL,
    DEDUP_SPANS_SQL,
    corpus_despan,
    dedup_spans,
    despan,
    duplicated_spans,
)
from tests.oracle import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_DIR)
    yield c
    c.close()


def test_oracle_match(spark, con):
    compare(dedup_spans(spark, SF_DIR), con, DEDUP_SPANS_SQL,
            "dedup_spans")


def _words(n, prefix):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_shared_passage_marked_in_both_docs(spark):
    shared = _words(10, "dup")  # 10 shared tokens -> 3 grams each doc
    docs = spark.createDataFrame([
        Row(doc_id=1, text=f"{_words(5, 'a')} {shared} {_words(5, 'b')}"),
        Row(doc_id=2, text=f"{_words(3, 'c')} {shared}"),
    ])
    out = {r.doc_id: (r.span_start, r.span_end, r.span_tokens)
           for r in duplicated_spans(docs).collect()}
    # doc 1: shared tokens sit at 1-based positions 6..15
    assert out[1] == (6, 15, 10)
    # doc 2: positions 4..13
    assert out[2] == (4, 13, 10)


def test_repeat_within_one_doc_only_is_not_marked(spark):
    passage = _words(8, "x")
    docs = spark.createDataFrame([
        Row(doc_id=1, text=f"{passage} {_words(4, 'y')} {passage}"),
        Row(doc_id=2, text=_words(12, "z")),
    ])
    # the gram appears twice but only inside doc 1: cross-doc distinct
    # count is 1, so nothing is marked
    assert duplicated_spans(docs).count() == 0


def test_disjoint_passages_stay_separate_spans(spark):
    p1, p2 = _words(8, "p"), _words(8, "q")
    docs = spark.createDataFrame([
        Row(doc_id=1, text=f"{p1} {_words(6, 'm')} {p2}"),
        Row(doc_id=2, text=f"{p1} {_words(9, 'n')} {p2}"),
    ])
    spans = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(docs).collect()
    )
    # doc 1: p1 at 1..8, p2 at 15..22 (6 filler tokens between)
    assert spans == [(1, 1, 8), (1, 15, 22), (2, 1, 8), (2, 18, 25)]


def test_short_docs_produce_no_grams(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text=_words(7, "s")),
        Row(doc_id=2, text=_words(7, "s")),
    ])
    # identical docs but below one gram length: no positions at all
    assert duplicated_spans(docs).count() == 0


def test_despan_oracle_match(spark, con):
    compare(corpus_despan(spark, SF_DIR), con, CORPUS_DESPAN_SQL,
            "corpus_despan")


def test_despan_owner_keeps_text_others_clipped(spark):
    shared = _words(10, "dup")
    docs = spark.createDataFrame([
        Row(doc_id=1, text=f"{_words(5, 'a')} {shared}"),
        Row(doc_id=2, text=f"{_words(3, 'c')} {shared} {_words(2, 'd')}"),
    ])
    out = {r.doc_id: r for r in despan(docs).collect()}
    # doc 1 is the min-id owner: untouched (re-joined with single spaces)
    assert out[1].n_removed == 0
    assert out[1].clean_text == f"{_words(5, 'a')} {shared}"
    # doc 2 loses exactly the 10 shared tokens, keeps its own frame
    assert out[2].n_removed == 10
    assert out[2].clean_text == f"{_words(3, 'c')} {_words(2, 'd')}"


def test_despan_fully_duplicated_doc_becomes_empty(spark):
    body = _words(9, "w")
    docs = spark.createDataFrame([
        Row(doc_id=1, text=body),
        Row(doc_id=2, text=body),
    ])
    out = {r.doc_id: r for r in despan(docs).collect()}
    assert out[1].n_removed == 0 and out[1].clean_text == body
    assert out[2].n_removed == 9 and out[2].clean_text == ""


def test_despan_preserves_original_case(spark):
    shared_lower = _words(8, "dup")
    docs = spark.createDataFrame([
        Row(doc_id=1, text=shared_lower.upper()),
        Row(doc_id=2, text=f"KeepMe {shared_lower}"),
    ])
    out = {r.doc_id: r for r in despan(docs).collect()}
    # gram identity is case-folded (both match), output keeps case
    assert out[1].clean_text == shared_lower.upper()
    assert out[2].clean_text == "KeepMe" and out[2].n_removed == 8


def test_wide_exchange_excludes_text(spark):
    """The dup-gram aggregate and the marking join shuffle md5 triples;
    the raw text column must not survive past the tokenizing project
    into any exchange."""
    plan = (
        dedup_spans(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), m.group(0)
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan


def test_despan_heavily_clipped_doc_spans(spark):
    """Span-based clipping regression (r7 verdict task): a document
    whose text is MOSTLY removals — two disjoint duplicated passages
    around a tiny own frame — must clip exactly the merged spans and
    report their count."""
    p1, p2 = _words(20, "p"), _words(12, "q")
    docs = spark.createDataFrame([
        Row(doc_id=1, text=f"{p1} xx {p2}"),
        Row(doc_id=2, text=f"{p1} keep me {p2} own tail"),
    ])
    out = {r.doc_id: r for r in despan(docs).collect()}
    assert out[1].n_removed == 0 and out[1].n_spans_removed == 0
    # doc 2 loses p1 (20 tokens) and p2 (12 tokens) as TWO spans
    assert out[2].n_removed == 32
    assert out[2].n_spans_removed == 2
    assert out[2].clean_text == "keep me own tail"


def test_despan_min_span_tokens_keeps_short_duplicates(spark):
    """The production threshold: a 10-token duplicated run is below
    min_span_tokens=16, so it stays; a 20-token run is clipped."""
    short, long = _words(10, "s"), _words(20, "l")
    docs = spark.createDataFrame([
        Row(doc_id=1, text=f"{short} {_words(3, 'a')} {long}"),
        Row(doc_id=2, text=f"{short} {_words(5, 'b')} {long}"),
    ])
    out = {r.doc_id: r
           for r in despan(docs, min_span_tokens=16).collect()}
    assert out[1].n_removed == 0
    # only the 20-token span goes; the 10-token one survives
    assert out[2].n_removed == 20 and out[2].n_spans_removed == 1
    assert out[2].clean_text == f"{short} {_words(5, 'b')}"
    # the span REPORT applies the same threshold
    spans = duplicated_spans(docs, min_span_tokens=16).collect()
    assert {(r.doc_id, r.span_tokens) for r in spans} == {(1, 20), (2, 20)}


def test_gram_exchange_carries_binary_hashes(spark):
    """The wide exchange's gram keys are 16-byte digest BYTES, not
    32-char hex strings: the tokenizing project must emit unhex(md5)
    and no exchange may carry the raw text column."""
    plan = (
        dedup_spans(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "unhex(md5(" in plan
    import re
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), m.group(0)
