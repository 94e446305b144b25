"""Unigram LM scoring: hand-computed logprobs on a constructed corpus,
OOV handling on a train/score split, and the cross-engine oracle."""

import math

import pytest

from iceberg_core_spark.functions.lm_quality import (
    QUERIES,
    lm_score,
    unigram_model,
)
from tests.oracle import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"


def test_lm_score_matches_hand_computation(spark):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           lm_score(docs, unigram_model(docs)).collect()}
    # corpus counts: a=2 b=2 c=1, total 5
    q = {t: round(math.log(c / 5), 9) for t, c in
         (("a", 2), ("b", 2), ("c", 1))}
    assert out[1]["n_tokens"] == 3 and out[1]["n_oov"] == 0
    assert out[1]["lm_logprob_per_token"] == pytest.approx(
        (2 * q["a"] + q["b"]) / 3, abs=1e-9)
    assert out[2]["lm_logprob_per_token"] == pytest.approx(
        (q["b"] + q["c"]) / 2, abs=1e-9)
    # doc 2 uses the rarer token: it must score lower
    assert (out[2]["lm_logprob_per_token"]
            < out[1]["lm_logprob_per_token"])


def test_lm_score_oov_counts_in_denominator(spark):
    train = spark.createDataFrame(
        [(1, "a a b b")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(9, "a zzz")], "doc_id long, text string")
    [r] = lm_score(score, unigram_model(train)).collect()
    # zzz is OOV: dropped from the sum, kept in the denominator
    assert r["n_tokens"] == 2 and r["n_oov"] == 1
    assert r["lm_logprob_per_token"] == pytest.approx(
        round(math.log(0.5), 9) / 2, abs=1e-9)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_lm_quality_oracle_match(spark, name):
    fn, sql = QUERIES[name]
    con = duck_connection(SF_DIR)
    compare(fn(spark, SF_DIR), con, sql, name)


def test_lm_score_keeps_empty_docs_visible(spark):
    """A degenerate empty/whitespace doc must APPEAR in the output
    (n_tokens=0, NULL score) — a quality pass that never sees it
    would wave it through unexamined."""
    docs = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, "   ")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           lm_score(docs, unigram_model(docs)).collect()}
    assert set(out) == {1, 2, 3}
    for d in (2, 3):
        assert out[d]["n_tokens"] == 0 and out[d]["n_oov"] == 0
        assert out[d]["lm_logprob_per_token"] is None
    assert out[1]["n_tokens"] == 2
