"""Corpus-assembly ops (quality signals, PII redaction, vocab, mixture,
shuffle): DuckDB oracle parity for every registered query, plus
semantic unit tests on crafted inputs the testdata can't cover."""

import pytest
from pyspark.sql import functions as F

from iceberg_core_spark.functions.assembly import QUERIES as ASSEMBLY
from iceberg_core_spark.functions.assembly import shuffle_assign
from iceberg_core_spark.functions.quality import (
    QUERIES as QUALITY,
    pii_counts,
    redact_pii,
    repetition_signals,
)
from iceberg_core_spark.functions.vocab import QUERIES as VOCAB
from tests.oracle import compare, duck_connection

QUERIES = {**QUALITY, **VOCAB, **ASSEMBLY}

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_DIR)
    yield c
    c.close()


CASES = [(n, fn, sql) for n, (fn, sql) in QUERIES.items()]


@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_corpus_oracle_match(spark, con, name, fn, sql):
    compare(fn(spark, SF_DIR), con, sql, name)


# ---------------------------------------------------------------------------
# semantic checks
# ---------------------------------------------------------------------------


def test_repetition_signals_crafted(spark):
    df = spark.createDataFrame(
        [
            (1, "en", "a a a a"),       # one token repeated
            (2, "en", "w x y z"),       # all distinct
            (3, "en", "solo"),          # no bigram population
        ],
        "doc_id long, lang string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in repetition_signals(df).collect()
    }
    r1 = out[1]
    assert r1["n_tokens"] == 4 and r1["n_distinct"] == 1
    assert r1["rep_ratio"] == 0.75
    assert r1["top_tok_frac"] == 1.0 and r1["top_bigram_frac"] == 1.0
    r2 = out[2]
    assert r2["rep_ratio"] == 0.0 and r2["top_tok_frac"] == 0.25
    assert r2["top_bigram_frac"] == pytest.approx(1 / 3, abs=1e-6)
    r3 = out[3]
    assert r3["n_tokens"] == 1 and r3["top_bigram_frac"] is None


def test_redact_pii_removes_every_match(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "from 192.168.1.254 and 10.0.0.1 routes"),
            (3, "call +44 123 4567 or +1 555 0100 today"),
            (4, "clean text with no identifiers at all"),
        ],
        "id long, text string",
    )
    red = df.select(
        "id", redact_pii(F.col("text")).alias("clean"),
        *[v.alias(k) for k, v in pii_counts(F.col("text")).items()],
    )
    rows = {r["id"]: r for r in red.collect()}
    assert rows[1]["n_emails"] == 1 and "<EMAIL>" in rows[1]["clean"]
    assert rows[2]["n_ips"] == 2 and rows[2]["clean"].count("<IP>") == 2
    assert rows[3]["n_phones"] == 2
    assert rows[4]["clean"] == "clean text with no identifiers at all"
    # residual scan: nothing PII-shaped survives redaction
    resid = red.select(
        *[v.alias(k) for k, v in pii_counts(F.col("clean")).items()]
    ).agg(F.sum("n_emails"), F.sum("n_ips"), F.sum("n_phones")).collect()[0]
    assert tuple(resid) == (0, 0, 0)


def test_shuffle_assign_is_partition(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    out = shuffle_assign(df, n_shards=4)
    assert out.count() == 1000
    # every doc exactly once
    assert out.select("doc_id").distinct().count() == 1000
    # positions are contiguous 1..k within each shard
    per = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
        F.countDistinct("pos").alias("nd"),
    ).collect()
    assert len(per) == 4
    for r in per:
        assert (r["lo"], r["hi"], r["nd"]) == (1, r["n"], r["n"])
    # roughly uniform (binomial 1000/4 ± 5 sigma)
    for r in per:
        assert 180 <= r["n"] <= 320


def test_vocab_topk_rank_contract(spark):
    out = VOCAB["vocab_topk"][0](spark, SF_DIR).collect()
    # synthetic vocab is tiny (31 words at sf0.001) — k caps, not pads
    assert 1 <= len(out) <= 100
    ranks = sorted(r["rnk"] for r in out)
    assert ranks == list(range(1, len(out) + 1))
    by_rank = sorted(out, key=lambda r: r["rnk"])
    tfs = [r["tf"] for r in by_rank]
    assert tfs == sorted(tfs, reverse=True)


def test_mixture_temperature_invariants(spark):
    """T=2 mixture model-checked against the closed form: rate_i =
    min_j(n_j/√n_j)·√n_i/n_i = √(min_j n_j / n_i) — the smallest
    source keeps everything, larger sources downsample by the sqrt of
    the mass ratio; zero-token sources rate 0; T→∞-ish behavior
    sanity (temperatures above 1 compress spread)."""
    import math

    from iceberg_core_spark.functions.assembly import (
        mixture_plan_temperature,
    )

    df = spark.createDataFrame(
        [("a", "tok " * 100), ("a", "tok " * 100),
         ("b", "tok " * 800), ("c", "tok " * 50), ("d", "")],
        "source string, text string")
    out = {r["source"]: r for r in
           mixture_plan_temperature(df, 2.0).collect()}
    masses = {"a": 200, "b": 800, "c": 50, "d": 0}
    assert {s: r["n_tokens"] for s, r in out.items()} == masses
    assert out["c"]["rate"] == 1.0          # smallest source: keep all
    assert out["d"]["rate"] == 0.0          # empty source
    for s in ("a", "b"):
        want = round(math.sqrt(50 / masses[s]), 6)
        assert out[s]["rate"] == pytest.approx(want, abs=2e-6), s
    # rates order inversely with mass, and downsampling is gentler
    # than equal-share (sqrt vs linear): sqrt(50/800) > 50/800
    assert out["b"]["rate"] < out["a"]["rate"] < 1.0
    assert out["b"]["rate"] > 50 / 800
    with pytest.raises(ValueError, match="temperature"):
        mixture_plan_temperature(df, 0.0)


def test_mixture_plan_invariants(spark):
    rows = ASSEMBLY["corpus_mix"][0](spark, SF_DIR).collect()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    budget = sum(r["n_tokens"] for r in rows) / len(rows)
    for r in rows:
        if r["n_tokens"] <= budget:
            assert r["rate"] == 1.0
        else:
            assert r["rate"] < 1.0
            assert r["rate"] == pytest.approx(
                budget / r["n_tokens"], abs=1e-5
            )


def test_ngram_exact_catches_substring_quote(spark):
    """The differentiator vs Jaccard decontamination: a long training
    doc QUOTING a short benchmark item verbatim is flagged by exact
    n-gram collision even though whole-doc similarity is far below any
    Jaccard threshold."""
    from iceberg_core_spark.functions.decontam import (
        decontaminate,
        decontaminate_ngram_exact,
    )

    quote = "what is the capital of france paris"
    filler = " ".join(f"w{i}" for i in range(300))
    train = spark.createDataFrame(
        [(1, f"{filler} {quote} {filler}", "en", len(filler) * 2 + 40),
         (2, f"{filler} nothing shared here", "en", len(filler) + 20)],
        "doc_id long, text string, lang string, n_chars long",
    )
    eval_df = spark.createDataFrame(
        [(100, quote, "en", len(quote))],
        "doc_id long, text string, lang string, n_chars long",
    )
    hits = decontaminate_ngram_exact(train, eval_df, n=5).collect()
    assert [r["doc_id"] for r in hits] == [1]
    assert hits[0]["n_collisions"] == 3  # 7 tokens → three 5-grams
    # whole-doc Jaccard misses it: 7 shared tokens vs 300+300 filler
    jac = decontaminate(train, eval_df, length_tol=10**9,
                        threshold=0.5).collect()
    assert jac == []


def test_redact_pii_mixed_case_email(spark):
    df = spark.createDataFrame(
        [(1, "Reach Bob.Smith@Corp.Example.ORG today")],
        "id long, text string",
    )
    row = df.select(
        redact_pii(F.col("text")).alias("clean"),
        *[v.alias(k) for k, v in pii_counts(F.col("text")).items()],
    ).collect()[0]
    assert row["n_emails"] == 1
    assert row["clean"] == "Reach <EMAIL> today"


def test_write_shards_layout_and_order(spark, tmp_path):
    """write_shards materializes shard=N dirs whose contents, ordered
    by pos, are exactly the shuffle_assign permutation with payload
    intact — and the assignment agrees with shuffle_assign exactly."""
    import os

    from iceberg_core_spark.functions.assembly import write_shards

    df = spark.range(0, 500).selectExpr(
        "id AS doc_id", "concat('payload-', id) AS text")
    root = str(tmp_path / "shards")
    write_shards(df, root, n_shards=4)

    dirs = sorted(d for d in os.listdir(root) if d.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(4)]
    back = spark.read.parquet(root)
    assert back.count() == 500
    assert back.select("doc_id").distinct().count() == 500
    # agrees with the pure assignment op
    want = {r["doc_id"]: (r["shard"], r["pos"])
            for r in shuffle_assign(df, n_shards=4).collect()}
    got = {r["doc_id"]: (r["shard"], r["pos"]) for r in back.collect()}
    assert got == want
    # payload survived the shuffle
    row = back.filter("doc_id = 123").collect()[0]
    assert row["text"] == "payload-123"
