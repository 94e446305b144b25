"""Capstone batch composition: the full training-corpus assembly runs
as one chain of library ops over the real documents table — quality
gate → exact dedup → eval decontamination (exact n-gram) → mixture
rates → token-budget packing → deterministic shard materialization —
with an invariant checked at every stage. This is the 'a user of the
reference could run their whole pipeline here' story in one test."""

import os

from pyspark.sql import functions as F

from iceberg_core_spark.functions import text as T
from iceberg_core_spark.functions.assembly import (
    mixture_plan,
    shuffle_assign,
    write_shards,
)
from iceberg_core_spark.functions.decontam import decontaminate_ngram_exact
from iceberg_core_spark.functions.packing import pack_sequences
from iceberg_core_spark.functions.quality import repetition_signals
from iceberg_core_spark.functions.sampling import sample_stratified
from iceberg_core_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_full_corpus_assembly_chain(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()

    # 1. quality gate: drop the most repetitive tail (signals join)
    sig = repetition_signals(docs)
    kept_ids = sig.filter(
        (F.col("rep_ratio") <= 0.99) & (F.col("n_tokens") >= 5)
    ).select("doc_id")
    stage1 = docs.join(kept_ids, "doc_id")
    n1 = stage1.count()
    assert 0 < n1 <= n0

    # 2. exact dedup on the normalized fingerprint — keep min doc_id
    fp = stage1.withColumn("fp", T.fingerprint(F.col("text")))
    keep = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    stage2 = stage1.join(keep.select("doc_id"), "doc_id")
    n2 = stage2.count()
    assert n2 <= n1
    # dedup is idempotent
    fp2 = stage2.withColumn("fp", T.fingerprint(F.col("text")))
    assert fp2.select("fp").distinct().count() == n2

    # 3. decontaminate vs the pseudo eval split
    eval_df = docs.filter("doc_id % 53 = 0")
    train = stage2.filter("doc_id % 53 <> 0")
    dirty = decontaminate_ngram_exact(train, eval_df, n=4) \
        .select("doc_id")
    stage3 = train.join(dirty, "doc_id", "left_anti")
    n3 = stage3.count()
    assert n3 < train.count()  # the corpus has planted near-copies
    # nothing contaminated survives
    assert decontaminate_ngram_exact(stage3, eval_df, n=4).count() == 0

    # 4. mixture plan feeds stratified sampling by source
    plan = {r["source"]: r["rate"]
            for r in mixture_plan(stage3).collect()}
    stage4 = sample_stratified(stage3, "source", plan, salt="mix")
    per_src = dict(stage4.groupBy("source").count().collect())
    for src, rate in plan.items():
        if rate == 1.0:  # under-budget sources keep every doc
            before = stage3.filter(F.col("source") == src).count()
            assert per_src.get(src, 0) == before

    # 5. pack into 256-token bins per lang: exact model check — the
    # quotient packer's contract is bin = floor(exclusive-prefix/256)
    # in doc_id order within each lang (NOT "every bin fills to
    # budget": an overshooting doc legitimately leaves the next bin
    # short)
    packed = pack_sequences(stage4, budget=256)
    rows = sorted(packed.collect(),
                  key=lambda r: (r["lang"], r["doc_id"]))
    run: dict = {}
    for r in rows:
        excl = run.get(r["lang"], 0)
        assert r["bin_id"] == excl // 256, (r, excl)
        run[r["lang"]] = excl + r["n_tokens"]

    # 6. shard deal + materialization: a permutation of stage4
    root = str(tmp_path / "shards")
    write_shards(stage4, root, n_shards=4)
    back = spark.read.parquet(root)
    assert back.count() == stage4.count()
    assert (back.select("doc_id").distinct().count()
            == stage4.select("doc_id").distinct().count())
    assigned = shuffle_assign(stage4, n_shards=4)
    a = {r["doc_id"]: (r["shard"], r["pos"]) for r in assigned.collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"]) for r in back.collect()}
    assert a == b
    assert len(os.listdir(root)) >= 4  # shard=N dirs (+ _SUCCESS)
