#!/usr/bin/env python
"""Quickstart: the engine end-to-end in one script.

Run:  PYTHONPATH=. python examples/quickstart.py
"""

import datetime
import shutil
import tempfile

from pyspark.sql import functions as F

from iceberg_core_spark import get_spark
from iceberg_core_spark.functions.dedup import minhash_lsh_pairs
from iceberg_core_spark.functions.similarity import cosine_topk
from iceberg_core_spark.operators import asof_join
from iceberg_core_spark.session import load_table
from iceberg_core_spark.table import IceTable


def main() -> None:
    spark = get_spark("quickstart")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"
    work = tempfile.mkdtemp(prefix="ice_quickstart_")

    # 1. Ingest into the table layer: partitioned on user_id, clustered
    #    on ts, per-file min/max stats in the manifest.
    events = load_table(spark, sf, "events")
    table = IceTable.create(
        spark, f"{work}/events", events,
        partition_col="user_id", key_col="ts",
    )
    print(f"table created: {table.file_count()} files")

    # 2. The reference-shaped range query — manifest pruning + pushdown.
    rows = table.query(
        partition=7,
        lo=datetime.datetime(2024, 1, 5),
        hi=datetime.datetime(2024, 1, 20),
    )
    print(f"range query: {rows.count()} events for user 7")

    # 3. Row-level changes: merge-on-read delete, then compact it away.
    table.delete_where("event_type = 'error'", mode="mor")
    print(f"after MoR delete: {table.scan().count()} rows (metadata-only)")
    table.compact(min_files=2)
    print(f"after compact: {table.file_count()} files, "
          f"{len(table.manifest.load().delete_predicates)} pending deletes")

    # 4. SQL over the table.
    table.to_view("events_v")
    spark.sql("""
        SELECT event_type, COUNT(*) AS n
        FROM events_v GROUP BY event_type ORDER BY n DESC
    """).show(5, truncate=False)

    # 4b. CDC apply: one change batch (an update and a delete, as
    #     full-row images) merged in a single commit. The partition
    #     column rides in the keys, so only touched partitions rewrite;
    #     mode="mor" would instead append the rows plus an
    #     equality-delete key file (O(batch), zero rewrites).
    from pyspark.sql.types import StringType, StructField, StructType

    r_upd, r_del = table.scan().dropDuplicates(
        ["user_id", "ts"]).limit(2).collect()
    cdc_schema = StructType(
        list(table.schema().fields) + [StructField("op", StringType())])
    batch = spark.createDataFrame(
        [{**r_upd.asDict(), "value": 99.9, "op": "U"},
         {**r_del.asDict(), "op": "D"}], cdc_schema)
    n_before = table.scan().count()
    table.apply_cdc(batch, key_cols=["user_id", "ts"], op_col="op")
    print(f"CDC apply: {n_before} -> {table.scan().count()} rows "
          f"(one update, one delete)")

    # 4c. Metadata tables: the compaction planner's view.
    table.partitions_df().orderBy(F.col("total_bytes").desc()).show(3)
    print("history:", [r.operation for r in
                       table.history_df().orderBy("snapshot_id").collect()])

    # 5. As-of join: each purchase matched to the user's latest click.
    purchases = events.filter(F.col("event_type") == "purchase")
    clicks = events.filter(F.col("event_type") == "click") \
        .select("user_id", "ts", F.col("event_id").alias("click_id"))
    matched = asof_join(purchases, clicks, on="user_id",
                        left_ts="ts", right_ts="ts",
                        right_payload=["click_id"])
    print(f"as-of join: {matched.filter(F.col('click_id').isNotNull()).count()}"
          f"/{matched.count()} purchases have a preceding click")

    # 6. LLM-data ops: near-duplicate docs + similarity search.
    docs = load_table(spark, sf, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    print(f"minhash-LSH near-dup pairs: {pairs.count()}")

    emb = load_table(spark, sf, "embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    topk = cosine_topk(emb.filter(F.col("vec_id") != 0), q, k=5)
    print("top-5 neighbors of vec 0:",
          [(r.vec_id, r.sim) for r in topk.collect()])

    # 7. Corpus assembly: quality-gate, plan the source mixture, and
    #    deal the surviving docs into reproducible training shards.
    from iceberg_core_spark.functions.assembly import (
        mixture_plan, shuffle_assign)
    from iceberg_core_spark.functions.quality import repetition_signals

    signals = repetition_signals(docs)
    kept = docs.join(
        signals.filter(F.col("top_tok_frac") <= 0.5).select("doc_id"),
        "doc_id")
    print(f"quality gate: {docs.count()} -> {kept.count()} docs")
    mixture_plan(kept).orderBy(F.col("share").desc()).show(3)
    shards = shuffle_assign(kept)
    print("shard sizes:", sorted(
        (r.shard, r.n) for r in
        shards.groupBy("shard").agg(F.count("*").alias("n")).collect()))

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
