#!/usr/bin/env python
"""A continuous training-data pipeline in one script: streaming
admission-deduped ingest (persisted index), continuously-maintained
aggregates, and a net changelog feeding a downstream consumer.

Run:  PYTHONPATH=. python examples/continuous_pipeline.py

The shape this demonstrates at 100 TB:
  incoming docs ──admission judge──▶ corpus table ──changelog──▶ consumers
                    (index, no          │    │
                     corpus rescan)     │    └─▶ per-lang rollup
                    rejects ──▶ quarantine     (folded per batch)
"""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from iceberg_core_spark import get_spark
from iceberg_core_spark.functions.dedup_incremental import AdmissionIndex
from iceberg_core_spark.session import load_table
from iceberg_core_spark.streaming.ingest import stream_admit_to_table
from iceberg_core_spark.table import IceTable, MaterializedRollup


def main() -> None:
    spark = get_spark("continuous_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"
    work = tempfile.mkdtemp(prefix="ice_pipeline_")
    src = os.path.join(work, "incoming")
    os.makedirs(src)
    table_root = os.path.join(work, "corpus")
    index_root = os.path.join(work, "admission_index")
    quarantine = os.path.join(work, "quarantine")

    docs = load_table(spark, sf, "documents").select("doc_id", "text")

    def ship(df, name):
        stage = os.path.join(work, "stage")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = [f for f in os.listdir(stage)
                if f.endswith(".parquet")][0]
        shutil.move(os.path.join(stage, part), os.path.join(src, name))

    # Three deliveries: a base corpus, a batch that half-duplicates it,
    # and a re-delivery of already-admitted content.
    ship(docs.filter("doc_id % 3 = 0"), "delivery_0.parquet")
    ship(docs.filter("doc_id % 3 <= 1"), "delivery_1.parquet")
    ship(docs.filter("doc_id % 3 = 1"), "delivery_2.parquet")

    # 1. Admission-filtered streaming ingest: each micro-batch is
    #    judged against the table via the persisted AdmissionIndex
    #    (exact fingerprints + MinHash-LSH near-dups; no corpus
    #    rescan), admitted rows commit, rejects are quarantined with
    #    verdicts.
    q = stream_admit_to_table(
        spark, src, table_root, docs.schema,
        partition_col=None, key_col="doc_id",
        index_root=index_root, quarantine_root=quarantine,
        max_files_per_trigger=1,  # judge each delivery separately
        trigger={"availableNow": True},
        checkpoint_dir=os.path.join(work, "ckpt"),
    )
    assert q.awaitTermination(300)

    table = IceTable(spark, table_root)
    n_admitted = table.scan().count()
    n_quarantined = (spark.read.parquet(quarantine).count()
                     if os.path.isdir(quarantine) else 0)
    print(f"admitted {n_admitted} docs, quarantined {n_quarantined}")

    # 2. Continuous aggregate: a rollup folded forward from the
    #    table's net changelog — here refreshed once at the end; pass
    #    rollups=[...] to stream_ingest_to_table to fold per batch.
    table = IceTable(spark, table_root)
    enriched_root = os.path.join(work, "corpus_meta")
    meta = table.scan().withColumn("n_chars", F.length("text")) \
        .withColumn("lang_bucket", (F.col("doc_id") % 4).cast("string"))
    mt = IceTable.create(spark, enriched_root, meta,
                         partition_col=None, key_col="doc_id")
    rollup = MaterializedRollup(spark, os.path.join(work, "rollup"),
                                group_cols=["lang_bucket"],
                                sum_cols=["n_chars"])
    rollup.refresh(mt)
    print("rollup:")
    rollup.read().orderBy("lang_bucket").show(truncate=False)

    # 3. Net changelog: what changed between the first commit and now
    #    — compactions invisible, updates as delete+insert pairs.
    first = table.manifest.snapshots(load_files=False)[0].snapshot_id
    changes = table.scan_changes(since=first)
    counts = dict(
        (r["_change_type"], r["n"])
        for r in changes.groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n")).collect())
    print(f"changelog since first commit: {counts}")

    shutil.rmtree(work)
    print("PIPELINE OK")


if __name__ == "__main__":
    main()
