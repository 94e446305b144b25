#!/usr/bin/env python
"""The time-series retention-tier story in one script: raw events
stream into a table; an OhlcRollup keeps 1-hour candles current per
micro-batch (folded, never recomputed); the batch family answers the
dashboard queries (sessionize / gapfill / downsample); and a shallow
clone hands an analyst an independent copy without moving a byte.

Run:  PYTHONPATH=. python examples/timeseries_tiers.py

The shape this demonstrates at 100 TB:
  raw events ──stream ingest──▶ events table ──clone──▶ analyst sandbox
                   │ (per-batch fold)   │
                   └─▶ 1h OHLC candles  └─▶ sessionize / gapfill
                       (bounded: keys × buckets)
"""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from iceberg_core_spark import get_spark
from iceberg_core_spark.operators.timeseries import (
    downsample_ohlc,
    gapfill_locf,
    sessionize,
)
from iceberg_core_spark.session import load_table
from iceberg_core_spark.streaming.ingest import stream_ingest_to_table
from iceberg_core_spark.table import IceTable, OhlcRollup

STEP_US = 3_600_000_000  # 1h candles


def main() -> None:
    spark = get_spark("timeseries_tiers")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ice_ts_")
    src = os.path.join(work, "incoming")
    os.makedirs(src)
    table_root = os.path.join(work, "events")

    # stage the driver events table as two stream deliveries
    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type", "ts", "value")
    half1 = ev.filter("event_id % 2 = 0")
    half2 = ev.filter("event_id % 2 = 1")
    for i, part in enumerate((half1, half2)):
        part.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(work, f"_stage{i}"))
        name = [n for n in os.listdir(os.path.join(work, f"_stage{i}"))
                if n.endswith(".parquet")][0]
        shutil.move(os.path.join(work, f"_stage{i}", name),
                    os.path.join(src, f"delivery-{i}.parquet"))

    candles = OhlcRollup(
        spark, os.path.join(work, "candles"),
        group_cols=["event_type"], ts_col="ts", value_col="value",
        tiebreak_col="event_id", step_us=STEP_US)

    # one availableNow drain picks up both deliveries; the rollup
    # folds once per micro-batch commit
    q = stream_ingest_to_table(
        spark, src, table_root, ev.schema,
        partition_col="event_type", key_col="event_id",
        trigger={"availableNow": True},
        checkpoint_dir=os.path.join(work, "ckpt"),
        rollups=[candles])
    assert q.awaitTermination(300)

    t = IceTable(spark, table_root)
    n = t.scan().count()
    print(f"ingested {n} events "
          f"(snapshot {t.manifest.current_snapshot_id()})")

    got = candles.read()
    print(f"candle store: {got.count()} (type, hour) candles")
    got.orderBy("event_type", "bucket").show(5, truncate=False)

    # the folded store IS the from-scratch downsample
    recomputed = downsample_ohlc(
        t.scan(), "event_type", "ts", "value",
        tiebreak_col="event_id", step_us=STEP_US)
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, recomputed.collect())), "fold != recompute"
    print("fold == from-scratch recompute: OK")

    # batch tier: sessions and gap-filled hourly means off the table
    sess = sessionize(t.scan(), user_col="user_id", ts_col="ts")
    print(f"sessions: {sess.count()}")
    hourly = (
        t.scan().groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("bucket"))
        .agg((F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
              / F.count("value")).alias("avg_value"))
    )
    filled = gapfill_locf(hourly, "event_type", "bucket", "avg_value")
    print(f"gap-filled hourly grid: {filled.count()} rows "
          f"({filled.filter('was_gap = 1').count()} filled)")

    # analyst sandbox: a shallow clone — no data bytes copied, and
    # commits to it are invisible to the production table
    sandbox = t.clone(os.path.join(work, "sandbox"))
    sandbox.delete_where("value > 100", mode="cow")
    print(f"sandbox rows after analyst delete: {sandbox.scan().count()}"
          f" (production untouched: {t.scan().count()})")

    shutil.rmtree(work)
    spark.stop()


if __name__ == "__main__":
    main()
