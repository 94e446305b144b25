"""applyInPandasWithState operator: state persists across micro-batches
and the final emission matches the batch groupBy twin."""

import os
import shutil

from pyspark.sql import functions as F

from iceberg_core_spark.session import load_table
from iceberg_core_spark.streaming.stateful import running_user_stats

SF_DIR = "/root/testdata/sf0.001"


def _slice_to_file(df, lo, hi, src_dir, name):
    (df.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
     .coalesce(1).write.mode("overwrite").parquet(os.path.join(src_dir, "_st")))
    part = [f for f in os.listdir(os.path.join(src_dir, "_st"))
            if f.endswith(".parquet")][0]
    shutil.move(os.path.join(src_dir, "_st", part),
                os.path.join(src_dir, name))
    shutil.rmtree(os.path.join(src_dir, "_st"))


def test_state_accumulates_across_batches(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "value"
    )
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")

    # two files == two micro-batches under availableNow+maxFilesPerTrigger
    _slice_to_file(events, 0, 500, src, "b1.parquet")
    _slice_to_file(events, 500, 1000, src, "b2.parquet")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = running_user_stats(stream)
    q = (
        out.writeStream.format("memory").queryName("user_stats")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # last emission per user == cumulative over both batches
    emitted = spark.sql("SELECT * FROM user_stats").toPandas()
    final = (
        emitted.groupby("user_id").last()  # update-mode: later rows win
    )
    expect = (
        events.toPandas()
        .assign(cents=lambda d: (d["value"] * 100).round().astype("int64"))
        .groupby("user_id")
        .agg(n_events=("event_id", "size"), total_cents=("cents", "sum"),
             last_event_id=("event_id", "max"))
    )
    # memory-sink 'last' ordering is append order per batch; compare the
    # cumulative values via max (counts only grow)
    final2 = emitted.groupby("user_id").agg(
        n_events=("n_events", "max"), total_cents=("total_cents", "max"),
        last_event_id=("last_event_id", "max"),
    )
    assert final2.sort_index().equals(expect.sort_index())
    assert len(emitted) > len(final)  # users emitted in both batches


def test_null_values_skipped_not_poisoned(spark, tmp_path):
    """A NULL value must be SKIPPED in the cents sum (SQL semantics),
    not arrive as NaN whose floor().astype(int64) is undefined garbage
    (r12 review). Counts still include the null-valued row (COUNT(*))."""
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    rows = [(1, 10, 1.25), (1, 11, None), (1, 12, 2.00), (2, 20, None)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, value double")
    # bare part file directly in src (the file-stream source does not
    # recurse into a nested b1.parquet/ directory)
    df.coalesce(1).write.parquet(os.path.join(src, "_st"))
    part = [f for f in os.listdir(os.path.join(src, "_st"))
            if f.endswith(".parquet")][0]
    shutil.move(os.path.join(src, "_st", part),
                os.path.join(src, "b1.parquet"))
    shutil.rmtree(os.path.join(src, "_st"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_user_stats(stream)
        .writeStream.format("memory").queryName("null_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r.user_id: (r.n_events, r.total_cents, r.last_event_id)
           for r in spark.sql("SELECT * FROM null_stats").collect()}
    # all-NULL user 2: SUM over an all-NULL group is NULL (the batch
    # twin's semantics), never an exact 0 (r12 review)
    assert got == {1: (3, 325, 12), 2: (1, None, 20)}
