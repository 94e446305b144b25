"""Streaming ingest tests — the deterministic file-drop harness version
of the reference's flush-semantics tests (blockManager_test.go:9-49):
rows become queryable only after a micro-batch commits them, each batch
produces a manifest snapshot, and event-time operators match their
batch twins."""

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from iceberg_core_spark.session import load_table
from iceberg_core_spark.streaming import (
    stream_cdc_to_table,
    stream_dedup,
    stream_ingest_to_table,
    tumbling_counts,
)
from iceberg_core_spark.table import IceTable
from tests.fixtures import KEY_COL, PARTITION_COL, location_df, location_row

SF_DIR = "/root/testdata/sf0.001"


def _drop_file(spark, rows, src_dir, name):
    location_df(spark, rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src_dir, "_stage")
    )
    part = [
        f for f in os.listdir(os.path.join(src_dir, "_stage"))
        if f.endswith(".parquet")
    ][0]
    shutil.move(os.path.join(src_dir, "_stage", part),
                os.path.join(src_dir, name))
    shutil.rmtree(os.path.join(src_dir, "_stage"))


def test_stream_ingest_batches_commit_snapshots(spark, tmp_path):
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    table_root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: two rows for one user (the blockManager_test fixture shape)
    _drop_file(spark, [location_row(timestamp=100000),
                       location_row(timestamp=100100)], src, "b1.parquet")
    q = stream_ingest_to_table(
        spark, src, table_root, location_df(spark, []).schema,
        partition_col=PARTITION_COL, key_col=KEY_COL,
        trigger={"availableNow": True}, checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)
    t = IceTable(spark, table_root)
    assert t.scan().count() == 2  # both rows committed, exactly once

    # batch 2: restart stream (same checkpoint) with one more file —
    # only the NEW file is processed (exactly-once across restarts)
    _drop_file(spark, [location_row(timestamp=100200, user_id="userid2")],
               src, "b2.parquet")
    q2 = stream_ingest_to_table(
        spark, src, table_root, location_df(spark, []).schema,
        partition_col=PARTITION_COL, key_col=KEY_COL,
        trigger={"availableNow": True}, checkpoint_dir=ckpt,
    )
    q2.awaitTermination(120)
    assert t.scan().count() == 3
    ops = [s.operation for s in t.snapshots()]
    assert ops[0] == "create" and "append" in ops
    # range query on the streamed table (write→query roundtrip, R15)
    got = t.query("userid1", 100000, 100100).collect()
    assert sorted(r.timestamp for r in got) == [100000, 100100]


def test_stream_ingest_feeds_incremental_consumer(spark, tmp_path):
    """Streaming ingest meeting the consumer API end to end: each
    micro-batch's foreachBatch commit is a snapshot, and
    scan_incremental over any snapshot range returns EXACTLY the
    micro-batch contents that landed in it — the reference's
    latency-bounded ingest (blockManager_test.go:38-42) feeding an
    incremental change-feed reader instead of a full rescan."""
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    table_root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    batches = [
        [location_row(timestamp=100 + i) for i in range(3)],
        [location_row(timestamp=200 + i, user_id="userid2")
         for i in range(2)],
        [location_row(timestamp=300 + i) for i in range(4)],
    ]

    def drain(n):
        _drop_file(spark, batches[n], src, f"b{n}.parquet")
        q = stream_ingest_to_table(
            spark, src, table_root, location_df(spark, []).schema,
            partition_col=PARTITION_COL, key_col=KEY_COL,
            trigger={"availableNow": True}, checkpoint_dir=ckpt,
        )
        assert q.awaitTermination(120)

    for n in range(len(batches)):
        drain(n)

    t = IceTable(spark, table_root)
    snaps = t.manifest.snapshots(load_files=False)
    assert len(snaps) == 3  # one commit per micro-batch
    assert [s.source_batch_id for s in snaps] == [0, 1, 2]

    def ts_set(df):
        return sorted(r.timestamp for r in df.collect())

    # feed since the first commit == batches 1+2, since second == batch 2
    s0, s1, s2 = (s.snapshot_id for s in snaps)
    feed_01 = ts_set(t.scan_incremental(since=s0))
    expect_01 = sorted(r.timestamp for b in batches[1:]
                       for r in location_df(spark, b).collect())
    assert feed_01 == expect_01
    feed_2 = ts_set(t.scan_incremental(since=s1))
    expect_2 = sorted(r.timestamp
                      for r in location_df(spark, batches[2]).collect())
    assert feed_2 == expect_2
    # bounded range: (s0, s1] is exactly batch 1
    feed_mid = ts_set(t.scan_incremental(since=s0, until=s1))
    expect_mid = sorted(r.timestamp
                        for r in location_df(spark, batches[1]).collect())
    assert feed_mid == expect_mid
    # and the full scan equals the union of all batches (no loss/dup)
    assert ts_set(t.scan()) == sorted(
        r.timestamp for b in batches
        for r in location_df(spark, b).collect())


def test_stream_ingest_latency_bounded_by_trigger(spark, tmp_path):
    """Age-flush analog: with a processingTime trigger, a dropped file
    becomes queryable within ~2 trigger intervals (reference asserts
    blocks commit only after MaxAge elapses; here the trigger bounds
    ingest-to-queryable latency)."""
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    table_root = str(tmp_path / "table")

    q = stream_ingest_to_table(
        spark, src, table_root, location_df(spark, []).schema,
        partition_col=PARTITION_COL, key_col=KEY_COL,
        trigger={"processingTime": "1 seconds"},
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        _drop_file(spark, [location_row(timestamp=42)], src, "late.parquet")
        deadline = time.time() + 60
        seen = 0
        while time.time() < deadline:
            try:
                seen = IceTable(spark, table_root).scan().count()
            except FileNotFoundError:
                seen = 0
            if seen == 1:
                break
            time.sleep(0.5)
        assert seen == 1
    finally:
        q.stop()


def test_tumbling_counts_stream_matches_batch(spark, tmp_path):
    """The same operator applied to a stream (availableNow over the
    events table) and to the batch table gives identical windows."""
    events = load_table(spark, SF_DIR, "events")
    batch = {
        (r.win_start, r.win_end, r.event_type): (r.n_events, r.total_value)
        for r in tumbling_counts(events).collect()
    }

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    shutil.copy(os.path.join(SF_DIR, "events.parquet"),
                os.path.join(src, "events.parquet"))
    # type-driven ts handling, mirroring stream_ingest: nanos datasets
    # stream raw longs + convert, timestamp datasets stream as-is
    from iceberg_core_spark.session import _nanos_columns

    nanos = _nanos_columns(os.path.join(src, "events.parquet"))
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(os.path.join(src, "events.parquet")).schema
    stream = spark.readStream.schema(raw_schema).parquet(src)
    if "ts" in nanos:
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        # NTZ → session-TZ timestamp (UTC): watermarks need TIMESTAMP
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = tumbling_counts(stream, watermark="10 minutes")
    q = (
        agg.writeStream.format("memory").queryName("tumbling_out")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.win_start, r.win_end, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    assert streamed == batch


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Real watermarked stream-stream join (two file streams) produces
    the same pairs as the batch twin."""
    from iceberg_core_spark.streaming import stream_stream_join

    events = load_table(spark, SF_DIR, "events")
    purchases_b = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id")
    clicks_b = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id")
    batch = {(r.user_id, r.event_id, r.r_event_id) for r in
             stream_stream_join(purchases_b, clicks_b, on="user_id",
                                max_lag="30 minutes").collect()}

    pdir, cdir = str(tmp_path / "p"), str(tmp_path / "c")
    purchases_b.write.parquet(pdir)
    clicks_b.write.parquet(cdir)
    ps = spark.readStream.schema(purchases_b.schema).parquet(pdir)
    cs = spark.readStream.schema(clicks_b.schema).parquet(cdir)
    joined = stream_stream_join(ps, cs, on="user_id", max_lag="30 minutes")
    q = (joined.writeStream.format("memory").queryName("ssj_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    streamed = {(r.user_id, r.event_id, r.r_event_id) for r in
                spark.sql("SELECT * FROM ssj_out").collect()}
    assert streamed == batch and len(batch) > 0


def test_stream_dedup_drops_in_batch_duplicates(spark, tmp_path):
    """dropDuplicatesWithinWatermark on a stream with duplicate keys in
    one batch keeps exactly one row per key."""
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    rows = [
        location_row(timestamp=1000),
        location_row(timestamp=1000),  # duplicate key
        location_row(timestamp=2000),
    ]
    _drop_file(spark, rows, src, "dups.parquet")
    stream = (
        spark.readStream.schema(location_df(spark, []).schema).parquet(src)
        .withColumn("event_time", F.timestamp_micros(F.col(KEY_COL) * 1000))
    )
    deduped = stream_dedup(stream, [PARTITION_COL, KEY_COL],
                           ts_col="event_time")
    q = (
        deduped.writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        f"SELECT {PARTITION_COL}, {KEY_COL} FROM dedup_out"
    ).collect()
    assert sorted((r[0], r[1]) for r in got) == [
        ("userid1", 1000), ("userid1", 2000)
    ]


def test_stream_ingest_into_bucketed_table(spark, tmp_path):
    """Streaming ingest composes with the bucketed layout: every
    micro-batch append inherits bucket_by, and the growing table stays
    registrable for exchange-free joins."""
    src = str(tmp_path / "bkt_in")
    os.makedirs(src)
    table_root = str(tmp_path / "bkt_table")
    ckpt = str(tmp_path / "bkt_ckpt")

    _drop_file(spark, [location_row(timestamp=t) for t in range(100, 110)],
               src, "b1.parquet")
    q = stream_ingest_to_table(
        spark, src, table_root, location_df(spark, []).schema,
        partition_col=None, key_col=KEY_COL,
        bucket_by=(KEY_COL, 2),
        trigger={"availableNow": True}, checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)
    _drop_file(spark, [location_row(timestamp=t) for t in range(200, 205)],
               src, "b2.parquet")
    q2 = stream_ingest_to_table(
        spark, src, table_root, location_df(spark, []).schema,
        partition_col=None, key_col=KEY_COL,
        bucket_by=(KEY_COL, 2),
        trigger={"availableNow": True}, checkpoint_dir=ckpt,
    )
    q2.awaitTermination(120)

    t = IceTable(spark, table_root)
    snap = t.manifest.load(load_files=False)
    assert (snap.bucket_col, snap.n_buckets) == (KEY_COL, 2)
    assert t.scan().count() == 15
    t.as_bucketed_table("bkt_stream_t")
    try:
        assert spark.table("bkt_stream_t").count() == 15
    finally:
        spark.sql("DROP TABLE `bkt_stream_t`")


def test_load_table_ts_is_timestamp_type(spark):
    """Contract: load_table normalizes events.ts to session-timezone
    TimestampType regardless of the parquet physical type (NANOS long
    or TIMESTAMP_NTZ) — streaming watermarks/windows accept only
    TIMESTAMP, so a type drift here breaks every event-time operator."""
    from pyspark.sql.types import TimestampType

    ev = load_table(spark, SF_DIR, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
    # and it is watermark-compatible
    ev.withWatermark("ts", "10 minutes")


def test_stream_ingest_staged_on_branch_then_published(spark, tmp_path):
    """Write-audit-publish over STREAMING ingest: micro-batches land on
    an audit branch (main consumers see nothing — even the very first
    batch stages behind an empty schema-only create), the audit view
    sees everything, and one metadata-only publish flips the audited
    batches visible. The landing→quality-gate→serving shape of a
    100 TB ingest pipeline."""
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    table_root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    batches = [
        [location_row(timestamp=100 + i) for i in range(3)],
        [location_row(timestamp=200 + i, user_id="userid2")
         for i in range(2)],
    ]
    for n, rows in enumerate(batches):
        _drop_file(spark, rows, src, f"b{n}.parquet")
        q = stream_ingest_to_table(
            spark, src, table_root, location_df(spark, []).schema,
            partition_col=PARTITION_COL, key_col=KEY_COL,
            trigger={"availableNow": True}, checkpoint_dir=ckpt,
            branch="audit",
        )
        assert q.awaitTermination(120)

    t = IceTable(spark, table_root)
    assert t.scan().count() == 0  # nothing published yet
    assert t.scan(branch="audit").count() == 5  # audit sees both batches
    t.publish_branch("audit")
    assert t.scan().count() == 5
    # replay protection still intact across the staged path
    assert [s.source_batch_id for s in t.manifest.snapshots(
        load_files=False) if s.source_batch_id is not None] == [0, 1]


def _drop_cdc_file(spark, schema, rows, src_dir, name):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite").parquet(os.path.join(src_dir, "_stage"))
    part = [
        f for f in os.listdir(os.path.join(src_dir, "_stage"))
        if f.endswith(".parquet")
    ][0]
    shutil.move(os.path.join(src_dir, "_stage", part),
                os.path.join(src_dir, name))
    shutil.rmtree(os.path.join(src_dir, "_stage"))


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_stream_cdc_applies_change_batches_exactly_once(spark, tmp_path,
                                                        mode):
    """Streaming MERGE: micro-batch 1 seeds the table through the CDC
    path, micro-batch 2 (a restart on the same checkpoint) updates one
    key, deletes one, inserts one — each batch applied with exactly-once
    effect. cow: untouched partitions carried over byte-identical;
    mor: NOTHING rewritten, the batch lands as files + an
    equality-delete key set."""
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType)

    schema = StructType([
        StructField("part", StringType()),
        StructField("k", LongType()),
        StructField("v", DoubleType()),
        StructField("op", StringType()),
        StructField("seq", LongType()),
    ])
    src = str(tmp_path / "cdc_in")
    os.makedirs(src)
    root = str(tmp_path / "cdc_table")
    ckpt = str(tmp_path / "cdc_ckpt")

    def run():
        q = stream_cdc_to_table(
            spark, src, root, schema, key_cols=["part", "k"],
            partition_col="part", key_col="k", op_col="op",
            seq_col="seq", mode=mode, trigger={"availableNow": True},
            checkpoint_dir=ckpt,
        )
        q.awaitTermination(120)

    _drop_cdc_file(spark, schema, [
        ("a", 1, 1.0, "I", 1), ("a", 2, 2.0, "I", 1),
        ("b", 1, 10.0, "I", 1),
    ], src, "b1.parquet")
    run()
    t = IceTable(spark, root)
    assert t.scan().count() == 3
    assert "op" not in t.scan().columns
    files_after_b1 = {f.path: f for f in t.manifest.load().files}
    b_files = {p for p, f in files_after_b1.items() if f.partition == "b"}

    # batch 2 touches only partition a: update k=1, delete k=2, insert k=3
    _drop_cdc_file(spark, schema, [
        ("a", 1, 99.0, "U", 1), ("a", 2, 0.0, "D", 1),
        ("a", 3, 3.0, "I", 1),
    ], src, "b2.parquet")
    run()
    got = {(r.part, r.k): r.v for r in t.scan().collect()}
    assert got == {("a", 1): 99.0, ("a", 3): 3.0, ("b", 1): 10.0}
    after = {f.path for f in t.manifest.load().files}
    assert b_files <= after  # partition b carried over, not rewritten

    # restart with nothing new: no extra snapshot (no-data batch)
    sid = t.manifest.current_snapshot_id()
    run()
    assert t.manifest.current_snapshot_id() == sid
    ops = [s.operation for s in t.snapshots()]
    expected_op = "cdc" if mode == "cow" else "cdc-mor"
    assert ops[0] == "create" and ops.count(expected_op) == 2
    if mode == "mor":
        # nothing was rewritten across either batch
        assert set(files_after_b1) <= after


def test_stream_admit_blocks_duplicates_compounding(spark, tmp_path):
    """Admission-filtered ingest end to end: batch 1 creates the
    table; batch 2's exact copy and near-duplicate of existing docs
    are rejected (quarantined with verdicts) while its unique doc
    lands; batch 3's exact copy OF A BATCH-2 ADMISSION is rejected
    too — admission compounds, each admitted doc becomes corpus for
    the next batch."""
    from iceberg_core_spark.streaming.ingest import stream_admit_to_table

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    table_root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    quarantine = str(tmp_path / "quarantine")

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi")
    other = "a corpus document about parquet footers and manifests"
    fresh = "entirely new admission about stream processing windows"

    def doc_df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def doc_file(rows, name):
        doc_df(rows).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, "_stage"))
        part = [f for f in os.listdir(os.path.join(src, "_stage"))
                if f.endswith(".parquet")][0]
        shutil.move(os.path.join(src, "_stage", part),
                    os.path.join(src, name))

    batches = [
        [(1, base), (2, other)],
        [(10, base),            # exact dup of 1 → reject
         (11, base + " omega"),  # near dup of 1 → reject
         (12, fresh)],           # unique → admit
        [(20, fresh)],           # exact dup of BATCH-2 admission → reject
    ]

    def drain(n):
        doc_file(batches[n], f"b{n}.parquet")
        q = stream_admit_to_table(
            spark, src, table_root, doc_df([]).schema,
            partition_col=None, key_col="doc_id",
            quarantine_root=quarantine,
            trigger={"availableNow": True}, checkpoint_dir=ckpt,
        )
        assert q.awaitTermination(180)

    for n in range(len(batches)):
        drain(n)

    t = IceTable(spark, table_root)
    assert sorted(r.doc_id for r in t.scan().collect()) == [1, 2, 12]

    q2 = {r.doc_id: (r.verdict, r.match_id)
          for r in spark.read.parquet(
              os.path.join(quarantine, "batch=1")).collect()}
    assert q2[10] == ("exact_dup", 1)
    assert q2[11][0] == "near_dup" and q2[11][1] == 1
    q3 = {r.doc_id: (r.verdict, r.match_id)
          for r in spark.read.parquet(
              os.path.join(quarantine, "batch=2")).collect()}
    assert q3[20] == ("exact_dup", 12)  # compounding: matched b2's doc
    # every batch stamped (replay guard) even when nothing was admitted
    snaps = t.manifest.snapshots(load_files=False)
    assert [s.source_batch_id for s in snaps] == [0, 1, 2]


def test_stream_admit_with_persisted_index(spark, tmp_path):
    """The indexed admission path must reach the same compounding
    outcome as the scan-derived one, with the index healing itself
    from the table (synced per batch) and living on disk between
    drains."""
    from iceberg_core_spark.streaming.ingest import stream_admit_to_table

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    table_root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    index_root = str(tmp_path / "index")

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi")
    fresh = "entirely new admission about stream processing windows"

    def doc_df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def doc_file(rows, name):
        doc_df(rows).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, "_stage"))
        part = [f for f in os.listdir(os.path.join(src, "_stage"))
                if f.endswith(".parquet")][0]
        shutil.move(os.path.join(src, "_stage", part),
                    os.path.join(src, name))

    batches = [
        [(1, base)],
        [(10, base), (11, fresh)],   # 10 exact-dup, 11 admitted
        [(20, fresh)],               # exact dup of batch-2 ADMISSION
    ]

    def drain(n):
        doc_file(batches[n], f"b{n}.parquet")
        q = stream_admit_to_table(
            spark, src, table_root, doc_df([]).schema,
            partition_col=None, key_col="doc_id",
            index_root=index_root,
            trigger={"availableNow": True}, checkpoint_dir=ckpt,
        )
        assert q.awaitTermination(180)

    for n in range(len(batches)):
        drain(n)

    t = IceTable(spark, table_root)
    assert sorted(r.doc_id for r in t.scan().collect()) == [1, 11]
    # the index caught up to every admitted snapshot
    from iceberg_core_spark.functions.dedup_incremental import (
        AdmissionIndex,
    )
    idx = AdmissionIndex(spark, index_root)
    # sync runs at the START of each commit, so the index lawfully
    # lags the newest commit by one snapshot (the next trigger heals
    # it) — here that snapshot is batch 2's empty stamped append
    assert idx.sync(t) <= 1
    assert idx.sync(t) == 0  # now fully caught up, and idempotent
    ids = sorted(r["__cid"] for r in
                 idx._read("fp", ["__cid"]).collect())
    assert ids == [1, 11]


def test_stream_ingest_with_continuous_rollup(spark, tmp_path):
    """rollups= keeps a MaterializedRollup current with the ingest:
    after each drain the rollup equals a from-scratch recompute of the
    table, folded incrementally (the rollup's watermark advances with
    the table's snapshots, never resetting to a full scan)."""
    from iceberg_core_spark.table import MaterializedRollup

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    table_root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    ru = MaterializedRollup(spark, str(tmp_path / "ru"),
                            group_cols=[PARTITION_COL],
                            sum_cols=["latitude"])

    def drain():
        q = stream_ingest_to_table(
            spark, src, table_root, location_df(spark, []).schema,
            partition_col=PARTITION_COL, key_col=KEY_COL,
            trigger={"availableNow": True}, checkpoint_dir=ckpt,
            rollups=[ru],
        )
        assert q.awaitTermination(120)

    def recompute():
        t = IceTable(spark, table_root)
        return sorted(map(tuple, (
            t.scan().groupBy(PARTITION_COL)
            .agg(F.count(F.lit(1)).alias("row_count"),
                 F.sum(F.col("latitude").cast("decimal(18,6)"))
                 .cast("decimal(28,6)").alias("sum_latitude"))
        ).collect()))

    _drop_file(spark, [location_row(timestamp=100000, latitude=1.5),
                       location_row(timestamp=100100, latitude=2.5)],
               src, "b1.parquet")
    drain()
    assert sorted(map(tuple, ru.read().collect())) == recompute()
    wm1 = ru.synced_snapshot()

    _drop_file(spark, [location_row(timestamp=100200, user_id="userid2",
                                    latitude=4.0)],
               src, "b2.parquet")
    drain()
    assert sorted(map(tuple, ru.read().collect())) == recompute()
    assert ru.synced_snapshot() > wm1  # folded forward, not rebuilt


def test_stream_admit_cold_start_backlog_batched(spark, tmp_path):
    """A cold start over a BACKLOG of delivery files with
    max_files_per_trigger=1 judges each delivery against the
    admissions before it — without it, the whole backlog would land in
    the unfiltered first-batch create."""
    from iceberg_core_spark.streaming.ingest import stream_admit_to_table

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi")

    def doc_df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def doc_file(rows, name):
        doc_df(rows).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, "_stage"))
        part = [f for f in os.listdir(os.path.join(src, "_stage"))
                if f.endswith(".parquet")][0]
        shutil.move(os.path.join(src, "_stage", part),
                    os.path.join(src, name))

    # both files present BEFORE the stream starts
    doc_file([(1, base)], "b0.parquet")
    doc_file([(10, base), (11, "fresh text about stream batching")],
             "b1.parquet")
    q = stream_admit_to_table(
        spark, src, str(tmp_path / "table"), doc_df([]).schema,
        partition_col=None, key_col="doc_id",
        max_files_per_trigger=1,
        trigger={"availableNow": True},
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(180)
    t = IceTable(spark, str(tmp_path / "table"))
    assert sorted(r.doc_id for r in t.scan().collect()) == [1, 11]
    snaps = t.manifest.snapshots(load_files=False)
    assert [s.source_batch_id for s in snaps] == [0, 1]


@pytest.mark.parametrize("merge_mode", ["cow", "mor"])
def test_stream_merge_applies_clauses_exactly_once(spark, tmp_path,
                                                   merge_mode):
    """Streaming multi-clause MERGE: newer-wins conditional update +
    tombstone delete + conditional insert per micro-batch, with the
    flag/seq columns visible to clauses but NOT stored
    (source_cols), per-batch latest-per-key collapse (seq_col), and
    exactly-once via the lineage batch-id guard across a restart."""
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType)

    from iceberg_core_spark.streaming import stream_merge_to_table

    schema = StructType([
        StructField("part", StringType()),
        StructField("k", LongType()),
        StructField("v", DoubleType()),
        StructField("flag", StringType()),
        StructField("seq", LongType()),
    ])
    src = str(tmp_path / "mrg_in")
    os.makedirs(src)
    root = str(tmp_path / "mrg_table")
    ckpt = str(tmp_path / "mrg_ckpt")

    def run():
        q = stream_merge_to_table(
            spark, src, root, schema, key_cols=["part", "k"],
            when_matched=[
                {"condition": "s.flag = 'D'", "action": "delete"},
                {"condition": "s.seq > t.seq", "action": "update",
                 "set": {"v": "s.v", "seq": "s.seq"}},
            ],
            when_not_matched_insert="flag <> 'D'",
            partition_col="part", key_col="k",
            source_cols=["part", "k", "v", "seq"], seq_col="seq",
            mode=merge_mode, trigger={"availableNow": True},
            checkpoint_dir=ckpt,
        )
        q.awaitTermination(120)

    # batch 1: seed (inserts), incl. a per-key burst collapsed by seq
    _drop_cdc_file(spark, schema, [
        ("a", 1, 1.0, "U", 1), ("a", 1, 1.5, "U", 2),
        ("a", 2, 2.0, "U", 1), ("b", 1, 10.0, "U", 1),
    ], src, "b1.parquet")
    run()
    t = IceTable(spark, root)
    got = {(r.part, r.k): (r.v, r.seq) for r in t.scan().collect()}
    assert got == {("a", 1): (1.5, 2), ("a", 2): (2.0, 1),
                   ("b", 1): (10.0, 1)}
    assert "flag" not in t.scan().columns

    # batch 2: stale update ignored, fresh update applied, tombstone,
    # insert-with-D-flag suppressed by the insert condition
    _drop_cdc_file(spark, schema, [
        ("a", 1, 0.0, "U", 1),    # stale (seq 1 < 2): unclaimed
        ("a", 2, 22.0, "U", 5),   # newer: update
        ("b", 1, 0.0, "D", 9),    # tombstone
        ("b", 2, 20.0, "U", 1),   # insert
        ("b", 3, 0.0, "D", 1),    # unmatched tombstone: NOT inserted
    ], src, "b2.parquet")
    run()
    got = {(r.part, r.k): (r.v, r.seq) for r in t.scan().collect()}
    assert got == {("a", 1): (1.5, 2), ("a", 2): (22.0, 5),
                   ("b", 2): (20.0, 1)}

    # replay protection: restart with nothing new commits nothing
    sid = t.manifest.current_snapshot_id()
    run()
    assert t.manifest.current_snapshot_id() == sid
    ops = [s.operation for s in t.snapshots()]
    expected = "merge" if merge_mode == "cow" else "cdc-mor"
    assert ops.count(expected) == 2


def test_stream_ingest_with_continuous_ohlc(spark, tmp_path):
    """rollups= ticks an OhlcRollup per micro-batch: after each drain
    the candle store equals downsample_ohlc recomputed from the full
    table, and append-only micro-batches fold forward (the watermark
    advances — never a reset to a full scan)."""
    import datetime

    from iceberg_core_spark.operators.timeseries import downsample_ohlc
    from iceberg_core_spark.table import OhlcRollup

    step = 3_600_000_000  # 1h candles
    base = datetime.datetime(2024, 3, 1)

    def ev_df(rows):
        return spark.createDataFrame(
            [(i, g, base + datetime.timedelta(microseconds=us), float(v))
             for i, g, us, v in rows],
            "id long, g string, ts timestamp, v double")

    def ev_file(rows, name):
        ev_df(rows).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, "_stage"))
        part = [f for f in os.listdir(os.path.join(src, "_stage"))
                if f.endswith(".parquet")][0]
        shutil.move(os.path.join(src, "_stage", part),
                    os.path.join(src, name))
        shutil.rmtree(os.path.join(src, "_stage"))

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    table_root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    ru = OhlcRollup(spark, str(tmp_path / "ru"), group_cols=["g"],
                    ts_col="ts", value_col="v", tiebreak_col="id",
                    step_us=step)
    folds = {"n": 0}
    real_fold = ru._fold

    def spy_fold(old, delta):
        folds["n"] += 1
        return real_fold(old, delta)

    ru._fold = spy_fold  # foreachBatch refreshes THIS instance

    def drain():
        q = stream_ingest_to_table(
            spark, src, table_root, ev_df([]).schema,
            partition_col="g", key_col="id",
            trigger={"availableNow": True}, checkpoint_dir=ckpt,
            rollups=[ru],
        )
        assert q.awaitTermination(120)

    def recompute():
        t = IceTable(spark, table_root)
        return sorted(map(tuple, downsample_ohlc(
            t.scan(), "g", "ts", "v", tiebreak_col="id",
            step_us=step).collect()))

    ev_file([(1, "a", 0, 10.0), (2, "a", 50, 20.0),
             (3, "b", 10, 5.0)], "b1.parquet")
    drain()
    assert sorted(map(tuple, ru.read().collect())) == recompute()
    wm1 = ru.synced_snapshot()

    ev_file([(0, "a", 0, 99.0),          # ties the open's ts, id wins
             (9, "a", 70, 1.0),          # new close + low
             (4, "b", step + 5, 44.0)],  # new bucket
            "b2.parquet")
    drain()
    assert sorted(map(tuple, ru.read().collect())) == recompute()
    assert ru.synced_snapshot() > wm1
    # the append-only micro-batch FOLDED (a rebuild would also advance
    # the watermark, so the spy is what actually proves no full rescan)
    assert folds["n"] >= 1


def test_stream_cdc_upsert_path_honors_seq_col(spark, tmp_path):
    """r11 review: with op_col=None the seq column was silently
    dropped, so a bursty key committed DUPLICATE rows through
    upsert. The upsert path now pre-collapses to the per-key latest
    row by seq_col — same discipline as apply_cdc/merge."""
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType)

    schema = StructType([
        StructField("part", StringType()),
        StructField("k", LongType()),
        StructField("v", DoubleType()),
        StructField("seq", LongType()),
    ])
    src = str(tmp_path / "in")
    os.makedirs(src)
    root = str(tmp_path / "t")
    # one batch, one key, three versions — latest (seq 3) must win,
    # and exactly ONE row per key may exist afterwards
    _drop_cdc_file(spark, schema, [
        ("a", 1, 1.0, 1), ("a", 1, 2.0, 2), ("a", 1, 3.0, 3),
        ("a", 2, 7.0, 1),
    ], src, "b1.parquet")
    q = stream_cdc_to_table(
        spark, src, root, schema, key_cols=["part", "k"],
        partition_col="part", key_col="k", op_col=None,
        seq_col="seq", trigger={"availableNow": True},
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    t = IceTable(spark, root)
    rows = {(r["part"], r["k"]): r["v"] for r in t.scan().collect()}
    assert t.scan().count() == 2          # one row per key, no dups
    assert rows == {("a", 1): 3.0, ("a", 2): 7.0}


def test_stream_dedup_batch_twin_is_plain_dedup(spark):
    """r11 review: dropDuplicatesWithinWatermark is stream-only; the
    operator must fall back to exact dedup on a batch frame so the
    module's batch-twin-as-oracle contract holds for it too."""
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:00:05"),
         (2, "2024-01-01 00:00:01")],
        "event_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    out = stream_dedup(df, ["event_id"], ts_col="ts")
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2]


def test_should_tick_shared_cadence_semantics():
    """r11 review: maintenance_every and index_compact_every share
    ONE convention — None disables, <=0 means every batch (after
    batch 0), N means every N batches."""
    from iceberg_core_spark.streaming.ingest import _should_tick

    sentinel = object()
    assert not _should_tick(0, sentinel, 0)      # never batch 0
    assert _should_tick(1, sentinel, 0)          # 0 → every batch
    assert _should_tick(2, sentinel, -5)         # negative too
    assert not _should_tick(1, sentinel, None)   # None → disabled
    assert not _should_tick(3, sentinel, 2)
    assert _should_tick(4, sentinel, 2)
    assert not _should_tick(4, None, 2)          # no job → no tick
