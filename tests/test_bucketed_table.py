"""Bucketed IceTables: hash-bucket layout committed through the
manifest (snapshot semantics) and re-registered per snapshot as a
bucketed catalog table for exchange-free co-located joins (TODO item:
unify bucket metadata into the manifest)."""

import pytest
from pyspark.sql import functions as F

from iceberg_core_spark.table import IceTable


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def pair(spark, tmp_path):
    left = spark.range(0, 5_000).selectExpr("id AS k", "id * 2 AS a")
    right = spark.range(0, 5_000).selectExpr("id AS k", "id * 3 AS b")
    tl = IceTable.create(spark, str(tmp_path / "l"), left, key_col="k",
                         bucket_by=("k", 4))
    tr = IceTable.create(spark, str(tmp_path / "r"), right, key_col="k",
                         bucket_by=("k", 4))
    yield tl, tr
    for n in ("bkt_l", "bkt_r", "bkt_l0"):
        spark.sql(f"DROP TABLE IF EXISTS `{n}`")


def test_bucketed_table_roundtrip_and_spec(spark, pair):
    tl, _tr = pair
    snap = tl.manifest.load(load_files=False)
    assert (snap.bucket_col, snap.n_buckets) == ("k", 4)
    assert tl.scan().count() == 5_000  # plain scan path still works


def test_bucketed_join_zero_exchanges(spark, pair):
    tl, tr = pair
    tl.as_bucketed_table("bkt_l")
    tr.as_bucketed_table("bkt_r")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt_l").join(spark.table("bkt_r"), "k")
        assert j.count() == 5_000
        s = plan_of(j)
        assert "Exchange hashpartitioning" not in s
        assert "SortMergeJoin" in s or "ShuffledHashJoin" in s
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_append_inherits_spec_and_stays_colocated(spark, pair):
    tl, tr = pair
    extra = spark.range(5_000, 6_000).selectExpr("id AS k", "id * 2 AS a")
    tl.append(extra)  # spec inherited from snapshot, no args needed
    snap = tl.manifest.load(load_files=False)
    assert (snap.bucket_col, snap.n_buckets) == ("k", 4)

    tl.as_bucketed_table("bkt_l")  # current snapshot: 6k rows
    tr.as_bucketed_table("bkt_r")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt_l").join(spark.table("bkt_r"), "k")
        assert j.count() == 5_000  # right side caps the matches
        assert "Exchange hashpartitioning" not in plan_of(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # time travel: snapshot 0 registers independently (5k rows)
    tl.as_bucketed_table("bkt_l0", snapshot_id=0)
    assert spark.table("bkt_l0").count() == 5_000


def test_bucketed_rejects_conflicting_layouts(spark, tmp_path):
    df = spark.range(10).selectExpr("id AS k", "id AS p")
    with pytest.raises(ValueError):
        IceTable.create(spark, str(tmp_path / "bad"), df,
                        partition_col="p", bucket_by=("k", 4))


def test_bucketed_refuses_mor_registration(spark, pair):
    tl, _ = pair
    tl.delete_where("k < 10", mode="mor")
    with pytest.raises(ValueError):
        tl.as_bucketed_table("bkt_l")
    # compaction rewrites deletes away; registration works again
    tl.compact(min_files=1)
    tl.as_bucketed_table("bkt_l")
    assert spark.table("bkt_l").count() == 4_990


def test_expire_removes_bucketed_link_dirs(spark, tmp_path):
    import os

    df = spark.range(0, 1_000).selectExpr("id AS k", "id AS a")
    t = IceTable.create(spark, str(tmp_path / "exp"), df, key_col="k",
                        bucket_by=("k", 2))
    t.as_bucketed_table("bkt_exp0")
    spark.sql("DROP TABLE `bkt_exp0`")
    t.overwrite(spark.range(0, 10).selectExpr("id AS k", "id AS a"))
    linkdir = os.path.join(str(tmp_path / "exp"), "_bucketed", "v0")
    assert os.path.isdir(linkdir)
    assert t.expire_snapshots(keep_last=1) == [0]
    assert not os.path.exists(linkdir)  # inodes released with the files


def test_bucketed_refuses_pre_rename_files_until_compact(spark, tmp_path):
    """r14 review: the bucketed catalog scan reads raw files by CURRENT
    column name (no alias-chain coalesce), so a file written before a
    rename would silently read NULL for the renamed column.
    Registration must refuse while such files exist, and succeed —
    with correct values — once compact(min_files=1) rewrites them."""
    root = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    t = IceTable.create(spark, root, df, partition_col=None,
                        key_col=None, bucket_by=("k", 4))
    t.rename_column("v", "val")
    with pytest.raises(ValueError, match="before a column rename"):
        t.as_bucketed_table("b_rename_guard")
    t.compact(min_files=1)
    name = t.as_bucketed_table("b_rename_guard")
    got = spark.sql(
        f"SELECT sum(val) AS sv, count(*) AS c FROM {name}").collect()[0]
    assert (got.sv, got.c) == (9900, 100)
    spark.sql(f"DROP TABLE {name}")


def test_bucketed_rename_guard_clears_for_legacy_seqless_entries(
        spark, tmp_path):
    """r14 ADVICE: rename entries written before the "seq" stamp exist
    in persisted tables, and compact() carries them forward verbatim —
    so a guard that refuses whenever seq is missing refuses FOREVER.
    The guard must instead derive the rename's commit point from
    snapshot history, so compact(min_files=1) actually clears it."""
    import glob
    import json
    import os

    root = str(tmp_path / "legacy")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    t = IceTable.create(spark, root, df, partition_col=None,
                        key_col=None, bucket_by=("k", 4))
    t.rename_column("v", "val")
    # simulate a pre-r14 table: strip the seq stamp from every rename
    # entry in every persisted snapshot document
    for p in glob.glob(os.path.join(root, "_manifest", "snapshot-*.json")):
        with open(p) as f:
            doc = json.load(f)
        for r in doc.get("renames", []):
            r.pop("seq", None)
        with open(p, "w") as f:
            json.dump(doc, f)
    t = IceTable(spark, root)  # reload — entries now seq-less
    with pytest.raises(ValueError, match="before a column rename"):
        t.as_bucketed_table("b_legacy_guard")
    t.compact(min_files=1)  # rewrites every file under current names
    # compact carried the seq-less entries forward; the history-derived
    # bound must still clear the guard for the rewritten files
    name = t.as_bucketed_table("b_legacy_guard")
    got = spark.sql(
        f"SELECT sum(val) AS sv, count(*) AS c FROM {name}").collect()[0]
    assert (got.sv, got.c) == (9900, 100)
    spark.sql(f"DROP TABLE {name}")
