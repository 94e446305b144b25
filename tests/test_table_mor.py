"""Merge-on-read deletes: metadata-only commits, file-scoped semantics
(later appends unaffected), interaction with range queries, and
compaction rewriting deletes away."""

import pytest
from pyspark.sql import functions as F

from iceberg_core_spark.table import IceTable
from tests.fixtures import KEY_COL, PARTITION_COL, location_df, location_row


@pytest.fixture()
def table(spark, tmp_path):
    rows = [location_row(timestamp=t) for t in range(10)]
    return IceTable.create(spark, str(tmp_path / "t"),
                           location_df(spark, rows),
                           partition_col=PARTITION_COL, key_col=KEY_COL)


def test_mor_delete_is_metadata_only(spark, table):
    files_before = {f.path for f in table.manifest.load().files}
    table.delete_where("timestamp % 2 = 0", mode="mor")
    snap = table.manifest.load()
    assert snap.operation == "delete-mor"
    assert {f.path for f in snap.files} == files_before  # no data rewrite
    assert sorted(r.timestamp for r in table.scan().collect()) == [1, 3, 5, 7, 9]
    # range query applies deletes too
    assert sorted(r.timestamp for r in
                  table.query("userid1", 0, 4).collect()) == [1, 3]


def test_mor_scoped_to_delete_time_files(spark, table):
    table.delete_where("timestamp < 100", mode="mor")  # deletes ALL current
    assert table.scan().count() == 0
    # a later append with rows matching the predicate is NOT affected
    table.append(location_df(spark, [location_row(timestamp=3)]),
                 dedupe_identical_files=False)
    got = [r.timestamp for r in table.scan().collect()]
    assert got == [3]


def test_mor_stacked_predicates(spark, table):
    table.delete_where("timestamp >= 8", mode="mor")
    table.delete_where("timestamp < 2", mode="mor")
    assert sorted(r.timestamp for r in table.scan().collect()) == [2, 3, 4, 5, 6, 7]


def test_compact_rewrites_mor_away(spark, table):
    table.delete_where("timestamp % 2 = 0", mode="mor")
    table.compact(min_files=10_000)  # no fragmentation — only MoR cleanup
    snap = table.manifest.load()
    assert snap.delete_predicates == []
    assert sorted(r.timestamp for r in table.scan().collect()) == [1, 3, 5, 7, 9]
    # physical: re-reading raw files shows the rows are really gone
    raw = table._read_files(snap.files)
    assert sorted(r.timestamp for r in raw.collect()) == [1, 3, 5, 7, 9]


def test_delete_range_under_mor(spark, table):
    table.delete_where("timestamp = 1", mode="mor")
    table.delete_range(partition="userid1", lo=4, hi=6)
    assert sorted(r.timestamp for r in table.scan().collect()) == [0, 2, 3, 7, 8, 9]


def test_mor_rejects_column_condition(spark, table):
    with pytest.raises(TypeError, match="SQL string"):
        table.delete_where(F.col("timestamp") < 5, mode="mor")


def test_mor_time_travel_sees_predeletion_state(spark, table):
    sid = table.manifest.current_snapshot_id()
    table.delete_where("timestamp < 5", mode="mor")
    assert table.scan(snapshot_id=sid).count() == 10
    assert table.scan().count() == 5


def test_mor_predicate_metadata_is_constant_size(spark, table):
    """Iceberg v2 sequence-number scoping: a delete predicate is one
    {expr, seq} dict regardless of how many files the table holds — no
    per-predicate path list growing with file count."""
    table.append(location_df(spark, [location_row(timestamp=50)]),
                 dedupe_identical_files=False)
    table.delete_where("timestamp < 100", mode="mor")
    snap = table.manifest.load()
    (pred,) = snap.delete_predicates
    assert set(pred.keys()) == {"expr", "seq"}
    assert pred["seq"] == snap.snapshot_id
    # every pre-delete file predates the predicate; nothing else exists
    assert all(f.seq < pred["seq"] for f in snap.files)
    # a post-delete append carries a higher seq -> out of scope
    table.append(location_df(spark, [location_row(timestamp=60)]),
                 dedupe_identical_files=False)
    snap2 = table.manifest.load()
    newer = [f for f in snap2.files if f.seq >= pred["seq"]]
    assert newer and all(f.seq == snap2.snapshot_id for f in newer)
    assert sorted(r.timestamp for r in table.scan().collect()) == [60]


def test_mor_commit_preserves_layout_config(spark, tmp_path):
    """A metadata-only delete-mor commit must carry stat_cols/zorder/
    bucket config forward — dropping them would silently disable
    range_scan pruning and bucketed registration afterwards."""
    from iceberg_core_spark.table import IceTable

    df = spark.range(100).selectExpr("id", "id * 2 as v", "id * 3 as w")
    t = IceTable.create(spark, str(tmp_path / "cfg"), df, key_col="id",
                        stat_cols=["v"])
    t.delete_where("id < 5", mode="mor")
    snap = t.manifest.load(load_files=False)
    assert snap.stat_cols == ["v"]


def test_merge_mor_equals_cow(spark, tmp_path):
    """merge(mode='mor') must produce the same logical contents as
    the CoW merge — but as an O(batch) commit: unclaimed matched rows
    stay in their original files (no rewrite), only claimed keys land
    in the equality-delete file, and compact() materializes it all."""
    from iceberg_core_spark.table import IceTable

    def mk(root):
        return IceTable.create(
            spark, root,
            spark.createDataFrame(
                [(1, 10, 1), (2, 20, 1), (3, 30, 5), (4, 40, 1)],
                "k long, v long, seq long"),
            partition_col=None, key_col="k")

    src = spark.createDataFrame(
        [(1, 99, 9, "D"),     # delete
         (2, 77, 9, "U"),     # newer → update
         (3, 88, 2, "U"),     # stale → unclaimed (untouched)
         (9, 90, 9, "U")],    # unmatched → insert
        "k long, v long, seq long, flag string")
    clauses = [
        {"condition": "s.flag = 'D'", "action": "delete"},
        {"condition": "s.seq > t.seq", "action": "update",
         "set": {"v": "s.v", "seq": "s.seq"}},
    ]
    t_cow = mk(str(tmp_path / "cow"))
    t_cow.merge(src, key_cols=["k"], when_matched=clauses,
                when_not_matched_insert=True)
    t_mor = mk(str(tmp_path / "mor"))
    before_paths = {f.path for f in t_mor.manifest.load().files}
    t_mor.merge(src, key_cols=["k"], when_matched=clauses,
                when_not_matched_insert=True, mode="mor")

    want = sorted(map(tuple, t_cow.scan().collect()))
    assert sorted(map(tuple, t_mor.scan().collect())) == want
    # O(batch): every original file survives untouched
    after = {f.path for f in t_mor.manifest.load().files}
    assert before_paths <= after
    # the delete predicate hides exactly the claimed keys; compaction
    # materializes it away with identical contents
    assert t_mor.manifest.load(load_files=False).delete_predicates
    t_mor.compact(min_files=1)
    assert sorted(map(tuple, t_mor.scan().collect())) == want
    assert not t_mor.manifest.load(load_files=False).delete_predicates
