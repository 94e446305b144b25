"""Z-order clustering + multi-column stats: range_scan prunes on every
z-ordered dimension; key-sorted layout only prunes on the key."""

import pytest
from pyspark.sql import functions as F

from iceberg_core_spark.table import IceTable


@pytest.fixture(scope="module")
def grid_df(spark):
    # 64x64 uniform grid: worst case for 1-D sorting, ideal to show
    # multi-dimensional clustering.
    return spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )


def _files_read(df):
    return len(df.inputFiles())


def test_zorder_prunes_both_dimensions(spark, grid_df, tmp_path):
    zt = IceTable.create(spark, str(tmp_path / "z"), grid_df,
                         key_col="x", zorder_by=["x", "y"],
                         max_rows_per_file=256)
    st = IceTable.create(spark, str(tmp_path / "s"), grid_df,
                         key_col="x", stat_cols=["y"],
                         max_rows_per_file=256)
    total = zt.file_count()
    assert total >= 8 and st.file_count() >= 8

    box = {"x": (0, 15), "y": (0, 15)}  # 1/16 of the grid
    z_files = _files_read(zt.range_scan(box))
    s_files = _files_read(st.range_scan(box))
    # z-order: only files overlapping the box survive; x-sorted layout
    # prunes on x only (y spans every file)
    assert z_files < s_files
    assert z_files <= total // 2

    # y-only query: x-sorted layout cannot prune at all
    y_files_z = _files_read(zt.range_scan({"y": (0, 7)}))
    y_files_s = _files_read(st.range_scan({"y": (0, 7)}))
    assert y_files_z < zt.file_count()
    assert y_files_s == st.file_count()  # every file overlaps y range


def test_zorder_correctness_vs_bruteforce(spark, grid_df, tmp_path):
    zt = IceTable.create(spark, str(tmp_path / "z2"), grid_df,
                         key_col="x", zorder_by=["x", "y"],
                         max_rows_per_file=256)
    got = sorted(r.payload for r in
                 zt.range_scan({"x": (10, 20), "y": (30, 40)}).collect())
    expect = sorted(
        r.payload for r in grid_df.filter(
            F.col("x").between(10, 20) & F.col("y").between(30, 40)
        ).collect()
    )
    assert got == expect


def test_zorder_persists_across_appends(spark, grid_df, tmp_path):
    zt = IceTable.create(spark, str(tmp_path / "z3"),
                         grid_df.filter(F.col("payload") < 2048),
                         key_col="x", zorder_by=["x", "y"],
                         max_rows_per_file=256)
    zt.append(grid_df.filter(F.col("payload") >= 2048),
              dedupe_identical_files=False)
    snap = zt.manifest.load()
    assert snap.zorder_by == ["x", "y"]  # config inherited by append
    assert all("y" in f.col_stats for f in snap.files)
    assert zt.scan().count() == 64 * 64


def test_rename_zdim_prune_append_compact(spark, grid_df, tmp_path):
    """Schema evolution × z-order × compaction composition: rename a
    z-ordered dimension (metadata-only — allowed because pruning
    resolves stats through the alias chain), verify pruning on the NEW
    name over pre-rename files, append post-rename files (stats under
    the new physical name), then compact and range_scan again — the
    rewrite must preserve contents and restore single-name stats."""
    zt = IceTable.create(spark, str(tmp_path / "zr"),
                         grid_df.filter(F.col("payload") < 2048),
                         key_col="x", zorder_by=["x", "y"],
                         max_rows_per_file=256)
    zt.rename_column("y", "depth")
    snap = zt.manifest.load()
    assert snap.zorder_by == ["x", "depth"]  # layout config followed
    assert snap.stat_cols == ["x", "depth"]
    assert all("y" in f.col_stats for f in snap.files)  # old physical

    # pruning on the renamed dimension still works over pre-rename files
    box = {"depth": (0, 7)}
    assert _files_read(zt.range_scan(box)) < zt.file_count()
    got = sorted(r.payload for r in zt.range_scan(box).collect())
    expect = sorted(r.payload for r in grid_df.filter(
        (F.col("payload") < 2048) & F.col("y").between(0, 7)).collect())
    assert got == expect

    # post-rename appends write stats under the NEW physical name;
    # a scan + pruned range_scan spans both stat generations
    zt.append(
        grid_df.filter(F.col("payload") >= 2048)
        .withColumnRenamed("y", "depth"),
        dedupe_identical_files=False)
    mixed = sorted(r.payload for r in
                   zt.range_scan({"depth": (30, 40)}).collect())
    expect_mixed = sorted(r.payload for r in grid_df.filter(
        F.col("y").between(30, 40)).collect())
    assert mixed == expect_mixed

    # compact: rewritten files carry the new physical name; contents
    # and pruning on the renamed dimension survive the rewrite
    zt.compact(target_rows_per_file=512)
    snap2 = zt.manifest.load()
    assert all("depth" in f.col_stats for f in snap2.files)
    assert _files_read(zt.range_scan(box)) < zt.file_count()
    after = sorted(r.payload for r in
                   zt.range_scan({"depth": (30, 40)}).collect())
    assert after == expect_mixed


def test_zorder_rejects_bad_types(spark, tmp_path):
    df = __import__("iceberg_core_spark.session", fromlist=["load_table"])
    docs = df.load_table(spark, "/root/testdata/sf0.001", "documents")
    with pytest.raises(TypeError, match="integral/timestamp"):
        IceTable.create(spark, str(tmp_path / "bad"), docs,
                        key_col="doc_id", zorder_by=["doc_id", "text"])
