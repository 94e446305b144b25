"""Schema evolution, SQL views, and the salted aggregate."""

import pytest
from pyspark.sql import functions as F

from iceberg_core_spark.operators.skew import salted_agg
from iceberg_core_spark.session import load_table
from iceberg_core_spark.table import IceTable
from tests.fixtures import KEY_COL, PARTITION_COL, location_df, location_row

SF_DIR = "/root/testdata/sf0.001"


def test_append_evolve_adds_column(spark, tmp_path):
    t = IceTable.create(spark, str(tmp_path / "t"),
                        location_df(spark, [location_row(timestamp=1)]),
                        partition_col=PARTITION_COL, key_col=KEY_COL)
    wider = location_df(spark, [location_row(timestamp=2)]).withColumn(
        "battery", F.lit(0.5)
    )
    t.append(wider, evolve_schema=True)
    got = {r.timestamp: r.battery for r in t.scan().collect()}
    assert got == {1: None, 2: 0.5}  # old file reads new column as NULL
    # next append may omit the new column → filled with NULL
    t.append(location_df(spark, [location_row(timestamp=3)]),
             evolve_schema=True)
    assert t.scan().count() == 3
    assert "battery" in t.scan().columns


def test_append_without_evolve_rejects(spark, tmp_path):
    t = IceTable.create(spark, str(tmp_path / "t"),
                        location_df(spark, [location_row(timestamp=1)]),
                        partition_col=PARTITION_COL, key_col=KEY_COL)
    wider = location_df(spark, [location_row(timestamp=2)]).withColumn(
        "battery", F.lit(0.5)
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(wider)


def test_rename_column_metadata_only(spark, tmp_path):
    """rename_column must not rewrite data: same file list, new schema;
    pre-rename files read through the alias chain."""
    t = IceTable.create(spark, str(tmp_path / "t"),
                        location_df(spark, [location_row(timestamp=1)]),
                        partition_col=PARTITION_COL, key_col=KEY_COL)
    before = t.manifest.load()
    snap = t.rename_column("latitude", "lat")
    assert snap.operation == "rename"
    assert [f.path for f in snap.files] == [f.path for f in before.files]
    assert "lat" in t.scan().columns and "latitude" not in t.scan().columns
    assert t.scan().first().lat == 37.0  # value read via the alias
    # chained rename resolves through BOTH retired names
    t.rename_column("lat", "lat_deg")
    assert t.scan().first().lat_deg == 37.0


def test_rename_then_append_mixed_physical_names(spark, tmp_path):
    """Files written after the rename carry the NEW physical name; a
    scan must merge both generations correctly."""
    t = IceTable.create(spark, str(tmp_path / "t"),
                        location_df(spark, [location_row(timestamp=1)]),
                        partition_col=PARTITION_COL, key_col=KEY_COL)
    t.rename_column("latitude", "lat")
    new_schema_df = location_df(
        spark, [location_row(timestamp=2, latitude=38.5)]
    ).withColumnRenamed("latitude", "lat")
    t.append(new_schema_df)
    got = {r.timestamp: r.lat for r in t.scan().collect()}
    assert got == {1: 37.0, 2: 38.5}


def test_rename_guards(spark, tmp_path):
    t = IceTable.create(spark, str(tmp_path / "t"),
                        location_df(spark, [location_row(timestamp=1)]),
                        partition_col=PARTITION_COL, key_col=KEY_COL)
    with pytest.raises(ValueError, match="no such column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="partition/key/bucket"):
        t.rename_column(KEY_COL, "key2")
    t.rename_column("latitude", "lat")
    with pytest.raises(ValueError, match="retired"):
        t.rename_column("longitude", "latitude")  # reuse retired name
    # evolve-append may not reintroduce a retired name either: this df
    # still carries the OLD "latitude" name, now a retired alias
    wider = location_df(spark, [location_row(timestamp=2)])
    with pytest.raises(ValueError, match="retired"):
        t.append(wider, evolve_schema=True)


def test_rename_retries_lost_commit_race(spark, tmp_path):
    """A metadata-only rename losing the commit CAS must reload the
    winner, re-validate its guards, and retry — not surface
    CommitConflictError for a safely retryable operation."""
    root = str(tmp_path / "t")
    t = IceTable.create(spark, root,
                        location_df(spark, [location_row(timestamp=1)]),
                        partition_col=PARTITION_COL, key_col=KEY_COL)
    racer = IceTable(spark, root)
    real_commit = t.manifest.commit
    fired = {"n": 0}

    def racing_commit(snap):
        if fired["n"] == 0:
            fired["n"] += 1
            # a concurrent append wins the CAS between rename's read
            # and its commit attempt
            racer.append(location_df(spark, [location_row(timestamp=2)]),
                         dedupe_identical_files=False)
        return real_commit(snap)

    t.manifest.commit = racing_commit
    snap = t.rename_column("latitude", "lat")
    t.manifest.commit = real_commit
    assert snap.operation == "rename"
    assert fired["n"] == 1
    got = {r.timestamp: r.lat for r in t.scan().collect()}
    assert got == {1: 37.0, 2: 37.0}  # winner's row survived the rename


def test_to_view_sql_roundtrip(spark, tmp_path):
    rows = [location_row(timestamp=t) for t in (1, 2, 3)]
    t = IceTable.create(spark, str(tmp_path / "t"),
                        location_df(spark, rows),
                        partition_col=PARTITION_COL, key_col=KEY_COL)
    t.to_view("locations_v")
    got = spark.sql(
        "SELECT count(*) AS n FROM locations_v WHERE timestamp >= 2"
    ).first()
    assert got.n == 2


def test_salted_agg_equals_plain(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    salted = {
        (r.l_returnflag): (r.total_price, r.n)
        for r in salted_agg(li, ["l_returnflag"],
                            sums={"l_extendedprice": "total_price"},
                            count_alias="n", salt=8).collect()
    }
    plain = {
        (r.l_returnflag): (r.total_price, r.n)
        for r in li.groupBy("l_returnflag").agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").alias("total_price"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
    }
    assert salted == plain  # exact — decimal partials are associative
