"""Bucketized range join: exact semantics vs a brute-force theta join
on constructed frames, the DuckDB oracle on driver testdata, and the
plan gate (equi-join on the bucket — never BroadcastNestedLoopJoin)."""

import pytest
from pyspark.sql import functions as F

from iceberg_core_spark.operators.rangejoin import (
    QUERIES,
    range_join,
)
from tests.oracle import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"


def _frames(spark):
    pts = spark.createDataFrame(
        [(i,) for i in [0, 3, 7, 10, 13, 21, 22, 35, -5, -1]],
        "p long")
    ivals = spark.createDataFrame(
        [(1, 0, 9), (2, 7, 7), (3, 10, 30), (4, -10, -2), (5, 40, 50)],
        "iid long, lo long, hi long")
    return pts, ivals


def test_range_join_matches_bruteforce(spark):
    pts, ivals = _frames(spark)
    expect = sorted(
        (r["p"], r["iid"])
        for r in pts.crossJoin(ivals)
        .filter("p between lo and hi").collect())
    for w in (1, 3, 7, 100):  # width never changes the answer
        got = sorted((r["p"], r["iid"]) for r in
                     range_join(pts, ivals, "p", "lo", "hi",
                                bucket_width=w).collect())
        assert got == expect, f"width {w}"


def test_range_join_boundary_and_negative_buckets(spark):
    """Inclusive endpoints and negative-domain bucketing (pmod floors
    toward -inf, so -5 lands in bucket -7 at width 7, not -0)."""
    pts, ivals = _frames(spark)
    got = {(r["p"], r["iid"]) for r in
           range_join(pts, ivals, "p", "lo", "hi",
                      bucket_width=7).collect()}
    assert (0, 1) in got and (7, 1) in got       # inclusive lo/hi
    assert (7, 2) in got                          # degenerate interval
    assert (-5, 4) in got                         # negative domain
    assert (-1, 4) not in got                     # -1 > hi(-2)
    assert not any(iid == 5 for _, iid in got)    # empty interval


def test_range_join_plan_is_equi_not_nested_loop(spark):
    pts, ivals = _frames(spark)
    plan = range_join(pts, ivals, "p", "lo", "hi", bucket_width=7) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_rangejoin_oracle_match(spark, name):
    fn, sql = QUERIES[name]
    con = duck_connection(SF_DIR)
    compare(fn(spark, SF_DIR), con, sql, name)


def test_range_join_inverted_interval_matches_nothing(spark):
    """hi < lo contains nothing under BETWEEN semantics — it must not
    crash sequence() and must not match."""
    pts = spark.createDataFrame([(5,), (10,)], "p long")
    ivals = spark.createDataFrame(
        [(1, 10, 5), (2, 4, 6)], "iid long, lo long, hi long")
    got = {(r["p"], r["iid"]) for r in
           range_join(pts, ivals, "p", "lo", "hi",
                      bucket_width=3).collect()}
    assert got == {(5, 2)}


def test_range_join_left_keeps_unmatched_points_once(spark):
    pts = spark.createDataFrame([(1,), (100,)], "p long")
    ivals = spark.createDataFrame([(1, 0, 2)], "iid long, lo long, hi long")
    rows = range_join(pts, ivals, "p", "lo", "hi",
                      bucket_width=1, how="left").collect()
    assert sorted((r["p"], r["iid"]) for r in rows) \
        == [(1, 1), (100, None)]


def test_range_join_rejects_interval_side_outer_joins(spark):
    pts = spark.createDataFrame([(1,)], "p long")
    ivals = spark.createDataFrame([(1, 0, 9)], "iid long, lo long, hi long")
    for how in ("right", "full", "outer", "cross"):
        with pytest.raises(ValueError, match="PER REPLICA|not supported"):
            range_join(pts, ivals, "p", "lo", "hi",
                       bucket_width=3, how=how)
