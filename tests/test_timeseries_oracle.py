"""Batch time-series operators (sessionize / gapfill): oracle matches
at sf0.001, plus semantic unit checks on constructed frames where the
expected sessions and fill values are known by hand."""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from iceberg_core_spark.operators.timeseries import (
    QUERIES,
    gapfill_interpolate,
    gapfill_locf,
    sessionize,
)
from tests.oracle import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", list(QUERIES))
def test_oracle_match(spark, con, name):
    fn, sql = QUERIES[name]
    compare(fn(spark, SF_DIR), con, sql, name)


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


def test_sessionize_splits_on_gap(spark):
    # 3 events 10 min apart (one session), then a 31-min gap (new
    # session); a second user interleaved stays independent
    rows = [
        Row(user_id=1, event_id=1, ts=_ts(0)),
        Row(user_id=1, event_id=2, ts=_ts(10)),
        Row(user_id=1, event_id=3, ts=_ts(20)),
        Row(user_id=1, event_id=4, ts=_ts(51)),
        Row(user_id=2, event_id=5, ts=_ts(5)),
    ]
    out = sessionize(spark.createDataFrame(rows)).collect()
    sess = {r.event_id: r.session_id for r in out}
    assert sess[1] == sess[2] == sess[3] == 1
    assert sess[4] == 2
    assert sess[5] == 1


def test_sessionize_gap_boundary_exact_30min_stays(spark):
    # exactly 30:00.000000 is NOT > the gap — same session
    rows = [
        Row(user_id=1, event_id=1, ts=_ts(0)),
        Row(user_id=1, event_id=2, ts=_ts(30)),
    ]
    out = sessionize(spark.createDataFrame(rows)).collect()
    assert {r.session_id for r in out} == {1}


def test_gapfill_carries_last_value_forward(spark):
    rows = [
        Row(k="a", bucket=_ts(0), v=1.0),
        # minute 1-2 missing
        Row(k="a", bucket=_ts(3), v=4.0),
        Row(k="b", bucket=_ts(0), v=9.0),
    ]
    out = gapfill_locf(
        spark.createDataFrame(rows), "k", "bucket", "v",
        step_expr="interval 1 minute",
    ).collect()
    a = {r.bucket.minute: (r.v, r.was_gap) for r in out if r.k == "a"}
    assert a == {0: (1.0, 0), 1: (1.0, 1), 2: (1.0, 1), 3: (4.0, 0)}
    # key b has a single bucket: no synthesized rows, no bleed from a
    b = [(r.v, r.was_gap) for r in out if r.k == "b"]
    assert b == [(9.0, 0)]


def test_interpolate_linear_between_neighbors(spark):
    # observations at minute 0 (v=1) and minute 4 (v=9): the three
    # missing minutes interpolate linearly to 3, 5, 7
    rows = [
        Row(k="a", bucket=_ts(0), v=1.0),
        Row(k="a", bucket=_ts(4), v=9.0),
    ]
    out = gapfill_interpolate(
        spark.createDataFrame(rows), "k", "bucket", "v",
        step_expr="interval 1 minute",
    ).collect()
    got = {r.bucket.minute: (r.v, r.was_gap) for r in out}
    assert got == {0: (1.0, 0), 1: (3.0, 1), 2: (5.0, 1),
                   3: (7.0, 1), 4: (9.0, 0)}


def test_gapfill_single_shuffle_window_per_key(spark):
    # the LOCF window partitions by the key: the plan must not contain
    # a global (un-partitioned) sort
    rows = [Row(k="a", bucket=_ts(0), v=1.0), Row(k="a", bucket=_ts(2), v=2.0)]
    plan = gapfill_locf(
        spark.createDataFrame(rows), "k", "bucket", "v",
        step_expr="interval 1 minute",
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "rangepartitioning" not in plan.lower()


def test_downsample_ohlc_endpoints_and_ties(spark):
    """open/close are the FIRST/LAST values by (ts, tiebreak) within
    the bucket — a tie on ts must resolve by the tiebreak column, not
    arrival order; min/max/avg/count cover the whole bucket."""
    from iceberg_core_spark.operators.timeseries import downsample_ohlc

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # one 6h bucket, two events tied on ts at the open
        Row(event_id=5, ts=t0, value=50.0, k="a"),
        Row(event_id=2, ts=t0, value=20.0, k="a"),
        Row(event_id=9, ts=t0 + datetime.timedelta(hours=1),
            value=90.0, k="a"),
        # second bucket
        Row(event_id=1, ts=t0 + datetime.timedelta(hours=7),
            value=70.0, k="a"),
    ]
    out = {r["bucket"]: r for r in downsample_ohlc(
        spark.createDataFrame(rows), "k", "ts", "value",
        tiebreak_col="event_id", step_us=6 * 3600 * 1_000_000
    ).collect()}
    b0 = out[t0]
    # tie at t0: event_id 2 wins the open
    assert b0["open_value"] == 20.0
    assert b0["close_value"] == 90.0
    assert b0["low_value"] == 20.0 and b0["high_value"] == 90.0
    assert b0["n_events"] == 3
    assert abs(b0["avg_value"] - (50 + 20 + 90) / 3) < 1e-12
    b1 = out[t0 + datetime.timedelta(hours=6)]
    assert b1["open_value"] == b1["close_value"] == 70.0


def test_downsample_ohlc_key_is_total_order_on_full_int64(spark):
    """The (epoch-µs, tiebreak) endpoint key must be a TOTAL order over
    the full int64 × int64 domain: tiebreaks wider than any fixed pad
    (lpad TRUNCATES over-width input), negative tiebreaks, and
    pre-1970 timestamps — the naive sign-carrying pad misorders all
    three silently (both engines agree, so only a hand oracle catches
    it)."""
    from iceberg_core_spark.operators.timeseries import downsample_ohlc

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # same ts: 13-digit tiebreak vs its 12-char prefix — a 12-char
        # pad truncates 1000000000000 to '100000000000' and collides
        Row(event_id=1_000_000_000_000, ts=t0, value=1.0, k="wide"),
        Row(event_id=100_000_000_000, ts=t0, value=2.0, k="wide"),
        # same ts: negative tiebreaks order numerically, not by '-'
        Row(event_id=-9, ts=t0, value=3.0, k="neg"),
        Row(event_id=-5, ts=t0, value=4.0, k="neg"),
        Row(event_id=2, ts=t0, value=5.0, k="neg"),
        # pre-1970 timestamps: negative epoch-µs must order before 0
        Row(event_id=1, ts=datetime.datetime(1969, 12, 31, 23, 0, 0),
            value=6.0, k="pre"),
        Row(event_id=1, ts=datetime.datetime(1969, 12, 31, 23, 30, 0),
            value=7.0, k="pre"),
    ]
    out = {r["k"]: r for r in downsample_ohlc(
        spark.createDataFrame(rows), "k", "ts", "value",
        tiebreak_col="event_id", step_us=6 * 3600 * 1_000_000
    ).collect()}
    assert out["wide"]["open_value"] == 2.0   # 1e11 < 1e12
    assert out["wide"]["close_value"] == 1.0
    assert out["neg"]["open_value"] == 3.0    # -9 < -5 < 2
    assert out["neg"]["close_value"] == 5.0
    assert out["pre"]["open_value"] == 6.0    # 23:00 < 23:30, both <1970
    assert out["pre"]["close_value"] == 7.0
