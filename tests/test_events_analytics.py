"""Funnel + cohort retention: hand-checked semantics on constructed
event streams and cross-engine oracles on driver testdata."""

import datetime

import pytest

from iceberg_core_spark.operators.events_analytics import (
    QUERIES,
    funnel,
    retention,
)
from tests.oracle import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"


def _ev(spark, rows):
    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(u, t, base + datetime.timedelta(minutes=m))
         for u, t, m in rows],
        "user_id long, event_type string, ts timestamp")


def test_funnel_requires_strict_order(spark):
    rows = [
        # u1 converts fully, in order
        (1, "view", 0), (1, "click", 5), (1, "purchase", 9),
        # u2 clicked BEFORE viewing: the click must not count, and
        # with no later click u2 stalls at step 0
        (2, "click", 1), (2, "view", 3), (2, "purchase", 8),
        # u3 views then clicks, never purchases
        (3, "view", 2), (3, "click", 4),
        # u4 purchase only: reaches nothing (no view)
        (4, "purchase", 6),
        # u5 view and click at the SAME minute later click: strict >
        (5, "view", 10), (5, "click", 10),
    ]
    out = {r["step_idx"]: r for r in funnel(
        _ev(spark, rows), ["view", "click", "purchase"]).collect()}
    assert out[0]["n_users"] == 4          # u1 u2 u3 u5 viewed
    assert out[1]["n_users"] == 2          # u1, u3 (u2 pre-click; u5 tie)
    assert out[2]["n_users"] == 1          # u1
    assert [out[i]["step"] for i in range(3)] \
        == ["view", "click", "purchase"]


def test_funnel_single_scan_single_user_shuffle(spark):
    """The one-scan restructure (r8 verdict task 3): an N-step funnel
    reads ``events`` exactly ONCE — the chained-join formulation
    scanned it once per step — and the only wide exchange is the one
    per-user hash aggregate (plus the single-row final count)."""
    from iceberg_core_spark.session import load_table

    df = funnel(load_table(spark, SF_DIR, "events"),
                ["view", "click", "purchase"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    # exchanges: user_id hash agg + the 1-row global count (+ the
    # explode's trivial single partition) — never one per step
    assert plan.count("Exchange hashpartitioning") == 1


def test_funnel_null_ts_or_user_never_converts(spark):
    rows = [(1, "view", None),
            (1, "click", datetime.datetime(2024, 1, 1, 0, 5)),
            (2, "view", datetime.datetime(2024, 1, 1)),
            (2, "click", datetime.datetime(2024, 1, 1, 0, 1)),
            # NULL user with a full conversion sequence: belongs to no
            # funnel — a groupBy would fuse all NULL users into one
            # pseudo-user that SQL equi-joins drop (r9 review)
            (None, "view", datetime.datetime(2024, 1, 1)),
            (None, "click", datetime.datetime(2024, 1, 1, 0, 2))]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp")
    out = {r["step_idx"]: r["n_users"]
           for r in funnel(ev, ["view", "click"]).collect()}
    # u1's only view is unordered (NULL ts): reaches nothing;
    # the NULL user is excluded entirely
    assert out == {0: 1, 1: 1}


def test_retention_cohorts_and_weeks(spark):
    day = 24 * 60
    rows = [
        (1, "view", 0),            # u1 cohort week 0
        (1, "view", 8 * day),      # active week 1
        (1, "view", 15 * day),     # active week 2
        (2, "view", 2 * day),      # u2 cohort week 0, never returns
        (3, "view", 9 * day),      # u3 cohort week 1
        (3, "view", 16 * day),     # active its week 1
    ]
    out = {(str(r["cohort_week"]), r["week_n"]): r["n_users"]
           for r in retention(_ev(spark, rows)).collect()}
    # 2024-01-01 is not a week boundary of the epoch grid; compute it
    import datetime as dt
    us0 = int(dt.datetime(2024, 1, 1).timestamp() * 1_000_000)
    wk_us = 7 * 24 * 3600 * 1_000_000
    w0 = dt.datetime.utcfromtimestamp(
        (us0 - us0 % wk_us) / 1_000_000).date()
    w1 = w0 + dt.timedelta(days=7)
    assert out[(str(w0), 0)] == 2          # u1 u2
    assert out[(str(w0), 1)] == 1          # u1
    assert out[(str(w0), 2)] == 1          # u1
    assert out[(str(w1), 0)] == 1          # u3
    assert out[(str(w1), 1)] == 1          # u3
    assert len(out) == 5


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_events_analytics_oracle_match(spark, name):
    fn, sql = QUERIES[name]
    con = duck_connection(SF_DIR)
    compare(fn(spark, SF_DIR), con, sql, name)
