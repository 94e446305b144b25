"""Property-based tests (hypothesis): the table layer is a content-
preserving store for arbitrary key distributions, range queries agree
with a brute-force filter, and the as-of join matches a per-row
reference implementation."""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iceberg_core_spark.operators.asof import asof_join
from iceberg_core_spark.table import IceTable
from tests.fixtures import KEY_COL, PARTITION_COL, location_df, location_row

KEYS = st.lists(
    st.integers(min_value=-(10**12), max_value=10**12),
    min_size=1, max_size=40,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(keys=KEYS, bounds=st.tuples(
    st.integers(min_value=-(10**12), max_value=10**12),
    st.integers(min_value=-(10**12), max_value=10**12),
))
def test_range_query_equals_bruteforce(spark, tmp_path_factory, keys, bounds):
    lo, hi = min(bounds), max(bounds)
    root = str(tmp_path_factory.mktemp("prop") / "t")
    rows = [location_row(timestamp=k, user_id=f"u{i % 3}")
            for i, k in enumerate(keys)]
    t = IceTable.create(spark, root, location_df(spark, rows),
                        partition_col=PARTITION_COL, key_col=KEY_COL,
                        max_rows_per_file=7)
    got = sorted(
        (r.user_id, r.timestamp)
        for r in t.query("u0", lo, hi).collect()
    )
    expect = sorted(
        (f"u{i % 3}", k) for i, k in enumerate(keys)
        if i % 3 == 0 and lo <= k <= hi
    )
    assert got == expect
    # full scan preserves content exactly (multiset)
    assert sorted(r.timestamp for r in t.scan().collect()) == sorted(keys)


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    left_ts=st.lists(st.integers(min_value=0, max_value=10**6),
                     min_size=1, max_size=25),
    right_ts=st.lists(st.integers(min_value=0, max_value=10**6),
                      min_size=0, max_size=25, unique=True),
)
def test_asof_join_matches_reference_impl(spark, left_ts, right_ts):
    base = datetime.datetime(2024, 1, 1)
    to_ts = lambda s: base + datetime.timedelta(seconds=s)
    left = spark.createDataFrame(
        [(1, to_ts(s), i) for i, s in enumerate(left_ts)],
        ["uid", "ts", "lid"],
    )
    right = spark.createDataFrame(
        [(1, to_ts(s), 100 + i) for i, s in enumerate(sorted(right_ts))],
        ["uid", "ts", "rid"],
    ) if right_ts else spark.createDataFrame([], "uid long, ts timestamp, rid long")

    got = {
        r.lid: r.rid
        for r in asof_join(left, right, on="uid", left_ts="ts",
                           right_ts="ts", right_payload=["rid"]).collect()
    }
    rt = sorted(zip(sorted(right_ts), range(100, 100 + len(right_ts))))
    expect = {}
    for i, s in enumerate(left_ts):
        match = None
        for rs, rid in rt:
            if rs <= s:
                match = rid
            else:
                break
        expect[i] = match
    assert got == expect
