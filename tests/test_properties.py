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


# CDC model check: a random sequence of change batches applied through
# apply_cdc (both CoW and MoR) must equal a plain dict replay.
_CDC_OPS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),     # key within partition
        st.integers(min_value=0, max_value=2),     # partition index
        st.sampled_from(["U", "D"]),
        st.floats(min_value=-100, max_value=100,
                  allow_nan=False, allow_infinity=False),
    ),
    min_size=1, max_size=12,
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(batch1=_CDC_OPS, batch2=_CDC_OPS,
       mode=st.sampled_from(["cow", "mor"]))
def test_apply_cdc_matches_dict_model(spark, tmp_path_factory, batch1,
                                      batch2, mode):
    """Two random change batches (updates/deletes with in-batch
    ordering) applied through apply_cdc equal a sequential dict
    replay — for BOTH the copy-on-write and merge-on-read paths."""
    root = str(tmp_path_factory.mktemp("cdcprop") / "t")
    seed = [location_row(timestamp=k, user_id=f"u{p}", latitude=0.0)
            for p in range(3) for k in range(5)]
    t = IceTable.create(spark, root, location_df(spark, seed),
                        partition_col=PARTITION_COL, key_col=KEY_COL,
                        max_rows_per_file=4)
    model = {(f"u{p}", k): 0.0 for p in range(3) for k in range(5)}

    from pyspark.sql.types import LongType, StringType, StructField
    from tests.fixtures import LOCATION_SCHEMA

    cdc_schema = type(LOCATION_SCHEMA)(
        list(LOCATION_SCHEMA.fields)
        + [StructField("op", StringType()),
           StructField("seq", LongType())])

    for batch in (batch1, batch2):
        rows = []
        for i, (k, p, op, lat) in enumerate(batch):
            r = location_row(timestamp=k, user_id=f"u{p}",
                             latitude=round(lat, 3))
            rows.append({**r.asDict(), "op": op, "seq": i})
        t.apply_cdc(spark.createDataFrame(rows, cdc_schema),
                    key_cols=[PARTITION_COL, KEY_COL],
                    op_col="op", seq_col="seq", mode=mode)
        last = {}
        for k, p, op, lat in batch:     # last write per key wins
            last[(f"u{p}", k)] = (op, round(lat, 3))
        for key, (op, lat) in last.items():
            if op == "D":
                model.pop(key, None)
            else:
                model[key] = lat
    got = {(r.user_id, r.timestamp): r.latitude
           for r in t.scan().collect()}
    assert got == model


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


# Corpus ops model check: repetition signals computed by the Spark
# explode/agg plan must equal a direct Counter-based reference on
# arbitrary token soups (including single-token and heavy-repeat docs).
_DOCS = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "dd", "ee"]),
             min_size=1, max_size=12),
    min_size=1, max_size=8,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(docs=_DOCS)
def test_repetition_signals_match_counter_model(spark, docs):
    from collections import Counter

    from iceberg_core_spark.functions.quality import repetition_signals

    df = spark.createDataFrame(
        [(i, "en", " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, lang string, text string",
    )
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert set(got) == set(range(len(docs)))
    for i, toks in enumerate(docs):
        uni = Counter(toks)
        big = Counter(
            f"{x} {y}" for x, y in zip(toks, toks[1:])
        )
        r = got[i]
        assert r["n_tokens"] == len(toks)
        assert r["n_distinct"] == len(uni)

        def fr6(x):
            import math
            return math.floor(x * 1e6 + 0.5) / 1e6

        assert r["rep_ratio"] == fr6(1.0 - len(uni) / len(toks))
        assert r["top_tok_frac"] == fr6(max(uni.values()) / len(toks))
        if len(toks) >= 2:
            assert r["top_bigram_frac"] == fr6(
                max(big.values()) / (len(toks) - 1))
        else:
            assert r["top_bigram_frac"] is None


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ids=st.lists(st.integers(min_value=0, max_value=10**9),
                    min_size=1, max_size=60, unique=True),
       n_shards=st.integers(min_value=1, max_value=7))
def test_shuffle_assign_is_stable_permutation(spark, ids, n_shards):
    """Every id appears exactly once, positions are 1..k per shard, and
    the assignment is a pure function of the id (stable across runs and
    input partitioning)."""
    from iceberg_core_spark.functions.assembly import shuffle_assign

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = {r["doc_id"]: (r["shard"], r["pos"])
           for r in shuffle_assign(df, n_shards=n_shards).collect()}
    assert set(out) == set(ids)
    by_shard: dict = {}
    for sh, pos in out.values():
        assert 0 <= sh < n_shards
        by_shard.setdefault(sh, []).append(pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # stability: a differently-partitioned recomputation agrees exactly
    out2 = {r["doc_id"]: (r["shard"], r["pos"])
            for r in shuffle_assign(df.repartition(5),
                                    n_shards=n_shards).collect()}
    assert out2 == out


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(corpus=_DOCS, batch=_DOCS)
def test_dedup_batch_matches_bruteforce_model(spark, corpus, batch):
    """Incremental admission vs a Python model on arbitrary token
    soups: the exact tier must be COMPLETE and minimal-id-correct
    (verdict is exact_dup iff some corpus doc has identical normalized
    text, matching the smallest such id); the near tier must be SOUND
    (a near_dup's reported jacc equals the true shingle Jaccard with
    its match and clears the threshold; LSH recall is probabilistic so
    non-detection is not asserted); unique implies not-exact."""
    from iceberg_core_spark.functions.dedup_incremental import dedup_batch

    c_rows = [(i + 1, " ".join(toks)) for i, toks in enumerate(corpus)]
    b_rows = [(100 + i, " ".join(toks)) for i, toks in enumerate(batch)]
    cdf = spark.createDataFrame(c_rows, "doc_id long, text string")
    bdf = spark.createDataFrame(b_rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup_batch(cdf, bdf).collect()}
    assert set(out) == {i for i, _ in b_rows}

    def norm(t):
        return " ".join(t.lower().split())

    def sh(t):
        w = t.lower().split()
        return {" ".join(w[i:i + 3]) for i in range(max(len(w) - 2, 1))}

    def jacc(a, b):
        i = len(a & b)
        return i / (len(a) + len(b) - i)

    for bid, text in b_rows:
        r = out[bid]
        exact_ids = [cid for cid, ct in c_rows if norm(ct) == norm(text)]
        if exact_ids:
            assert r.verdict == "exact_dup", (bid, r)
            assert r.match_id == min(exact_ids)
            assert r.jacc is None
        elif r.verdict == "near_dup":
            truth = jacc(sh(text), sh(dict(c_rows)[r.match_id]))
            assert r.jacc is not None and abs(r.jacc - truth) < 1e-3
            assert r.jacc >= 0.5
        else:
            assert r.verdict == "unique"
            assert r.match_id is None and r.jacc is None


# ---- net changelog + incremental rollup vs a multiset model ---------

_TBL_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.lists(
            st.tuples(st.integers(0, 30), st.sampled_from("abc"),
                      st.integers(0, 100)),
            min_size=1, max_size=5)),
        st.tuples(st.just("upsert"), st.lists(
            st.tuples(st.integers(0, 30), st.sampled_from("abc"),
                      st.integers(0, 100)),
            min_size=1, max_size=4, unique_by=lambda r: r[0])),
        st.tuples(st.just("delete"), st.integers(0, 100)),
        st.tuples(st.just("compact")),
    ),
    min_size=2, max_size=5,
)


@settings(max_examples=4, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ops=_TBL_OPS)
def test_changelog_and_rollup_match_multiset_model(
        spark, tmp_path_factory, ops):
    """Random append/upsert/MoR-delete/compact sequences: after every
    commit the incrementally-folded rollup equals a from-scratch
    recompute, and the net changelog from ANY earlier snapshot equals
    the multiset difference of the model states."""
    from collections import Counter

    from iceberg_core_spark.table import MaterializedRollup

    base = tmp_path_factory.mktemp("chgprop")
    root = str(base / "t")

    def df_of(rows):
        return spark.createDataFrame(rows, "k long, g string, v long")

    seed = [(0, "a", 5), (1, "b", 7), (0, "a", 5)]  # dup row on purpose
    t = IceTable.create(spark, root, df_of(seed), partition_col=None,
                        key_col="k", max_rows_per_file=2)
    model = Counter(seed)
    ru = MaterializedRollup(spark, str(base / "ru"),
                            group_cols=["g"], sum_cols=["v"],
                            min_cols=["v"], max_cols=["v"])
    ru.refresh(t)
    states = [(t.manifest.load(load_files=False).snapshot_id,
               Counter(model))]

    for op in ops:
        if op[0] == "append":
            t.append(df_of(op[1]), dedupe_identical_files=False)
            model.update(op[1])
        elif op[0] == "upsert":
            t.upsert(df_of(op[1]), key_cols=["k"])
            keys = {r[0] for r in op[1]}
            model = Counter({r: n for r, n in model.items()
                             if r[0] not in keys})
            model.update(op[1])
        elif op[0] == "delete":
            t.delete_where(f"v >= {op[1]}", mode="mor")
            model = Counter({r: n for r, n in model.items()
                             if r[2] < op[1]})
        else:
            t.compact(min_files=2)
        ru.refresh(t)
        # rollup == from-scratch recompute after EVERY commit
        got = sorted(map(tuple, ru.read().collect()))
        want = sorted(map(tuple, (
            t.scan().groupBy("g")
            .agg(F.count(F.lit(1)).alias("row_count"),
                 F.sum(F.col("v").cast("decimal(18,6)"))
                 .cast("decimal(28,6)").alias("sum_v"),
                 F.min("v").alias("min_v"),
                 F.max("v").alias("max_v"))
        ).collect()))
        assert got == want
        states.append((t.manifest.load(load_files=False).snapshot_id,
                       Counter(model)))

    # the table itself equals the model (sanity on the model)
    assert Counter(map(tuple, t.scan().collect())) == model

    # net changelog from EVERY recorded snapshot == multiset diff
    for sid, snap_model in states[:-1]:
        ins, dels = Counter(), Counter()
        for r in t.scan_changes(since=sid).collect():
            row = (r["k"], r["g"], r["v"])
            (ins if r["_change_type"] == "insert" else dels)[row] += 1
        assert ins == model - snap_model, (sid, ins, model - snap_model)
        assert dels == snap_model - model, (sid, dels)


# MERGE model check: random target/source states + random ordered
# clauses replayed against a plain-Python first-applicable-wins model.
_MERGE_STATE = st.tuples(
    # target rows: key -> (v, seq)
    st.dictionaries(st.integers(min_value=0, max_value=9),
                    st.tuples(st.integers(min_value=0, max_value=50),
                              st.integers(min_value=0, max_value=5)),
                    min_size=1, max_size=8),
    # source rows: key -> (v, seq, flag)
    st.dictionaries(st.integers(min_value=0, max_value=12),
                    st.tuples(st.integers(min_value=0, max_value=50),
                              st.integers(min_value=0, max_value=5),
                              st.sampled_from(["D", "U"])),
                    min_size=1, max_size=8),
    # insert threshold for the NOT MATCHED condition
    st.integers(min_value=0, max_value=50),
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(state=_MERGE_STATE)
def test_merge_matches_clause_model(spark, tmp_path_factory, state):
    """merge() with [tombstone delete, newer-wins partial update] +
    conditional insert equals a per-row Python replay of the same
    ordered clause semantics."""
    target, source, thr = state
    root = str(tmp_path_factory.mktemp("mrg") / "t")
    t = IceTable.create(
        spark, root,
        spark.createDataFrame(
            [(k, v, s) for k, (v, s) in target.items()],
            "k long, v long, seq long"),
        partition_col=None, key_col="k")
    src = spark.createDataFrame(
        [(k, v, s, f) for k, (v, s, f) in source.items()],
        "k long, v long, seq long, flag string")
    t.merge(src, key_cols=["k"],
            when_matched=[
                {"condition": "s.flag = 'D'", "action": "delete"},
                {"condition": "s.seq > t.seq", "action": "update",
                 "set": {"v": "s.v", "seq": "s.seq"}},
            ],
            when_not_matched_insert=f"v < {thr}")

    model = dict(target)
    for k, (v, s, f) in source.items():
        if k in model:
            if f == "D":
                model.pop(k)
            elif s > model[k][1]:
                model[k] = (v, s)
        elif v < thr:
            model[k] = (v, s)
    got = sorted((r.k, r.v, r.seq) for r in t.scan().collect())
    assert got == sorted((k, v, s) for k, (v, s) in model.items())


# --- OHLC downsampling vs a per-row python model ----------------------

_I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
# timestamps Spark can round-trip (TimestampType is µs within roughly
# year 1..9999); include pre-1970 negatives explicitly
_TS_US = st.integers(min_value=-62_000_000_000_000_000,
                     max_value=250_000_000_000_000_000)
_OHLC_ROWS = st.lists(
    st.tuples(_TS_US, _I64,
              st.floats(min_value=-1e6, max_value=1e6,
                        allow_nan=False, allow_infinity=False,
                        width=32),
              st.sampled_from(["a", "b"])),
    min_size=1, max_size=60,
    # a duplicated (key, ts, tiebreak) with different values would make
    # the endpoints genuinely ambiguous — not the property under test
    unique_by=lambda r: (r[3], r[0], r[1]),
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=_OHLC_ROWS)
def test_downsample_ohlc_matches_python_model(spark, rows):
    """open/close/low/high/count over arbitrary int64 timestamps and
    tiebreaks (full-domain negatives and 19-digit values included)
    must equal the obvious per-row python model: the endpoint key is
    claimed to be a total order over int64 × int64, and any encoding
    slip (sign handling, pad truncation) flips an endpoint silently
    in BOTH engines, so only a model oracle can catch it."""
    from collections import defaultdict

    from iceberg_core_spark.operators.timeseries import downsample_ohlc

    step = 3_600_000_000  # 1h in µs
    df = spark.createDataFrame(
        [(k, datetime.datetime(1970, 1, 1)
          + datetime.timedelta(microseconds=us), i, float(v))
         for us, i, v, k in rows],
        "k string, ts timestamp, event_id long, value double")
    got = {
        (r["k"], r["bucket"]): r
        for r in downsample_ohlc(df, "k", "ts", "value",
                                 tiebreak_col="event_id",
                                 step_us=step).collect()
    }
    model: dict = defaultdict(list)
    for us, i, v, k in rows:
        bucket = (us // step) * step  # floor division: exact for <0
        model[(k, bucket)].append(((us, i), float(v)))
    assert set(got) == {
        (k, datetime.datetime(1970, 1, 1)
         + datetime.timedelta(microseconds=b))
        for (k, b) in model
    }
    for (k, b), events in model.items():
        r = got[(k, datetime.datetime(1970, 1, 1)
                 + datetime.timedelta(microseconds=b))]
        events.sort(key=lambda e: e[0])
        assert r["open_value"] == events[0][1], (k, b, "open")
        assert r["close_value"] == events[-1][1], (k, b, "close")
        assert r["low_value"] == min(v for _, v in events)
        assert r["high_value"] == max(v for _, v in events)
        assert r["n_events"] == len(events)


# --- bucketized range join vs brute force ------------------------------

_RJ_INTS = st.integers(min_value=-(10**6), max_value=10**6)


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    points=st.lists(_RJ_INTS, min_size=1, max_size=25),
    spans=st.lists(st.tuples(_RJ_INTS, st.integers(0, 5000)),
                   min_size=1, max_size=12),
    width=st.integers(min_value=1, max_value=7000),
)
def test_range_join_matches_bruteforce_model(spark, points, spans, width):
    """The bucketized composition is pure plumbing: for ANY bucket
    width it must produce exactly the brute-force interval matches —
    the subtle parts are the negative-domain bucket floor (pmod) and
    the sequence endpoints, which a wrong floor silently shifts."""
    from iceberg_core_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame([(p,) for p in points], "p long")
    ivals = spark.createDataFrame(
        [(i, lo, lo + ln) for i, (lo, ln) in enumerate(spans)],
        "iid long, lo long, hi long")
    got = sorted((r["p"], r["iid"]) for r in
                 range_join(pts, ivals, "p", "lo", "hi",
                            bucket_width=width).collect())
    expect = sorted(
        (p, i)
        for p in points
        for i, (lo, ln) in enumerate(spans) if lo <= p <= lo + ln)
    assert got == expect


# Row-wholesale carry model check (the r13 asof bug class, generalized):
# multiple groups, MULTIPLE payload columns with random NULLs, and an
# optional tolerance. The reference picks the single latest right ROW
# per left row and attaches its payloads verbatim — a per-column carry
# would assemble values from different rows whenever the matched row
# holds a NULL and an older row does not, which this generator produces
# constantly.
_ASOF_RIGHT = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),          # group
        st.integers(min_value=0, max_value=30),         # ts
        st.one_of(st.none(), st.integers(0, 99)),       # payload a
        st.one_of(st.none(), st.integers(0, 99)),       # payload b
    ),
    min_size=0, max_size=25,
    unique_by=lambda r: (r[0], r[1]),  # unique (group, ts): no ties
)
_ASOF_LEFT = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2),
              st.integers(min_value=0, max_value=30)),
    min_size=1, max_size=25,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(left_rows=_ASOF_LEFT, right_rows=_ASOF_RIGHT,
       tol=st.one_of(st.none(), st.integers(min_value=0, max_value=10)))
def test_asof_join_carries_rows_wholesale(spark, left_rows, right_rows,
                                          tol):
    left = spark.createDataFrame(
        [(g, t, i) for i, (g, t) in enumerate(left_rows)],
        "g long, ts long, lid long")
    right = (spark.createDataFrame(
        right_rows, "g long, ts long, a long, b long")
        if right_rows
        else spark.createDataFrame([], "g long, ts long, a long, b long"))
    got = {
        r.lid: (r.a, r.b)
        for r in asof_join(left, right, on="g", left_ts="ts",
                           right_ts="ts", right_payload=["a", "b"],
                           tolerance=tol).collect()
    }
    expect = {}
    for i, (g, t) in enumerate(left_rows):
        cand = [r for r in right_rows if r[0] == g and r[1] <= t]
        if not cand:
            expect[i] = (None, None)
            continue
        match = max(cand, key=lambda r: r[1])
        if tol is not None and t - match[1] > tol:
            expect[i] = (None, None)
        else:
            expect[i] = (match[2], match[3])  # the ROW's payloads
    assert got == expect
