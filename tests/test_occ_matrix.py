"""OCC pairing matrix: seeded multi-op interleavings beyond the
append×maintain race (the composition class where the r5 OCC bug
lived). Client discipline under test:

- append / overwrite auto-rebase inside ``_write_commit``;
- read-modify-write ops (upsert, apply_cdc, overwrite_partitions,
  compact) raise ``CommitConflictError`` and the CALLER retries
  against fresh state;
- maintenance (compact ticks, expire) skips a lost race.

Each pairing asserts the final table equals the single-writer model —
nothing lost, nothing duplicated, retries converge.
"""

import threading

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from iceberg_core_spark.table import CommitConflictError, IceTable


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "t")


def _df(spark, rows):
    return spark.createDataFrame(rows, "part string, k long, v long")


def _mk(spark, root, parts=("p",), n=10):
    rows = [Row(part=p, k=i, v=0) for p in parts for i in range(n)]
    return IceTable.create(spark, root, _df(spark, rows),
                           partition_col="part", key_col="k")


def _retry(fn, attempts=60):
    """The documented read-modify-write client loop: re-run against
    fresh state until the CAS wins."""
    for _ in range(attempts):
        try:
            return fn()
        except CommitConflictError:
            continue
    raise AssertionError("retry budget exhausted — livelock?")


def _run_threads(*targets):
    errs: list = []

    def wrap(t):
        def inner():
            try:
                t()
            except Exception as ex:  # pragma: no cover
                errs.append(repr(ex))
        return inner

    ths = [threading.Thread(target=wrap(t)) for t in targets]
    for th in ths:
        th.start()
    for th in ths:
        th.join(300)
    assert errs == [], errs


def test_upsert_races_compact(spark, root):
    """Generational upserts (same 10 keys) racing a compact ticker:
    every generation eventually lands, the final value per key is the
    LAST generation, and compaction never resurrects or drops a row."""
    t_w = _mk(spark, root)
    done = threading.Event()
    GENS = 4

    def writer():
        try:
            for gen in range(1, GENS + 1):
                batch = _df(spark, [Row(part="p", k=i, v=gen)
                                    for i in range(10)])
                _retry(lambda: t_w.upsert(batch, key_cols=["part", "k"]))
        finally:
            done.set()

    def ticker():
        t = IceTable(spark, root)
        while not done.is_set():
            try:
                t.compact(min_files=2)
            except CommitConflictError:
                pass

    _run_threads(writer, ticker)
    final = IceTable(spark, root)
    rows = {(r.k, r.v) for r in final.scan().collect()}
    assert rows == {(i, GENS) for i in range(10)}


def test_apply_cdc_races_expire(spark, root):
    """CDC batches (upserts + deletes) racing snapshot expiry: expiry
    must never invalidate the current state a retried CDC commit reads,
    and the final contents equal the batch sequence's model."""
    t_w = _mk(spark, root)  # k=0..9, v=0
    done = threading.Event()

    batches = [
        # b1: v=1 everywhere
        [Row(part="p", k=i, v=1, op="U") for i in range(10)],
        # b2: delete evens
        [Row(part="p", k=i, v=0, op="D") for i in range(0, 10, 2)],
        # b3: odds to v=3, resurrect k=0
        [Row(part="p", k=i, v=3, op="U") for i in range(1, 10, 2)]
        + [Row(part="p", k=0, v=3, op="U")],
    ]

    def writer():
        try:
            for b in batches:
                df = spark.createDataFrame(
                    b, "part string, k long, v long, op string")
                _retry(lambda: t_w.apply_cdc(
                    df, key_cols=["part", "k"], op_col="op"))
        finally:
            done.set()

    def expirer():
        t = IceTable(spark, root)
        while not done.is_set():
            try:
                t.expire_snapshots(keep_last=2)
            except CommitConflictError:  # pragma: no cover
                pass

    _run_threads(writer, expirer)
    final = IceTable(spark, root)
    got = {(r.k, r.v) for r in final.scan().collect()}
    want = {(0, 3)} | {(i, 3) for i in range(1, 10, 2)}
    assert got == want
    # expiry kept the chain scannable and bounded
    final.expire_snapshots(keep_last=1)
    assert {(r.k, r.v) for r in final.scan().collect()} == want


def test_overwrite_partitions_races_append(spark, root):
    """Dynamic partition overwrite of partition b racing appends into
    partition a: appends all survive (auto-rebase), partition b equals
    the LAST overwrite generation — the two ops compose because each
    touches disjoint partitions."""
    t_w = _mk(spark, root, parts=("a", "b"), n=3)  # a,b: k=0..2 v=0
    done = threading.Event()
    N_APP, GENS = 6, 4

    def appender():
        t = IceTable(spark, root)
        try:
            for i in range(N_APP):
                t.append(_df(spark, [Row(part="a", k=100 + i, v=7)]))
        finally:
            done.set()

    def overwriter():
        t = IceTable(spark, root)
        for gen in range(1, GENS + 1):
            batch = _df(spark, [Row(part="b", k=i, v=gen)
                                for i in range(3)])
            _retry(lambda: t.overwrite_partitions(batch))

    _run_threads(appender, overwriter)
    final = IceTable(spark, root)
    a = {(r.k, r.v) for r in final.scan().filter(F.col("part") == "a")
         .collect()}
    b = {(r.k, r.v) for r in final.scan().filter(F.col("part") == "b")
         .collect()}
    assert a == {(i, 0) for i in range(3)} | {(100 + i, 7)
                                              for i in range(N_APP)}
    assert b == {(i, GENS) for i in range(3)}


def test_add_files_races_compact(spark, root, tmp_path):
    """External-parquet registration racing a compact ticker: every
    migrated file's rows land exactly once; a registration that loses
    the CAS to a compact rebases (canonical schema compare — a compact
    must not read as a schema change) instead of aborting."""
    t_w = _mk(spark, root)  # p: k=0..9 v=0
    # stage 3 external hive-layout batches
    ext_roots = []
    for b in range(3):
        # full-schema files under a hive-style part=p segment
        # (partitionBy would strip the column from the footers, which
        # add_files validates against the table schema)
        ext = str(tmp_path / f"ext{b}" / "part=p")
        _df(spark, [Row(part="p", k=1000 + 10 * b + i, v=9)
                    for i in range(5)]) \
            .coalesce(1).write.parquet(ext)
        ext_roots.append(ext)

    import os

    def paths_of(ext):
        return sorted(
            os.path.join(dp, n)
            for dp, _d, ns in os.walk(ext)
            for n in ns if n.endswith(".parquet")
        )

    done = threading.Event()

    def migrator():
        try:
            for ext in ext_roots:
                _retry(lambda: t_w.add_files(paths_of(ext)))
        finally:
            done.set()

    def ticker():
        t = IceTable(spark, root)
        while not done.is_set():
            try:
                t.compact(min_files=2)
            except CommitConflictError:
                pass

    _run_threads(migrator, ticker)
    final = IceTable(spark, root)
    got = sorted(r.k for r in final.scan().collect())
    want = sorted(list(range(10))
                  + [1000 + 10 * b + i for b in range(3) for i in range(5)])
    assert got == want


def test_merge_races_compact(spark, root):
    """Generational multi-clause merges (update-if-newer + tombstone
    delete + insert) racing a compact ticker: the read-modify-write
    merge retries on a lost CAS against fresh state, so the final
    table equals the single-writer model regardless of interleaving."""
    t_w = _mk(spark, root)  # p: k=0..9, v=0
    done = threading.Event()
    GENS = 3

    def writer():
        try:
            for gen in range(1, GENS + 1):
                # touch k=0..9 (update), tombstone k = gen,
                # insert k = 100+gen
                batch = _df(spark, (
                    [Row(part="p", k=i, v=gen) for i in range(10)]
                    + [Row(part="p", k=100 + gen, v=gen)]))
                _retry(lambda: t_w.merge(
                    batch, key_cols=["part", "k"],
                    when_matched=[
                        {"condition": f"s.k = {gen}", "action": "delete"},
                        {"condition": "s.v > t.v", "action": "update"},
                    ],
                    when_not_matched_insert=True))
        finally:
            done.set()

    def ticker():
        t = IceTable(spark, root)
        while not done.is_set():
            try:
                t.compact(min_files=2)
            except CommitConflictError:
                pass

    _run_threads(writer, ticker)
    final = IceTable(spark, root)
    got = {(r.k, r.v) for r in final.scan().collect()}
    # single-writer model: gen g deletes key g then later gens
    # re-insert it at their v; survivors of all gens hold v=GENS
    # except re-inserted tombstones
    model: dict = {i: 0 for i in range(10)}
    for gen in range(1, GENS + 1):
        for i in range(10):
            if i == gen:
                model.pop(i, None)
            elif i in model and gen > model[i]:
                model[i] = gen
            elif i not in model:
                model[i] = gen  # re-insert via NOT MATCHED
        model[100 + gen] = gen
    assert got == {(k, v) for k, v in model.items()}
