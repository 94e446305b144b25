"""Change-feed model property (r14): random rewrite-free histories
must keep scan_incremental, diff_stats, and scan_changes agreeing
with a visibility bookkeeping model."""
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from iceberg_core_spark.table import IceTable

# op codes: ("main", k) append k rows to main; ("stage", br, k) staged
# append; ("publish", br); ("drop", br); ("rollback",) to a random
# earlier snapshot (drawn as an index).
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("main"), st.integers(1, 3)),
        st.tuples(st.just("stage"), st.sampled_from(["b1", "b2"]),
                  st.integers(1, 3)),
        st.tuples(st.just("publish"), st.sampled_from(["b1", "b2"])),
        st.tuples(st.just("drop"), st.sampled_from(["b1", "b2"])),
        st.tuples(st.just("rollback"), st.integers(0, 10)),
    ),
    min_size=1, max_size=7,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ops=_OPS, window=st.tuples(st.integers(0, 10), st.integers(0, 10)))
def test_change_feeds_agree_with_visibility_model(spark, tmp_path_factory,
                                                  ops, window):
    """Model check over random append/stage/publish/drop/rollback
    histories (rewrite-free ops, so file-path diffs are exact): the
    MAIN-VIEW consumer's three feeds must agree with a visibility
    bookkeeping model — scan_incremental emits exactly the rows that
    became visible in the window, diff_stats reports the same
    adds/removes, and scan_changes nets to the same inserts/deletes."""
    root = str(tmp_path_factory.mktemp("feeds") / "t")
    t = IceTable.create(
        spark, root,
        spark.range(0, 2).withColumnRenamed("id", "k"),
        partition_col=None, key_col="k")

    next_val = [100]

    def fresh(k):
        lo = next_val[0]; next_val[0] += k
        return list(range(lo, lo + k))

    # model state per committed snapshot id: frozenset of visible row
    # values (appends are rewrite-free so visible rows == union of
    # visible appends' rows)
    sid0 = t.manifest.load(load_files=False).snapshot_id
    visible = {sid0: frozenset(range(0, 2))}
    staged_rows = {}   # branch -> list[frozenset] currently staged
    staged_state = {sid0: {}}  # per-snapshot staged bookkeeping
    cur_visible = frozenset(range(0, 2))

    for op in ops:
        kind = op[0]
        try:
            if kind == "main":
                vals = fresh(op[1])
                t.append(spark.createDataFrame([(v,) for v in vals],
                                               "k long"))
                cur_visible = cur_visible | frozenset(vals)
            elif kind == "stage":
                br, k = op[1], op[2]
                vals = fresh(k)
                t.append(spark.createDataFrame([(v,) for v in vals],
                                               "k long"), branch=br)
                staged_rows.setdefault(br, []).append(frozenset(vals))
            elif kind == "publish":
                br = op[1]
                if br not in staged_rows:
                    continue
                t.publish_branch(br)
                for s in staged_rows.pop(br):
                    cur_visible = cur_visible | s
            elif kind == "drop":
                br = op[1]
                if br not in staged_rows:
                    continue
                t.drop_branch(br)
                staged_rows.pop(br)
            elif kind == "rollback":
                sids = sorted(visible)
                target = sids[op[1] % len(sids)]
                t.rollback(target)
                cur_visible = visible[target]
                # rollback inherits the TARGET's staged dict wholesale
                staged_rows = {b: list(v)
                               for b, v in staged_state[target].items()}
        except ValueError:
            continue  # invalid op for current state: skip
        sid = t.manifest.load(load_files=False).snapshot_id
        visible[sid] = cur_visible
        staged_state[sid] = {b: list(v) for b, v in staged_rows.items()}

    sids = sorted(visible)
    i, j = window[0] % len(sids), window[1] % len(sids)
    since, until = sids[min(i, j)], sids[max(i, j)]
    if since == until:
        return
    added = visible[until] - visible[since]
    removed = visible[since] - visible[until]

    inc = sorted(r.k for r in
                 t.scan_incremental(since=since, until=until).collect())
    assert inc == sorted(added)

    stats = t.diff_stats(since=since, until=until).collect()
    assert sum(r.rows_added for r in stats) == len(added)
    assert sum(r.rows_removed for r in stats) == len(removed)

    ch = t.scan_changes(since=since, until=until).collect()
    ins = sorted(r.k for r in ch if r._change_type == "insert")
    dels = sorted(r.k for r in ch if r._change_type == "delete")
    assert ins == sorted(added)
    assert dels == sorted(removed)
