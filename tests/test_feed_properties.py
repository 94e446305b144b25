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


# --- rewrite-op model (r14 VERDICT #4) -------------------------------------
# op codes: ("append", n) n fresh keys; ("upsert", sel, n, mode)
# update an existing-key subset chosen by bitmask `sel` plus n fresh
# inserts; ("delete", sel, mode) delete an existing-key subset;
# ("compact",) rewrite everything in place; ("rollback", i) to an
# earlier snapshot. Rewrites make file-path diffs useless as a row
# model, so the bookkeeping tracks TWO row sets per snapshot — the
# VISIBLE mapping k -> v, and the RESIDENT multiset of rows physically
# present in visible files (MoR keeps replaced/deleted rows resident
# but hidden; CoW rewrites and compaction collapse resident back to
# visible) — and each feed is checked against its own contract:
# - scan_changes NETs to the visible-row delta exactly (a pure
#   compaction nets to zero — its headline guarantee);
# - diff_stats is file-level by contract (per-file row counts include
#   MoR-hidden rows; a metadata-only MoR delete moves nothing), so its
#   net row count must equal the RESIDENT cardinality delta;
# - scan_incremental emits rows of ADDED files under until's delete
#   predicates: only until-visible rows, no row twice, and every
#   newly-visible row EXCEPT those uncovered purely by predicate
#   removal on a common file (rollback past a MoR delete) — those were
#   resident at `since`, so the must-emit set is
#   (visible_until - visible_since) - resident_since.
_REWRITE_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(1, 3)),
        st.tuples(st.just("upsert"), st.integers(0, 255),
                  st.integers(0, 2), st.sampled_from(["cow", "mor"])),
        st.tuples(st.just("delete"), st.integers(1, 255),
                  st.sampled_from(["cow", "mor"])),
        st.tuples(st.just("compact")),
        st.tuples(st.just("rollback"), st.integers(0, 10)),
    ),
    min_size=2, max_size=6,
)


def _pick(keys, bitmask):
    """Deterministic subset of sorted keys from an 8-bit mask."""
    ks = sorted(keys)
    return [k for i, k in enumerate(ks) if bitmask >> (i % 8) & 1]


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ops=_REWRITE_OPS,
       window=st.tuples(st.integers(0, 10), st.integers(0, 10)))
def test_change_feeds_agree_with_row_model_under_rewrites(
        spark, tmp_path_factory, ops, window):
    root = str(tmp_path_factory.mktemp("feeds_rw") / "t")
    t = IceTable.create(
        spark, root,
        spark.createDataFrame([(0, 100), (1, 101)], "k long, v long"),
        partition_col=None, key_col="k")

    next_key = [10]
    next_v = [1000]

    def fresh(n):
        lo = next_key[0]; next_key[0] += n
        return list(range(lo, lo + n))

    def bump():
        next_v[0] += 1
        return next_v[0]

    cur = {0: 100, 1: 101}           # visible mapping k -> v
    res = [(0, 100), (1, 101)]       # rows resident in visible files
    sid0 = t.manifest.load(load_files=False).snapshot_id
    visible = {sid0: dict(cur)}
    resident = {sid0: list(res)}

    for op in ops:
        kind = op[0]
        try:
            if kind == "append":
                rows = [(k, bump()) for k in fresh(op[1])]
                t.append(spark.createDataFrame(rows, "k long, v long"))
                cur.update(dict(rows))
                res = res + rows
            elif kind == "upsert":
                _, sel, n_new, mode = op
                rows = ([(k, bump()) for k in _pick(cur, sel)]
                        + [(k, bump()) for k in fresh(n_new)])
                if not rows:
                    continue
                t.upsert(spark.createDataFrame(rows, "k long, v long"),
                         key_cols=["k"], mode=mode)
                cur.update(dict(rows))
                # mor appends the batch (old rows stay resident,
                # hidden); cow with no partition scoping is a full
                # rewrite — resident collapses to visible
                res = (res + rows if mode == "mor"
                       else sorted(cur.items()))
            elif kind == "delete":
                _, sel, mode = op
                doomed = _pick(cur, sel)
                if not doomed:
                    continue
                t.delete_where(
                    f"k IN ({', '.join(str(k) for k in doomed)})",
                    mode=mode)
                for k in doomed:
                    del cur[k]
                if mode != "mor":  # mor delete is metadata-only
                    res = sorted(cur.items())
            elif kind == "compact":
                t.compact(min_files=1)
                res = sorted(cur.items())
            elif kind == "rollback":
                sids = sorted(visible)
                target = sids[op[1] % len(sids)]
                t.rollback(target)
                cur = dict(visible[target])
                res = list(resident[target])
        except ValueError:
            continue  # invalid op for current state: skip
        sid = t.manifest.load(load_files=False).snapshot_id
        visible[sid] = dict(cur)
        resident[sid] = list(res)

    sids = sorted(visible)
    i, j = window[0] % len(sids), window[1] % len(sids)
    since, until = sids[min(i, j)], sids[max(i, j)]
    if since == until:
        return
    rows_since = set(visible[since].items())
    rows_until = set(visible[until].items())
    added = rows_until - rows_since
    removed = rows_since - rows_until

    # scan_changes: NET visible-row delta, exactly (zero for a pure
    # compaction)
    ch = t.scan_changes(since=since, until=until).collect()
    ins = sorted((r.k, r.v) for r in ch if r._change_type == "insert")
    dels = sorted((r.k, r.v) for r in ch if r._change_type == "delete")
    assert ins == sorted(added)
    assert dels == sorted(removed)

    # diff_stats: file-level by contract — per-file row counts include
    # MoR-hidden rows, so the net equals the RESIDENT delta (a
    # metadata-only MoR delete nets zero here, by design)
    stats = t.diff_stats(since=since, until=until).collect()
    net = sum(r.rows_added for r in stats) - sum(
        r.rows_removed for r in stats)
    assert net == len(resident[until]) - len(resident[since])

    # scan_incremental: rows of ADDED files under until's predicates —
    # only until-visible rows, no row twice, and every newly-visible
    # row except those uncovered purely by predicate removal on a
    # common file (they were resident at `since`)
    inc = [(r.k, r.v) for r in
           t.scan_incremental(since=since, until=until).collect()]
    assert len(inc) == len(set(inc))
    must_emit = added - set(resident[since])
    assert must_emit <= set(inc) <= rows_until
