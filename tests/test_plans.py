"""Physical-plan quality gates: the optimizations we rely on at 100 TB
must actually appear in the plans — pushdown reaching the scan,
broadcast vs sort-merge join selection, partial aggregation, manifest
file pruning, and whole-stage codegen."""

import pytest

from iceberg_core_spark.operators import relational as R
from iceberg_core_spark.table import IceTable
from tests.fixtures import KEY_COL, PARTITION_COL, location_df, location_row

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark):
    df = R.filter_range(spark, SF_DIR)
    s = explain_str(df)
    assert "PushedFilters:" in s
    assert "GreaterThanOrEqual(ts" in s and "LessThanOrEqual(ts" in s
    assert "EqualTo(user_id,7)" in s


def test_column_pruning_in_read_schema(spark):
    df = R.project(spark, SF_DIR)
    s = explain_str(df)
    # 11-column lineitem, 4-column projection → scan reads only 4 inputs
    assert "ReadSchema: struct<l_orderkey:bigint,l_partkey" not in s
    assert "l_comment" not in s
    read = [l for l in s.splitlines() if "ReadSchema" in l][0]
    assert read.count(":") <= 6  # 4 fields and cheap margin


def test_broadcast_join_is_broadcast(spark):
    s = plan_of(R.join_broadcast(spark, SF_DIR))
    assert "BroadcastHashJoin" in s


def test_sortmerge_hint_respected(spark):
    s = plan_of(R.join_sortmerge(spark, SF_DIR))
    assert "SortMergeJoin" in s


def test_semi_anti_join_physical(spark):
    assert "LeftSemi" in plan_of(R.join_semi(spark, SF_DIR))
    assert "LeftAnti" in plan_of(R.join_anti(spark, SF_DIR))


def test_q21_single_pass_window_no_cartesian(spark):
    """Q21's EXISTS/NOT-EXISTS are order-local predicates answered by
    ONE window over l_orderkey (r15 optimization) — the plan must
    scan lineitem exactly once (the r14 shape scanned it three
    times: base + LeftSemi + LeftAnti self-joins) and never plan a
    cartesian (the non-equi suppkey<>suppkey parts are now window-
    local set sizes, not join residuals)."""
    from iceberg_core_spark.operators.tpch import tpch_q21

    df = tpch_q21(spark, SF_DIR)
    s = plan_of(df)
    assert "Window" in s
    assert "Cartesian" not in s and "BroadcastNestedLoop" not in s
    e = explain_str(df)
    li_scans = [l for l in e.splitlines()
                if "Location" in l and "lineitem" in l]
    assert len(li_scans) == 1, f"lineitem scanned {len(li_scans)}x"


def test_q17_decorrelated_no_cartesian(spark):
    """Q17's per-part cap joins back as an equi-join on partkey with a
    partial+final aggregate feeding it."""
    from iceberg_core_spark.operators.tpch import tpch_q17

    s = plan_of(tpch_q17(spark, SF_DIR))
    assert "Cartesian" not in s and "BroadcastNestedLoop" not in s
    assert s.count("HashAggregate") >= 2  # partial+final cap aggregate


def test_q2_decorrelated_min_no_cartesian(spark):
    """Q2's correlated regional-MIN joins back as an equi-join on
    (partkey, cost); nation/region ride as broadcasts."""
    from iceberg_core_spark.operators.tpch import tpch_q2

    s = plan_of(tpch_q2(spark, SF_DIR))
    assert "Cartesian" not in s and "BroadcastNestedLoop" not in s
    assert "BroadcastHashJoin" in s  # nation/region dims
    assert s.count("HashAggregate") >= 2  # partial+final min aggregate


def test_q9_q16_q20_join_shapes(spark):
    """Q9's 5-way join stays all-equi; Q16's NOT-IN exclusion plans as
    a broadcast anti join; Q20's IN-subqueries plan as a semi join —
    none may degrade to a cartesian."""
    from iceberg_core_spark.operators.tpch import (
        tpch_q9,
        tpch_q16,
        tpch_q20,
    )

    for q in (tpch_q9, tpch_q16, tpch_q20):
        s = plan_of(q(spark, SF_DIR))
        assert "Cartesian" not in s and "BroadcastNestedLoop" not in s
    assert "LeftAnti" in plan_of(tpch_q16(spark, SF_DIR))
    assert "LeftSemi" in plan_of(tpch_q20(spark, SF_DIR))


def test_agg_partial_final(spark):
    # map-side partial aggregation (two HashAggregate levels)
    s = plan_of(R.agg_hash(spark, SF_DIR))
    assert s.count("HashAggregate") >= 2
    assert "partial_" in s


def test_topk_take_ordered(spark):
    s = plan_of(R.sort_limit(spark, SF_DIR))
    assert "TakeOrderedAndProject" in s  # no global sort materialized


def test_whole_stage_codegen_on_scan_filter(spark):
    # executedPlan marks codegen'd spans with a "*(stageId)" prefix
    s = plan_of(R.filter_pred(spark, SF_DIR))
    assert "*(1)" in s


def test_manifest_pruning_limits_input_files(spark, tmp_path):
    rows = [location_row(timestamp=t) for t in range(0, 1000, 100)]
    t = IceTable.create(spark, str(tmp_path / "t"), location_df(spark, rows),
                        partition_col=PARTITION_COL, key_col=KEY_COL,
                        max_rows_per_file=1)
    total = t.file_count()
    assert total >= 10
    narrow = t.query("userid1", 150, 250)  # overlaps 1-2 files
    assert len(narrow.inputFiles()) <= 2
    assert len(t.scan().inputFiles()) == total


def test_broadcast_threshold_config(spark):
    # dimension tables broadcast without hints too (64 MiB threshold)
    from iceberg_core_spark.session import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    n = load_table(spark, SF_DIR, "nation")
    joined = li.join(n, li.l_suppkey % 25 == n.n_nationkey)
    assert "BroadcastHashJoin" in plan_of(joined)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # both sides bucketed on the join key → the join itself must plan
    # with ZERO exchanges (the whole point of write-time co-location)
    from iceberg_core_spark.operators.bucketed import (
        bucketed_join,
        write_bucketed,
    )

    left = spark.range(0, 10_000).selectExpr("id AS k", "id * 2 AS a")
    right = spark.range(0, 10_000).selectExpr("id AS k", "id * 3 AS b")
    write_bucketed(left, "t_bkt_l", "k", 4, path=str(tmp_path / "l"))
    write_bucketed(right, "t_bkt_r", "k", 4, path=str(tmp_path / "r"))
    # disable broadcast so the plan is the large-large case bucketing
    # exists for (at sf-test size AQE would otherwise just broadcast)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "t_bkt_l", "t_bkt_r", "k")
        assert j.count() == 10_000
        s = plan_of(j)
        assert "Exchange hashpartitioning" not in s  # no shuffle at all
        assert "SortMergeJoin" in s or "ShuffledHashJoin" in s
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bkt_l")
        spark.sql("DROP TABLE IF EXISTS t_bkt_r")


def test_corpus_quality_one_explode_hash_aggs(spark):
    """Repetition signals: generator explode feeds partial-first hash
    aggregation; no Python in the path, no cartesian, no window."""
    from iceberg_core_spark.functions.quality import corpus_quality

    s = plan_of(corpus_quality(spark, SF_DIR))
    assert s.count("Generate explode") == 1
    assert "HashAggregate" in s
    assert "partial_count" in s or "partial" in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert "CartesianProduct" not in s
    assert "Window" not in s


def test_corpus_shuffle_single_exchange(spark):
    """Deterministic shuffle: the ONLY exchange is the shard hash
    partition (per-shard sort, never a global sort), and the scan
    prunes to the id column."""
    from iceberg_core_spark.functions.assembly import corpus_shuffle

    df = corpus_shuffle(spark, SF_DIR)
    s = plan_of(df)
    assert s.count("Exchange") == 1
    assert "hashpartitioning(shard" in s
    assert "rangepartitioning" not in s
    assert "ReadSchema: struct<doc_id:bigint>" in explain_str(df)


def test_decontaminate_exact_broadcast_no_pairs(spark):
    """Exact n-gram decontamination: the benchmark-sized eval gram set
    broadcasts; no train-train or gram-gram pair join, no cartesian,
    no Python in the path."""
    from iceberg_core_spark.functions.decontam import (
        corpus_decontaminate_exact,
    )

    s = plan_of(corpus_decontaminate_exact(spark, SF_DIR))
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s
    assert "SortMergeJoin" not in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_vocab_topk_take_ordered(spark):
    """Top-k vocab must plan as TakeOrderedAndProject (per-partition
    heaps + k-row driver merge), never a global sort; the rank window
    runs above the limit, over k rows."""
    from iceberg_core_spark.functions.vocab import vocab_topk

    s = plan_of(vocab_topk(spark, SF_DIR))
    assert "TakeOrderedAndProject" in s
    assert "rangepartitioning" not in s


def test_minhash_portable_skinny_shuffle_no_python(spark):
    """Portable MinHash-LSH: signature computation is pure map-side
    Column work (no Python anywhere), and the candidate join is an
    equi-join — no cartesian."""
    from iceberg_core_spark.functions.dedup_portable import (
        dedup_minhash_portable,
    )

    s = plan_of(dedup_minhash_portable(spark, SF_DIR))
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert "CartesianProduct" not in s
    assert "md5" in s  # signatures inside codegen projections


def test_embedding_portable_no_python_no_cartesian(spark):
    """Portable hyperplane-LSH: the integer bucketing is pure Column
    work inside codegen, candidates come from an equi-join on the
    bucket key — no Python evaluators, no cartesian anywhere."""
    from iceberg_core_spark.functions.dedup_portable import (
        dedup_embedding_lsh_portable,
    )

    s = plan_of(dedup_embedding_lsh_portable(spark, SF_DIR))
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert "CartesianProduct" not in s


def test_sim_search_portable_single_scan_topk(spark):
    """Portable ANN: one corpus pass filtered by the bucket predicate,
    top-k as TakeOrderedAndProject (never a global sort), no Python."""
    from iceberg_core_spark.functions.dedup_portable import (
        sim_search_lsh_portable,
    )

    s = plan_of(sim_search_lsh_portable(spark, SF_DIR))
    assert "TakeOrderedAndProject" in s
    assert "rangepartitioning" not in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_kmv_no_python_two_phase(spark):
    """Portable KMV distinct: hashing and the distinct stay JVM-side;
    the final per-group aggregate is a partial/final hash aggregate."""
    from iceberg_core_spark.functions.dedup_portable import (
        agg_approx_distinct_portable,
    )

    s = plan_of(agg_approx_distinct_portable(spark, SF_DIR))
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert "HashAggregate" in s


def test_ivf_portable_broadcast_centroids_topk(spark):
    """Portable IVF: the corpus streams once against BROADCAST
    centroid/probe sets (no shuffle of the vector side before the
    rank window), top-k via TakeOrderedAndProject, no Python."""
    from iceberg_core_spark.functions.dedup_portable import (
        sim_search_ivf_portable,
    )

    s = plan_of(sim_search_ivf_portable(spark, SF_DIR))
    assert "TakeOrderedAndProject" in s
    assert "BroadcastNestedLoopJoin" in s or "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_dedup_incremental_asymmetric_no_cartesian_no_python(spark):
    """Incremental admission dedup: both tiers are equi-joins (the
    exact tier on fp, the near tier on band keys — never a cartesian
    or nested-loop), everything stays JVM-side, and both scans read
    only the two columns the pipeline uses (id + text)."""
    from iceberg_core_spark.functions.dedup_incremental import (
        dedup_incremental,
    )

    df = dedup_incremental(spark, SF_DIR)
    s = plan_of(df)
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    e = explain_str(df)
    reads = [l for l in e.splitlines() if "ReadSchema" in l]
    assert reads and all("lang" not in l and "source" not in l
                         for l in reads)


def test_scan_changes_diff_exchanges_are_skinny(spark, tmp_path):
    """The changelog's multiset diff must shuffle 32-byte row hashes,
    never the wide text payload: the count-diff Exchanges carry
    exactly (hash, count); any Exchange that does carry the text
    column is the bounded representative-fetch after the net-change
    filter (its input includes the __net column), so its volume
    tracks the NET CHANGE, not the changed-file row count."""
    import re

    df = spark.createDataFrame(
        [(i, "x" * 50, i % 3) for i in range(30)],
        "k long, text string, g long")
    t = IceTable.create(spark, str(tmp_path / "t"), df,
                        partition_col=None, key_col="k")
    s0 = t.manifest.load(load_files=False).snapshot_id
    t.append(spark.createDataFrame([(100, "y" * 50, 0)],
                                   "k long, text string, g long"))
    changes = t.scan_changes(s0)
    e = explain_str(changes)

    # formatted explain: "(N) Exchange" nodes followed by an
    # "Input [n]: [cols...]" line
    blocks = re.split(r"\n\(\d+\) ", e)
    exchanges = [b for b in blocks if b.startswith("Exchange")]
    assert exchanges, "expected Exchange nodes in the changelog plan"
    inputs = []
    for b in exchanges:
        m = re.search(r"Input \[\d+\]: \[([^\]]*)\]", b)
        assert m, f"no Input line for exchange block: {b[:120]}"
        inputs.append(m.group(1))
    skinny = [i for i in inputs if "__h#" in i and "count#" in i
              and "text#" not in i]
    assert len(skinny) >= 2  # one per diff side
    # text may appear in two other exchange shapes: the bounded
    # representative fetch (input includes __net — volume = net
    # change) and the payload-join SMJ sides, which AQE replaces
    # with broadcast at runtime (verified on the executed plan below)
    for i in inputs:
        if "text#" in i and "__net#" not in i:
            assert "__h#" in i  # payload join side, AQE-broadcastable

    # and the output is still the exact multiset diff
    rows = [(r["k"], r["_change_type"])
            for r in changes.collect()]
    assert rows == [(100, "insert")]
    executed = plan_of(changes)
    assert "isFinalPlan=true" in executed
    # both payload-fetch joins adaptively broadcast — the wide side
    # never shuffles; the only full-width exchange is the __net-keyed
    # representative aggregate over already-matched (changed) rows
    assert executed.count("BroadcastHashJoin") >= 2


def test_bloom_point_scan_limits_input_files(spark, tmp_path):
    """Equality on a non-clustered high-cardinality column: min/max
    stats keep every file (each spans the id space), the bloom store
    must prove absence for all but the true file (+ rare false
    positives)."""
    from pyspark.sql import functions as F

    df = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        F.pmod(F.col("id") * 2654435761, F.lit(997)).alias("v"))
    t = IceTable.create(spark, str(tmp_path / "t"), df,
                        partition_col=None, key_col="v",
                        max_rows_per_file=100)
    total = t.file_count()
    assert total >= 15
    assert t.build_bloom(["k"]) == total
    assert t.build_bloom() == 0  # idempotent

    # stats alone prune nothing on k...
    assert len(t.range_scan({"k": (1234, 1234)}).inputFiles()) == total
    # ...the bloom reduces it to the true file (fpp margin: 2)
    ps = t.point_scan("k", 1234)
    assert [r["k"] for r in ps.collect()] == [1234]
    assert len(ps.inputFiles()) <= 2
    # absent value: nothing read, nothing returned
    ab = t.point_scan("k", 10**9)
    assert len(ab.inputFiles()) <= 2 and ab.count() == 0
    # unindexed appends are conservatively KEPT until the next build
    t.append(spark.createDataFrame([(5000, 1)], "k long, v long"))
    assert [r["k"] for r in t.point_scan("k", 5000).collect()] == [5000]
    assert t.build_bloom() == 1
    assert len(t.point_scan("k", 5000).inputFiles()) <= 2


def test_bloom_relative_root_and_evolved_column(spark, tmp_path):
    """Two review regressions: (a) a RELATIVE table root must not
    mis-key the bloom store (the normalization strips the absolute
    root; a mismatch must raise, never silently write all-zero rows
    that prune everything); (b) a schema-evolved column no pending
    file physically carries gets all-zero rows (correct: equality
    never matches NULL) instead of crashing or staying pending."""
    import os

    # relative root (resolved against the launch cwd both by Python
    # and by the JVM): prefix-stripping the RELATIVE root from the
    # absolute input_file_name URIs would mis-key every store row
    rel = os.path.relpath(str(tmp_path / "t"), os.getcwd())
    assert not os.path.isabs(rel)
    df = spark.createDataFrame([(i, i % 5) for i in range(100)],
                               "k long, v long")
    t = IceTable.create(spark, rel, df, partition_col=None,
                        key_col="v", max_rows_per_file=20)
    assert t.file_count() > 1
    assert t.build_bloom(["k"]) == t.file_count()
    ps = t.point_scan("k", 42)
    assert [r["k"] for r in ps.collect()] == [42]
    assert len(ps.inputFiles()) <= 2

    # (b) evolve in a column the existing files lack
    t2 = IceTable.create(spark, str(tmp_path / "t2"),
                         spark.createDataFrame([(1, 1)], "k long, v long"),
                         partition_col=None, key_col="v")
    t2.append(spark.createDataFrame([(2, 2, 7)],
                                    "k long, v long, q long"),
              evolve_schema=True)
    n = t2.build_bloom(["q"])
    assert n == t2.file_count()
    got = t2.point_scan("q", 7).collect()
    assert [(r["k"], r["q"]) for r in got] == [(2, 7)]
    # the value lives only in the evolved file; the pre-evolution
    # file's all-zero bloom prunes it
    assert len(t2.point_scan("q", 7).inputFiles()) == 1
    assert t2.build_bloom() == 0  # nothing stays pending


def test_point_scan_multi_limits_input_files(spark, tmp_path):
    """IN-list + AND-of-equalities through the bloom store: per-column
    verdicts intersect, IN probes union inside one hash job — the scan
    reads only files that may hold one of the IN values AND the other
    conjunct's value."""
    from pyspark.sql import functions as F

    df = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("g"),
        F.pmod(F.col("id") * 2654435761, F.lit(997)).alias("v"))
    t = IceTable.create(spark, str(tmp_path / "t"), df,
                        partition_col=None, key_col="v",
                        max_rows_per_file=100)
    total = t.file_count()
    assert t.build_bloom(["k", "g"]) == 2 * total

    # IN-list: up to one true file per value (+ fpp margin)
    ps = t.point_scan_multi({"k": [3, 700, 1500]})
    assert sorted(r["k"] for r in ps.collect()) == [3, 700, 1500]
    assert len(ps.inputFiles()) <= 5
    # AND intersection: k=700 exists but g=3 is false for it
    # (700 % 4 == 0) — the residual filter returns nothing, and the
    # pruning still bounds the read to k's candidate files
    both = t.point_scan_multi({"k": 700, "g": 3})
    assert both.count() == 0
    assert len(both.inputFiles()) <= 2
    # matching conjunction returns exactly the row
    hit = t.point_scan_multi({"k": [700, 1501], "g": 1})
    assert [r["k"] for r in hit.collect()] == [1501]
    # all-absent IN-list: nothing read
    ab = t.point_scan_multi({"k": [10**9, 10**9 + 1]})
    assert len(ab.inputFiles()) <= 2 and ab.count() == 0


def test_corpus_clean_dedup_shuffle_never_carries_text(spark):
    """r13: corpus_clean's exact-dedup window keys on md5(text) and
    drops the text column before the exchange, so the pipeline's main
    shuffle carries 32 hex chars + skinny columns — never document
    bodies (the r12 dedup_exact key rule applied to the window path).
    Gate: no window exchange's output schema contains the text column,
    and the partial WindowGroupLimit prunes to rank-1 rows map-side."""
    import re

    from iceberg_core_spark.functions.llm_queries import corpus_clean

    p = plan_of(corpus_clean(spark, SF_DIR))
    ex = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", p)
    assert ex, "expected hash exchanges in the corpus_clean plan"
    assert not any("text#" in e for e in ex), ex  # never keyed by text
    assert "md5(cast(text" in p  # the skinny key derivation exists ...
    # ... and text itself never crosses an exchange: the plan string
    # prints root-first, so everything before the LAST (deepest)
    # Exchange line is downstream of some exchange — none of it may
    # carry the text column (only the scan-side project below the
    # deepest exchange reads text, to derive md5/size)
    above_deepest = p[:p.rindex("Exchange hashpartitioning")]
    assert "text#" not in above_deepest
    # map-side rank-1 pruning before the shuffle
    assert "WindowGroupLimit" in p and "Partial" in p
