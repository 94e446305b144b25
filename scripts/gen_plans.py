#!/usr/bin/env python
"""Regenerate PLANS.md — formatted physical plans of flagship operators
with notes on the plan properties that matter at scale (also asserted in
tests/test_plans.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PICKS = [
    ("filter_range", "Reference-shaped range query — type-driven: on TIMESTAMP(NANOS) data the predicate pushes to the raw-nanos scan (ns-mapped bounds); on native timestamp data (current datasets) the timestamp bounds push directly. Either way PushedFilters reaches the scan."),
    ("multimodal_features", "Real media decode — two chained Arrow-batched mapInPandas (encode WAV/PPM, parse headers + sample stats) in ONE stage after the spread shuffle; no other exchange at any scale (narrow per-row work)."),
    ("agg_hash", "TPC-H Q1 shape — two HashAggregate levels (partial_ on the map side before the shuffle); whole-stage codegen spans (*)."),
    ("join_broadcast", "Fact x dim — BroadcastHashJoin; the lineitem side never shuffles."),
    ("tpch_q5", "6-way join — dims broadcast, the one fact-fact join shuffles once; AQE re-plans at runtime."),
    ("join_asof", "As-of join — union + single range shuffle + running window; no range-explosion join."),
    ("topk_per_group", "Per-group top-k — window + filter, one shuffle on the group key."),
    ("sort_limit", "Global top-N — TakeOrderedAndProject, no full sort materialized."),
    ("dedup_minhash_lsh", "MinHash-LSH — band equi-join on (band_idx, band_hash) only; shingle arrays re-joined by id after candidate dedup."),
    ("dedup_embedding_lsh", "Embedding near-dup, bucketed — hyperplane-bucket equi-join (1-bit multiprobe explode on one side); only (bucket, id) shuffles, vectors re-joined by id for exact cosine on candidates."),
    ("join_bucketed", "Co-located fact-fact join — both sides bucketBy(orderkey) at write; NO Exchange on either join input (asserted with broadcast disabled in tests)."),
    ("split_train_test", "Hash-bucket split — pure map-side projection (md5 bucket), aggregation is the only shuffle; split assignment itself never shuffles."),
    ("zorder_range_scan", "Multi-dim pruned range query — the scan's file list comes PRE-PRUNED from manifest min/max stats on the Morton-clustered dimension (strict file subset, asserted in tests); the residual BETWEEN pushes to the surviving files' row groups."),
    ("schema_evolution", "Three-commit evolved table — rename resolves as a coalesce(current, retired) projection INSIDE the scan's codegen stage and the evolve-added column NULL-fills via schema-on-read; zero exchanges, zero data rewrite."),
    ("dedup_clusters", "Pairs → connected components — skinny candidate equi-join, verify stage repartitioned to cluster width (compute-proportional parallelism, not AQE's bytes-based coalescing), CC solved adaptively (driver union-find at this edge count)."),
    ("tpch_q1", "Pricing summary — single scan, two HashAggregate levels over a 6-group key; the shipdate filter pushes to the scan and only the 7 referenced columns read (ReadSchema)."),
    ("tpch_q4", "EXISTS decorrelated — LeftSemi join on orderkey with the extra shipdate>orderdate condition; only the orders side survives the join (no lineitem payload past it)."),
    ("tpch_q18", "HAVING semi-join — lineitem aggregates once to find big orders, survivors LeftSemi-shrink orders BEFORE the wide customer join; both lineitem passes shuffle on the same key."),
    ("tpch_q21", "EXISTS/NOT-EXISTS self-joins — the late-lineitem base joins orders once, then LeftSemi (another supplier exists) and LeftAnti (no OTHER late supplier) self-joins on orderkey; semi/anti project the left side only, so no lineitem payload rides the self-joins."),
    ("tpch_q17", "Decorrelated scalar subquery — the per-part 0.2*avg cap aggregates lineitem on partkey and joins back on the same key; at scale both sides shuffle on partkey and AQE reuses the exchange; the brand/size filter prunes part before the join."),
    ("table_wap", "Write-audit-publish main view — the staged append's files are dropped at PLANNING time (seq-scoped visibility), so the scan reads exactly the published file set; no runtime filter, no extra plan node."),
    ("table_cdc_mor", "Equality-delete merge-on-read scan — pre-batch files anti-join (LeftAnti) the batch's key file while the batch's own files scan clean (seq-scoped groups union), so un-compacted CDC reads cost one broadcast-size anti-join, never a rewrite."),
    ("table_partition_evolution", "Partition query across evolved specs — the file list comes pre-pruned: post-evolution files by recorded partition value, pre-evolution files by source min/max stats; residual equality filter pushes to the surviving files."),
    ("corpus_quality", "Repetition signals — ONE generator explode covers unigram AND bigram populations, then two HashAggregate pairs (partial map-side first), so the single wide shuffle moves near-distinct (doc, gram) pairs; zero Python, zero windows."),
    ("corpus_shuffle", "Deterministic global shuffle — md5 projection is map-side; the ONLY exchange is hashpartitioning(shard): each shard ranks independently, no global sort at any scale."),
    ("corpus_decontaminate_exact", "Exact n-gram collision decontamination — the eval corpus's distinct gram set BROADCASTS (benchmark-sized at any corpus scale); the train side explodes map-side and the only exchange is the per-doc count-distinct aggregation."),
    ("dedup_minhash_portable", "Fully-oracle-checked MinHash-LSH — all 16 md5 min-hash signatures are map-side Column expressions in one projection (no Python, no shuffle); the band self-join moves only (band_idx, band_hash, id) triples; shingle arrays re-join by id for the exact verify."),
    ("dedup_embedding_lsh_portable", "Fully-oracle-checked hyperplane-LSH — BIGINT quantize + 8 Rademacher integer dot products in ONE map-side projection (sign bits exact, no FP); bucket equi-join with 1-bit multiprobe explode; vectors re-join by id for the exact-cosine verify on candidates only."),
    ("sim_search_lsh_portable", "Fully-oracle-checked ANN — single corpus pass computing the portable bucket in codegen, bit_count filter against the query's (Python-computed, identical integer math) bucket, exact-cosine rerank via TakeOrderedAndProject: no global sort, no Python, no second scan."),
    ("agg_approx_distinct_portable", "Cross-engine-verifiable approx distinct — KMV sketch: md5 hashing and the (group, hash) distinct stay map-side before the one shuffle; per-group K-smallest via window; the estimate is one IEEE-deterministic double division. HLL twin remains the mergeable constant-memory production path."),
    ("dedup_incremental", "Batch-vs-corpus admission dedup — the exact tier is one equi-join on the normalized fingerprint (corpus side pre-aggregated fp→min id); the near tier joins BATCH band triples against CORPUS band triples only (asymmetric — never corpus×corpus), so candidates scale with the batch; verify re-joins shingles by id at cluster width; verdict assembly is two left joins. No cartesian, no Python, id+text-only ReadSchema (all plan-gated)."),
    ("tpch_q2", "Correlated regional-MIN decorrelated — the EUROPE part-supplier frame is built once (derived partsupp aggregates lineitem on (partkey, suppkey)); the per-part MIN joins back as an equi-join on (partkey, cost); nation/region broadcast; no cartesian (plan-gated)."),
    ("tpch_q9", "5-way profit rollup — one fact-fact shuffle (lineitem⋈orders on orderkey); part/supplier/nation broadcast at dimension scale; the (nation, year) group key is tiny so the final aggregate is all partial-combine."),
    ("table_changelog", "Net row-level changelog — both sides read ONLY changed files (added/removed; 100k-ceiling test pins it), each under its own snapshot's predicates; the multiset diff is a SKINNY per-row-hash count-diff (the diff exchanges carry 32-byte hashes + counts, plan-gated) with a bounded payload fetch that AQE broadcasts; compaction windows net to a zero-row plan."),
    ("bloom_point_scan", "Bloom-pruned point lookup — equality on a column the layout does NOT cluster: the file list comes pre-pruned by per-file bloom membership (absence proofs; ≤2-of-N files-read gate in tests), the residual equality pushes to the surviving file's row groups."),
    ("table_merge", "Multi-clause MERGE read-back — the merge itself ran as ONE partition-scoped CoW commit (matched join + clause CASE + insert union through _merge_cow); the resulting scan is a plain pruned file read, no runtime merge work."),
    ("table_rollup", "Incrementally-maintained rollup read — the query is a plain scan of the last committed rollup version (parquet dir); ALL fold work happened at refresh time against changelog deltas, so read cost is O(groups), never O(table)."),
    ("dedup_spans", "Duplicated-span islands — gram md5s are ONE map-side projection (no Python); the dup-gram aggregate and marking semi-join exchange (hash, id, pos) triples only — text never shuffles (plan-gated); span merge is a per-doc window sharing the doc_id partitioning."),
    ("events_sessionize", "Gap sessionization — ONE hash exchange on user_id feeds lag, running-sum flag, and the session rollup (all three share the partitioning); integer-µs comparisons, no Python, no global sort."),
    ("events_gapfill", "LOCF densification — the grid explodes from the per-key min/max AGGREGATE (bounded by keys x buckets, never raw events); the left join and fill window share the key partitioning; AQE broadcasts the observed side when small."),
    ("bloom_point_scan_multi", "Multi-conjunct bloom lookup — doc_id IN (..) AND lang = '..': the file list comes pre-pruned by INTERSECTED per-column bloom verdicts (all probe hashes from one 1-row JVM job, store rows candidate-semi-joined before the collect); the surviving files' scan carries both residual predicates pushed."),
    ("events_downsample", "OHLC downsampling — ONE aggregation on (key, bucket): partial (map-side) + final across a single exchange (SortAggregate, because the min_by/max_by endpoint buffers are non-primitive structs — the partial combine is what matters at scale); the bucket is integer-µs floor arithmetic in codegen; no window ever touches raw rows."),
    ("corpus_despan", "Span clipping — the wide exchanges carry 16-byte gram digests + int positions (never text, plan-gated); non-owner windows merge to (lo,hi) spans per doc and the clip filter is exists(spans, ..) over the token array; the only full-text exchange is the final removal-array join, AQE-broadcastable."),
]

PICKS += [
    # the five r8-staged queries, registered in the r9 window
    ("range_join_window",
     "Bucketized range join — intervals explode across their overlapped buckets MAP-SIDE, the join is an EQUI join on the bucket (SMJ/BHJ, never BroadcastNestedLoopJoin — plan-gated) with the exact BETWEEN as residual; at scale each interval replicates ~len/W+1 times and no executor sees a cross product."),
    ("corpus_bm25",
     "BM25 keyword search — term frequencies are literal per-term COLUMNS (the only Generate is the struct melt, never tokens); one scalar aggregate yields N + avgdl + every per-term df in a single broadcast row; each query scores as a FIXED-order expression chain (no engine-ordered double fold); no-hit docs drop map-side before the melt, a per-partition Arrow pre-top-k (MapInPandas under the Window, r9) caps the rank window's shuffle at ~k rows per (query, partition)."),
    ("corpus_lm_score",
     "Unigram LM scoring — training is ONE vocabulary-sized hash aggregate; scoring joins the BROADCAST model against the exploded tokens and folds per doc in exact decimal; only the final per-token division is double."),
    ("events_funnel",
     "Strict-order funnel — ONE events scan (step-type filter pushed) + ONE per-user hash aggregate collecting per-step sorted timestamp arrays; the conversion chain is array expressions over that single aggregate and the counts melt from a 1-row aggregate (plan-gated: 1 scan, 0 joins, 1 hash exchange — was N scans + N joins before r9)."),
    ("events_retention",
     "Weekly cohort retention — exact integer-µs week floors map-side, one distinct + one per-user MIN + one grouped count-distinct, all sharing the user_id exchange; week indices derive from small differences only (raw epoch-µs exceeds 2^53)."),
]

# Registered in r10 — notes reflect the r10 segment-pigeonhole
# blocking (PassJoin), which replaced the q-gram prefix filter.
REGISTERED_R10_PICKS = [
    ("corpus_fuzzy_prefix",
     "Fuzzy edit-distance self-match — segment pieces (d+1 per string) and the bounded probe substrings are map-side array expressions exploded once; candidates come from an EQUI join on (partner length, segment index, piece) whose keys are long near-unique substrings (+ the bucketized length-band equi-join for the sub-q·(d+1) short class); thresholded levenshtein verifies candidates only. No CartesianProduct, no BroadcastNestedLoopJoin (plan-gated)."),
    ("corpus_bm25_exploded",
     "Document-scale BM25 — one token explode semi-joined to the BROADCAST query vocabulary (non-query tokens never shuffle), one (doc, term) hash aggregate, broadcast df/stats joins, exact-decimal per-(query, doc) folds, shared Arrow pre-top-k under the rank window."),
    ("corpus_fuzzy_clusters",
     "Fuzzy pairs → connected components — the blocked pair generation feeds the alternating-star CC (driver union-find at this edge count, star rounds above the tier switch); verdict assembly is one window over canon_id."),
    ("corpus_mix_temperature",
     "Temperature-2 mixture plan — ONE corpus hash aggregate to the per-source rollup; the rate closed form (min_j(mass/w) · w_i/mass_i) runs on the few-row rollup with an order-free MIN window, no double ever folds."),
    ("corpus_fuzzy_decontaminate",
     "Fuzzy eval-set decontamination — asymmetric fuzzy_join: the benchmark-sized eval side goes LEFT (probe substrings from the small corpus), the train side ships only d+1 segment rows per doc + its short class; verify bounded to candidates; one per-train-doc aggregate."),
]
PICKS = PICKS + REGISTERED_R10_PICKS

# Staged queries (oracle-verified, not yet registered — see TODO.md):
# resolved from their home modules so their plans stay auditable too.
STAGED_PICKS = [
    ("corpus_fuzzy_admission", "iceberg_core_spark.functions.fuzzy_index",
     "Incremental fuzzy admission — the batch probes equi-join the PERSISTED corpus segment index (d+1 skinny rows per corpus doc; scans, never a corpus text pass), guaranteed batch segments equi-join the persisted short-class probes, short×short rides the length band; verify bounded to candidates, best-match rollup is one window over the batch ids."),
]


def main() -> None:
    from iceberg_core_spark import get_spark
    from iceberg_core_spark.registry import all_queries

    spark = get_spark("plans", extra_conf={"spark.sql.shuffle.partitions": "8"})
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"
    qs = all_queries()

    out = [
        "# PLANS — physical plans of flagship operators (generated at sf0.001)",
        "",
        "Regenerate: `python scripts/gen_plans.py`. What to look for is",
        "noted per plan; these properties are asserted in tests/test_plans.py.",
        "",
    ]
    import importlib

    staged = []
    for name, mod, note in STAGED_PICKS:
        m = importlib.import_module(mod)
        pool = {**getattr(m, "QUERIES", {}),
                **getattr(m, "STAGED_QUERIES", {})}
        staged.append((f"{name} (staged)", note, pool[name][0]))
    for name, note, fn in [(n, note, qs[n][0]) for n, note in PICKS] + staged:
        df = fn(spark, sf)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.append(f"## {name}\n\n{note}\n\n```\n{plan.strip()[:4000]}\n```\n")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md regenerated")


if __name__ == "__main__":
    main()
