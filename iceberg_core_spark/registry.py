"""Aggregated query registry: every declared operator with its oracle.

Sections (SURVEY.md §2.B build list):
- relational core  → operators/relational.py
- LLM-data ops     → functions/llm_queries.py (dedup, similarity, text)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
Entry = tuple[QueryFn, str | None]


def all_queries() -> dict[str, Entry]:
    from iceberg_core_spark.operators.relational import QUERIES as REL

    from iceberg_core_spark.functions.assembly import QUERIES as ASSEMBLY
    from iceberg_core_spark.functions.decontam import QUERIES as DECONTAM
    from iceberg_core_spark.functions.dedup_incremental import (
        QUERIES as INCREMENTAL,
    )
    from iceberg_core_spark.functions.dedup_portable import QUERIES as PORTABLE
    from iceberg_core_spark.functions.packing import QUERIES as PACKING
    from iceberg_core_spark.functions.quality import QUERIES as QUALITY
    from iceberg_core_spark.functions.vocab import QUERIES as VOCAB
    from iceberg_core_spark.functions.llm_queries import QUERIES as LLM
    from iceberg_core_spark.operators.relational_ext import QUERIES as RELX
    from iceberg_core_spark.operators.udfs import QUERIES as UDF
    from iceberg_core_spark.functions.sampling import QUERIES as SAMPLING
    from iceberg_core_spark.operators.bucketed import QUERIES as BUCKETED
    from iceberg_core_spark.operators.table_queries import QUERIES as TABLE
    from iceberg_core_spark.operators.tpch import QUERIES as TPCH
    from iceberg_core_spark.streaming.queries import QUERIES as STREAM

    from iceberg_core_spark.functions.dedup_spans import QUERIES as SPANS
    from iceberg_core_spark.functions.fuzzy import QUERIES as FUZZY
    from iceberg_core_spark.functions.fuzzy_index import (
        QUERIES as FUZZYIDX,
    )
    from iceberg_core_spark.functions.lm_quality import QUERIES as LMQ
    from iceberg_core_spark.functions.search import QUERIES as SEARCH
    from iceberg_core_spark.operators.events_analytics import (
        QUERIES as EVENTS,
    )
    from iceberg_core_spark.operators.rangejoin import QUERIES as RANGEJOIN
    from iceberg_core_spark.operators.timeseries import QUERIES as TS
    from iceberg_core_spark.sources.avro_ocf import QUERIES as AVRO
    from iceberg_core_spark.sources.orc_format import QUERIES as ORC
    from iceberg_core_spark.sources.text_formats import QUERIES as TEXTFMT
    from iceberg_core_spark.streaming.stateful import QUERIES as STATEFUL

    out: dict[str, Entry] = {}
    out.update(LLM)      # north-star: dedup / similarity / text / multimodal
    out.update(DECONTAM) # eval-set decontamination (cross-corpus near-dup)
    out.update(PORTABLE) # fully-oracle-checked MinHash-LSH (md5 hashes)
    out.update(INCREMENTAL)  # batch-vs-corpus admission dedup (NEW r6)
    out.update(PACKING)  # token-budget sequence packing
    out.update(QUALITY)  # repetition quality signals + PII redaction
    out.update(VOCAB)    # corpus vocabulary / top-k token frequencies
    out.update(ASSEMBLY) # source-mixture plan + deterministic shuffle
    out.update(SAMPLING) # hash-bucket split + stratified sampling
    out.update(STREAM)   # event-time windows, stream join, stream ingest
    out.update(STATEFUL) # applyInPandasWithState running stats (NEW r3)
    out.update(AVRO)     # OCF ingest roundtrip (NEW r3)
    out.update(TEXTFMT)  # JSONL corpus source roundtrip (NEW r5)
    out.update(ORC)      # native ORC columnar roundtrip (NEW r7)
    out.update(SPANS)    # cross-doc duplicated-span dedup (NEW r7)
    out.update(SEARCH)   # BM25 lexical search (staged r8, registered r9)
    out.update(FUZZY)    # edit-distance matching (staged r9, reg. r10)
    out.update(FUZZYIDX) # persisted fuzzy admission (staged r10, reg. r11)
    out.update(LMQ)      # unigram LM quality scoring (staged r8, reg. r9)
    out.update(RANGEJOIN)  # bucketized interval join (staged r8, reg. r9)
    out.update(EVENTS)   # funnel + cohort retention (staged r8, reg. r9)
    out.update(TS)       # batch sessionize + LOCF gapfill (NEW r7)
    out.update(UDF)      # pandas UDF / UDAF / UDTF
    out.update(BUCKETED) # co-located (exchange-free) fact-fact join
    out.update(TABLE)    # table-layer lifecycle (incremental change feed)
    out.update(REL)      # relational core
    out.update(RELX)     # bonus relational variants
    out.update(TPCH)     # headline multi-join analytics

    # ORDER MATTERS: the driver's correctness artifact covers the first
    # 50 registry entries in dict order, per the rotation discipline
    # (r8 judge ruling, VERDICT.md r8 item 1): no green row may age
    # past 2 rounds UNLESS its defining module is byte-unchanged since
    # its last green row, in which case it may ride to age 3 (period-4
    # rotation, capacity 200); any changed module re-windows
    # immediately. Past windows' rationale lives in git history (r3-r8
    # comments) and in the CORRECTNESS_r*.json artifacts;
    # `scripts/verify_window.py --ages` audits the discipline —
    # including the byte-unchanged condition, via git — mechanically.
    # ROUND-14 WINDOW (the r6-r13 window lists are preserved in git
    # history; run `verify_window.py --ages` after any reorder).
    # NOTE r14 upgraded the audit: the age-3 deferral tier now diffs
    # the query fn's REACHABLE HELPER CLOSURE (function-granular first
    # hop, whole-module transitive beyond), not just its defining
    # module — scripts/verify_window.py._helpers_unchanged_since. The
    # forced sets below come from the live `--ages 14` run under that
    # stricter rule.
    priority = [
        # ROUND-15 WINDOW (the r6-r14 window lists live in git
        # history). 34 rows the live `--ages 15 --assume-green-window`
        # audit FORCES at r14 close, re-confirmed this round:
        # (a) the 19 unwindowed r11 TPC-H rows, unconditionally age-4,
        "tpch_q1", "tpch_q2", "tpch_q4", "tpch_q6", "tpch_q7",
        "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q11", "tpch_q13",
        "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18",
        "tpch_q19", "tpch_q20", "tpch_q21", "tpch_q22",
        # (b) the 7 r11 corpus/spans rows, also age-4 (their helper
        # modules — packing/quality/assembly/dedup_spans — changed
        # r13/r14 so they could not ride the unchanged tier),
        "corpus_pack", "corpus_pii", "corpus_shuffle",
        "dedup_spans", "corpus_despan",
        "dedup_spans_min16", "corpus_despan_min16",
        # (c) the 8 r12 rows whose helpers changed since their row:
        # relational.py (changed r14) for the window/topk/hof rows,
        # streaming/udfs helpers (changed r13) for the rest,
        "win_frame", "win_range_frame", "topk_per_group", "array_hof",
        "win_tumbling", "stream_dedup", "udf_scalar",
        "udaf_group_stats",
        # (d) 16 flex slots. 13 drawn from the 36 r13 rows whose
        # helper closure (caching.py/dedup.py/ice_table.py) changed
        # r14 — they hit age-3-with-changed-helpers at r16, so
        # windowing them now drains the r16 forced set:
        # 7 of the 10 pre-committed table-layer picks (r14 plan) —
        # the r15 OPTIMIZATION round's tpch.py rewrite (q18/q21)
        # displaced table_incremental/table_partition_evolution/
        # table_time_travel (all re-forced at r16 by their
        # r14-changed ice_table.py helper regardless, so the r16
        # forced count is unchanged at 48) in favor of the three r12
        # TPC-H rows the changed module now forces immediately:
        "tpch_q3", "tpch_q5", "tpch_q12",
        "table_cdc_mor", "table_changelog",
        "table_merge", "table_rollup",
        "zorder_range_scan", "bloom_point_scan",
        "stream_ingest",
        # and 3 rows-only/portable-twin PAIRS (both members of each
        # pair sit in that same forced-at-r16 set, and pairing them
        # in-window satisfies the r14-verdict twin invariant that
        # verify_window.py now enforces mechanically):
        "dedup_embedding_lsh", "dedup_embedding_lsh_portable",
        "sim_search_lsh", "sim_search_lsh_portable",
        "dedup_clusters_minhash", "dedup_clusters_portable",
        # R16 PLAN (live `--ages 16 --assume-green-window` at r15
        # close; see TODO.md r15 log for the run): 47 forced — the 27
        # r12 rows riding the unchanged tier to hard age-4 (vocab_topk,
        # write_shards, scan_avro/jsonl/orc, corpus_lm_score,
        # range_join_window, events_*, explode_tokens, map_funcs, the
        # 12 relational_ext agg/scalar rows, win_rank_ext, tpch_q3/q5/
        # q12) + the 20 r13 changed-helper rows NOT absorbed above
        # (agg_approx_distinct+portable twin, dedup_exact,
        # dedup_near_jaccard, dedup_minhash_lsh+twin already green r14,
        # dedup_simhash+twin, dedup_embedding, dedup_clusters,
        # multimodal_meta/features/chunks, win_sliding, win_session,
        # stream_join, sim_search_ivf_portable, admission_index,
        # bloom — see the audit output) — leaving 3 flex.
    ]
    ordered: dict[str, Entry] = {k: out[k] for k in priority if k in out}
    ordered.update({k: v for k, v in out.items() if k not in ordered})
    return ordered
