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
    # ROUND-12 WINDOW (the r6-r11 window lists are preserved in git
    # history; run `verify_window.py --ages` after any reorder):
    priority = [
        # (a) the 14 rows the --ages audit FORCES into r12 (the live
        # `--ages 12` run at round open listed exactly these): the 11
        # age-4 r8 rows that rode the byte-unchanged tier through
        # r10+r11 and hard-stop now ...
        "vocab_topk", "stream_dedup", "scan_jsonl", "scan_orc",
        "events_sessionize", "events_gapfill", "events_interpolate",
        "udf_scalar", "udaf_group_stats", "table_merge_mor",
        "bloom_point_scan_multi",
        # ... and the 3 changed-module r9 rows (dedup_incremental.py /
        # search.py changed in r10; assembly.py changed in r9).
        # dedup_incremental doubles as the r11 perf watch item's
        # re-anchor row (VERDICT r11 task 6).
        # ... plus scan_avro, whose r12 decoder hardening (varint cap,
        # truncated-boolean EOFError) re-windows its r9 row immediately
        # under the changed-module rule (its planned deferral assumed
        # byte-unchanged); agg_pivot (byte-unchanged relational_ext)
        # yields its slot and joins the r13 forced set.
        "dedup_incremental", "corpus_bm25", "write_shards", "scan_avro",
        # (b) 36 flex slots = the r9 block (47 rows due r13 hard)
        # minus 11 deferrals whose defining modules are byte-unchanged
        # AND whose helpers r12 does not touch (the 6 portable twins,
        # scan_avro/scan_csv, events_downsample/funnel/retention) —
        # those 11 MUST lead the r13 window (age 4 hard stop).
        # Flex priority favors the rows r12's planned manifest/
        # ice_table fixes could plausibly affect: the r9 table
        # lifecycle family re-verifies the changed code directly, and
        # win_tumbling covers the r11 helper change in
        # streaming/ingest.py (queries.py itself byte-unchanged).
        "schema_evolution", "table_cdc", "table_clone",
        "table_compact", "table_delete_mor", "table_upsert",
        "table_wap",
        "win_tumbling",
        "agg_conditional", "agg_median", "agg_minmax_by",
        "agg_percentile", "agg_salted", "agg_stats",
        "agg_string_agg", "array_hof", "corpus_lm_score",
        "explode_tokens", "map_funcs", "range_join_window",
        "scalar_cond", "scalar_string2", "scalar_subquery",
        "scalar_subquery_corr", "sim_search", "sim_search_batch",
        "topk_per_group", "tpch_q3", "tpch_q5", "tpch_q12",
        "win_analytic", "win_frame", "win_range_frame", "win_rank",
        "win_rank_ext",
        # R13 MANDATORY LEADS (simulated via --ages 13
        # --assume-green-window at r12 close): the 11 deferred r9
        # rows above + admission_index (dedup_incremental.py changed
        # r11). CONSERVATIVE EXTRAS for the r13 flex (helpers
        # changed, not caught by the mechanical per-module diff): the
        # r10 streaming rows (stream_ingest/stream_join/win_sliding/
        # win_session/stateful_stats — ingest.py changed r11 and
        # stateful.py changed r12), the r10 table-layer rows
        # (table_cdc_mor/table_changelog/table_incremental/
        # table_merge/table_partition_evolution/table_rollup/
        # table_time_travel/zorder_range_scan/bloom_point_scan —
        # manifest.py/ice_table.py changed r12), and the r11 dedup
        # family (dedup_exact/dedup_near_jaccard/dedup_minhash_lsh/
        # dedup_embedding/dedup_clusters + twins — dedup.py changed
        # r12: md5 agg key + persisted LSH signature frames); the
        # rest of the r10 block fills remaining slots oldest-first.
    ]
    ordered: dict[str, Entry] = {k: out[k] for k in priority if k in out}
    ordered.update({k: v for k, v in out.items() if k not in ordered})
    return ordered
