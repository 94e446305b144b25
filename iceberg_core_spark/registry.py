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
    out.update(TS)       # batch sessionize + LOCF gapfill (NEW r7)
    out.update(UDF)      # pandas UDF / UDAF / UDTF
    out.update(BUCKETED) # co-located (exchange-free) fact-fact join
    out.update(TABLE)    # table-layer lifecycle (incremental change feed)
    out.update(REL)      # relational core
    out.update(RELX)     # bonus relational variants
    out.update(TPCH)     # headline multi-join analytics

    # ORDER MATTERS: the driver's correctness artifact covers the first
    # 50 registry entries in dict order, per the rotation discipline:
    # every query whose module — or dependency — changed since its
    # last driver row gets back in, and no green row may age past 2
    # rounds. Past windows' rationale lives in git history (r3-r6
    # comments) and in the CORRECTNESS_r*.json artifacts;
    # `scripts/verify_window.py --ages` audits the discipline
    # mechanically against those artifacts.
    # ROUND-7 WINDOW (the r6 window list is preserved in git history;
    # `scripts/verify_window.py --ages` now checks this discipline
    # MECHANICALLY against the CORRECTNESS_r*.json artifacts):
    priority = [
        # (a) the 8 late-r6 registrations with no driver row yet (all
        # judge-verified at sf0.01 in the r6 session): the six
        # partsupp-derived TPC-H classics + the changelog/IVM pair
        "tpch_q2", "tpch_q9", "tpch_q11", "tpch_q15", "tpch_q16",
        "tpch_q20", "table_changelog", "table_rollup",
        # (b) NEW r7 registrations: the persisted-AdmissionIndex
        # production path (same oracle as dedup_incremental — shared
        # _judge), bloom-sidecar point-scan pruning, and multi-clause
        # MERGE
        "admission_index", "bloom_point_scan", "table_merge",
        # (c) ALL 33 r4-age rows (would hit age 3 in r7) — modules
        # byte-identical since their rows; pure staleness refreshes
        "scan_parquet", "project", "filter_pred", "filter_range",
        "scalar_string", "scalar_date", "scalar_math", "scalar_array",
        "scalar_json",
        "agg_distinct", "agg_rollup", "agg_cube", "agg_grouping_sets",
        "agg_approx_distinct",
        "join_broadcast", "join_sortmerge", "join_left", "join_right",
        "join_full",
        "win_session", "win_sliding", "stream_join", "stateful_stats",
        "udtf_tokenize", "text_ngrams", "corpus_clean",
        "split_train_test", "sample_stratified", "tpch_q10",
        "dedup_simhash", "dedup_embedding_lsh",
        "dedup_clusters_minhash", "sim_search_lsh",
        # (d) r5-row refreshes for the modules this round's diff
        # touches: ice_table.py (skinny scan_changes diff + MERGE +
        # bloom-gated _pruned_files) → one representative per scan
        # family (incremental feed, time travel, MoR CDC, partition
        # evolution, pruned range scan); streaming/ingest.py (persist
        # fix) → stream_ingest. The r6 table rows (compact/upsert/
        # delete_mor/wap/cdc/schema_evolution) stand at age 1: the
        # scan_changes rewrite is confined to the changelog path (its
        # two queries lead this window) and bloom pruning is inert
        # without a bloom sidecar. Remaining r5 rows are age 2 —
        # rotation due r8.
        "table_incremental", "table_time_travel", "table_cdc_mor",
        "table_partition_evolution", "zorder_range_scan",
        "stream_ingest",
        # LATE-r7 registrations (after the 50-slot cut, like
        # table_merge_mor): scan_orc, dedup_spans, events_sessionize,
        # events_gapfill — all four MUST lead the r8 window alongside
        # table_merge_mor and the age-2 r5 rows
        # (`scripts/verify_window.py --ages` tracks them as pending
        # leads from their first-seen round).
    ]
    ordered: dict[str, Entry] = {k: out[k] for k in priority if k in out}
    ordered.update({k: v for k, v in out.items() if k not in ordered})
    return ordered
