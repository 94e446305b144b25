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
    # ROUND-8 WINDOW (the r6/r7 window lists are preserved in git
    # history; `scripts/verify_window.py --ages` checks this
    # discipline MECHANICALLY against the CORRECTNESS_r*.json
    # artifacts — run after any reorder):
    priority = [
        # (a) the 7 late-r7 registrations with no driver row yet (all
        # judge-verified at sf0.01 in the r7 session): ORC source,
        # the Lee-et-al span-dedup pair, the batch time-series trio,
        # and O(batch) merge-on-read MERGE
        "scan_orc", "dedup_spans", "corpus_despan",
        "events_sessionize", "events_gapfill", "events_interpolate",
        "table_merge_mor",
        # (a') NEW r8 registrations (see their modules): span dedup at
        # the Lee et al. production threshold, and IN-list/AND bloom
        # point scans
        "dedup_spans_min16", "corpus_despan_min16",
        "bloom_point_scan_multi",
        # (b) ALL 37 age-2 r5 rows (would hit age 3 in r8) — the r5
        # TPC-H block, the corpus/dedup/multimodal families, UDFs,
        # the bucketed join, and the remaining scan/stream rows
        "agg_hash", "text_analysis", "scan_jsonl", "stream_dedup",
        "dedup_exact", "dedup_near_jaccard", "dedup_minhash_lsh",
        "dedup_embedding", "dedup_clusters", "dedup_minhash_portable",
        "sim_search_ivf",
        "multimodal_meta", "multimodal_features", "multimodal_chunks",
        "corpus_decontaminate", "corpus_decontaminate_exact",
        "corpus_pack", "corpus_quality", "corpus_pii", "vocab_topk",
        "corpus_mix", "corpus_shuffle",
        "udf_scalar", "udaf_group_stats", "join_bucketed",
        "tpch_q1", "tpch_q4", "tpch_q6", "tpch_q7", "tpch_q8",
        "tpch_q13", "tpch_q14", "tpch_q17", "tpch_q18", "tpch_q19",
        "tpch_q21", "tpch_q22",
        # (c) spare slots: early refreshes of r6-age rows so the
        # remaining r6 rows (all due in r9) keep a little slack
        "join_semi", "join_anti", "join_asof",
    ]
    ordered: dict[str, Entry] = {k: out[k] for k in priority if k in out}
    ordered.update({k: v for k, v in out.items() if k not in ordered})
    return ordered
