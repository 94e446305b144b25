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
    # ROUND-11 WINDOW (the r6-r10 window lists are preserved in git
    # history; run `verify_window.py --ages` after any reorder):
    priority = [
        # (a) the r11 registration — staged in r10, oracle-green at
        # sf0.001+sf0.01+sf0.1 vs an INDEPENDENT brute-force oracle;
        # a green driver row re-proves the PERSISTED index's
        # incremental blocking complete on real data
        "corpus_fuzzy_admission",
        # (b) the 12 rows the --ages audit FORCES into r11: the 2
        # changed-module r8 rows (assembly.py changed in r9) ...
        "corpus_mix", "corpus_shuffle",
        # ... and the 10 age-4 r7 rows that rode the byte-unchanged
        # tier through r9+r10 and hard-stop now
        "join_broadcast", "join_sortmerge", "join_full",
        "tpch_q2", "tpch_q9", "tpch_q10", "tpch_q11",
        "tpch_q15", "tpch_q16", "tpch_q20",
        # (c) 37 of the 48 byte-unchanged age-3 r8 rows (r10 VERDICT
        # task 2: defuse the r12 rotation cliff). The 11 left riding
        # to age 4 — stream_dedup, scan_jsonl, scan_orc,
        # events_sessionize, events_gapfill, events_interpolate,
        # udf_scalar, udaf_group_stats, table_merge_mor,
        # bloom_point_scan_multi, vocab_topk — are FORCED into r12.
        # R12 MANDATORY LEADS (simulated via --ages 12
        # --assume-green-window at r11 close): those 11 age-4 rows +
        # 3 changed-module r9 rows (dedup_incremental, corpus_bm25 —
        # dedup_incremental.py/search.py changed in r10 — and
        # write_shards — assembly.py changed in r9) = 14 forced,
        # ~36 flex slots for r9 refreshes (50 r9 rows exist; the
        # remainder hard-stop at r13). CONSERVATIVE EXTRAS for the
        # r12 flex (helper changed in r11, not caught by the
        # mechanical per-module diff): win_tumbling (r9 row;
        # queries.py is byte-unchanged but its tumbling_counts
        # helper in streaming/ingest.py changed) and stream_dedup
        # (already forced) lead the helper-touched set; the r10-green
        # streaming rows (stream_ingest/stream_join/win_sliding/
        # win_session/stateful_stats) re-window by r13 for the same
        # reason.
        "tpch_q1", "tpch_q4", "tpch_q6", "tpch_q7", "tpch_q8",
        "tpch_q13", "tpch_q14", "tpch_q17", "tpch_q18", "tpch_q19",
        "tpch_q21", "tpch_q22",
        "dedup_exact", "dedup_near_jaccard", "dedup_minhash_lsh",
        "dedup_embedding", "dedup_clusters", "dedup_minhash_portable",
        "dedup_spans", "corpus_despan", "dedup_spans_min16",
        "corpus_despan_min16", "sim_search_ivf",
        "multimodal_meta", "multimodal_features", "multimodal_chunks",
        "corpus_decontaminate", "corpus_decontaminate_exact",
        "corpus_pack", "corpus_quality", "corpus_pii", "text_analysis",
        "join_bucketed", "agg_hash", "join_semi", "join_anti",
        "join_asof",
    ]
    ordered: dict[str, Entry] = {k: out[k] for k in priority if k in out}
    ordered.update({k: v for k, v in out.items() if k not in ordered})
    return ordered
