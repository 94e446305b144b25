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
    # ROUND-13 WINDOW (the r6-r12 window lists are preserved in git
    # history; run `verify_window.py --ages` after any reorder):
    priority = [
        # (a) the 17 rows the --ages audit FORCES into r13 (the live
        # `--ages 13` run at round open listed exactly these): the 11
        # age-4 r9 rows (6 portable twins, scan_csv, the three events
        # analytics rows, agg_pivot) that hard-stop now ...
        "dedup_simhash_portable", "dedup_clusters_portable",
        "dedup_embedding_lsh_portable", "sim_search_lsh_portable",
        "agg_approx_distinct_portable", "sim_search_ivf_portable",
        "scan_csv", "events_funnel", "events_retention",
        "events_downsample", "agg_pivot",
        # ... and the 6 changed-module r10 rows (dedup_incremental.py
        # changed r11; stateful.py, search.py, fuzzy.py changed r12).
        "admission_index", "stateful_stats", "corpus_bm25_exploded",
        "corpus_fuzzy_prefix", "corpus_fuzzy_clusters",
        "corpus_fuzzy_decontaminate",
        # (b) 33 flex slots, per the r12 close-out plan: the
        # CONSERVATIVE EXTRAS whose helpers changed in r11/r12 (not
        # caught by the mechanical per-module diff) — the r10
        # streaming rows (ingest.py changed r11, stateful.py r12),
        "stream_ingest", "stream_join", "win_sliding", "win_session",
        # the r10 table-layer rows (manifest.py / ice_table.py
        # changed r12, and the r13 DML-family review touches
        # ice_table.py again this round),
        "table_cdc_mor", "table_changelog", "table_incremental",
        "table_merge", "table_partition_evolution", "table_rollup",
        "table_time_travel", "zorder_range_scan", "bloom_point_scan",
        # the r11 dedup family incl. its r10 rows-only members
        # (dedup.py changed r12: md5 agg key + persisted LSH
        # signature frames; r13 adds owner-side unpersist),
        "dedup_exact", "dedup_near_jaccard", "dedup_minhash_lsh",
        "dedup_embedding", "dedup_clusters", "dedup_simhash",
        "dedup_embedding_lsh", "dedup_clusters_minhash",
        # the r11 changed-module rows that would otherwise be FORCED
        # at r14 (fuzzy.py changed r12 — corpus_fuzzy_admission also
        # doubles as the r12 perf watch item's re-anchor row;
        # multimodal/binary_columns.py changed r12: RIFF pad fix),
        "corpus_fuzzy_admission", "multimodal_meta",
        "multimodal_features", "multimodal_chunks",
        # and the 8 non-relational r10 strays, so the ENTIRE r14
        # forced set collapses to the 20 relational.py r10 rows —
        # one byte-unchanged module, exactly at the <=20 budget
        # (simulated via --ages 14 --assume-green-window at reorder).
        "corpus_clean", "text_ngrams", "corpus_mix_temperature",
        "split_train_test", "sample_stratified", "udtf_tokenize",
        "sim_search_lsh", "agg_approx_distinct",
        # R14 PLAN: 22 forced rows lead — the 20 relational.py r10
        # rows (one byte-unchanged module) plus text_analysis and
        # sim_search_ivf, whose module (llm_queries.py) changed in
        # r13 for the corpus_clean md5 window-key fix. That fix
        # raises the simulated forced set from the planned 20 to 22
        # deliberately: the byte-diff rule re-verifying two sibling
        # rows of a changed module is the discipline working, and
        # every swap is zero-sum (each current flex row would itself
        # become r14-forced if dropped — the debt is conserved).
        # 22 forced + 28 flex is comfortably feasible. CONSERVATIVE
        # EXTRAS for the ~30 flex slots: the r12 table-layer rows
        # (schema_evolution/table_cdc/table_clone/table_compact/
        # table_delete_mor/table_upsert/table_wap/table_merge_mor/
        # bloom_point_scan_multi — ice_table.py changed r13: DML
        # review fixes + remove_orphans matcher), the r12 search/
        # dedup-adjacent rows (corpus_bm25, sim_search,
        # sim_search_batch — search.py dropna fix r13; dedup.py
        # persist_site rewiring r13 is covered by the r13 window
        # itself), join_asof (its helper operators/asof.py changed
        # r13: struct-carry fix — relational.py itself is
        # byte-unchanged so the mechanical diff won't force it), and
        # multimodal_features' r13 row stays fresh
        # (binary_columns.py encoder hook r13 — windowed this round).
        # The rest fills oldest-first from the r11 block.
    ]
    ordered: dict[str, Entry] = {k: out[k] for k in priority if k in out}
    ordered.update({k: v for k, v in out.items() if k not in ordered})
    return ordered
