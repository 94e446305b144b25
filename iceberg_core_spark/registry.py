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

    from iceberg_core_spark.sources.avro_ocf import QUERIES as AVRO
    from iceberg_core_spark.sources.text_formats import QUERIES as TEXTFMT
    from iceberg_core_spark.streaming.stateful import QUERIES as STATEFUL

    out: dict[str, Entry] = {}
    out.update(LLM)      # north-star: dedup / similarity / text / multimodal
    out.update(DECONTAM) # eval-set decontamination (cross-corpus near-dup)
    out.update(PORTABLE) # fully-oracle-checked MinHash-LSH (md5 hashes)
    out.update(PACKING)  # token-budget sequence packing
    out.update(QUALITY)  # repetition quality signals + PII redaction
    out.update(VOCAB)    # corpus vocabulary / top-k token frequencies
    out.update(ASSEMBLY) # source-mixture plan + deterministic shuffle
    out.update(SAMPLING) # hash-bucket split + stratified sampling
    out.update(STREAM)   # event-time windows, stream join, stream ingest
    out.update(STATEFUL) # applyInPandasWithState running stats (NEW r3)
    out.update(AVRO)     # OCF ingest roundtrip (NEW r3)
    out.update(TEXTFMT)  # JSONL corpus source roundtrip (NEW r5)
    out.update(UDF)      # pandas UDF / UDAF / UDTF
    out.update(BUCKETED) # co-located (exchange-free) fact-fact join
    out.update(TABLE)    # table-layer lifecycle (incremental change feed)
    out.update(REL)      # relational core
    out.update(RELX)     # bonus relational variants
    out.update(TPCH)     # headline multi-join analytics

    # ORDER MATTERS: the driver's correctness artifact covers the first
    # 50 registry entries in dict order. Round-5 window, per the
    # rotation discipline (every query whose module — or dependency —
    # changed since its last driver row gets back in the window):
    # (a) queries with NO driver row yet: the 4 late-r4 registrations
    # (r4 verdict item 1) plus everything new in r5 (tpch q1/q4/q6/q7/
    # q8/q12/q13/q14/q17/q18/q19/q21/q22, table_time_travel, table_wap,
    # table_partition_evolution, table_cdc, table_cdc_mor,
    # corpus_decontaminate, corpus_pack);
    # (b) table-layer queries: ice_table.py/manifest.py changed in r5
    # (WAP staging, tags, rename-stat-cols, estimator);
    # (c) streaming/queries.py changed post-r4-window — but the diff
    # since the r4 driver run (14b4e64..HEAD on that file) touches ONLY
    # stream_dedup_q (source caching + checkpoint cleanup), so the
    # event-time quartet's green r4 rows (win_tumbling/win_sliding/
    # win_session/stream_join, recorded on current window code) stand,
    # and their slots go to the five NEW r5 corpus-assembly queries
    # (corpus_quality, corpus_pii, vocab_topk, corpus_mix,
    # corpus_shuffle — new modules quality.py/vocab.py/assembly.py,
    # no other module touched). streaming/ingest.py's later r5 diff
    # (auto-maintenance) is likewise confined to
    # stream_ingest_to_table / stream_cdc_to_table — the quartet's
    # operators (tumbling_counts/sliding_counts/session_agg/
    # stream_stream_join) are byte-identical. stream_ingest stays
    # in-window: its own entry point IS the changed function;
    # (d) tpch.py gained q1/q4/q6/q12/q14/q18 around the r3-row
    # veterans q3/q5/q10 — refresh them on current code;
    # (e) similarity.py changed post-window (IVF staleness monitors);
    # (f) session.py estimator rewrite (suffix parse, real split
    # formula) rides under every spread() user: aggs, udfs,
    # multimodal, text, dedup;
    # Queries NOT listed keep green rows on code unchanged since they
    # were recorded: relational.py scan/project/filter/scalar/agg/
    # join/window tails, relational_ext, bucketed, sampling, stateful,
    # stream trio r4 rows; join_anti/theta/asof r3 rows (modules
    # untouched since); and the rows-only dedup_simhash /
    # dedup_embedding_lsh / dedup_clusters_minhash r4 rows (dedup.py /
    # llm_queries.py unchanged in r5 — a rows-only refresh verifies
    # nothing new, so their slots went to the six new TPC-H queries);
    # text_ngrams'/corpus_clean's/udtf_tokenize's r4 rows likewise
    # stand (own modules llm_queries.py / udfs.py unchanged), freeing
    # slots for table_cdc_mor, corpus_decontaminate, and corpus_pack
    # (all NEW, no row).
    # R6 WINDOW LEADS (registered late-r5, past the full 50-slot
    # window): dedup_simhash_portable — the SimHash twin of
    # dedup_minhash_portable (fully oracle-checked via md5 bit votes)
    # — and dedup_clusters_portable — the END-TO-END portable dedup
    # (md5 MinHash-LSH pairs → connected components) whose oracle is
    # DuckDB's recursive transitive closure over the SAME pairs CTE,
    # upgrading the production clustering path from rows-only to a
    # full value-hash check — and dedup_embedding_lsh_portable — the
    # THIRD hash family upgraded (Rademacher hyperplanes as literal
    # arrays in both engines, BIGINT-quantized sign bits, proven
    # cosine verify) — plus sim_search_lsh_portable (ANN over those
    # buckets), sim_search_ivf_portable (deterministic-quantizer IVF),
    # and agg_approx_distinct_portable (KMV sketch — the estimate
    # itself matches DuckDB). All repo-oracle green in
    # tests/test_llm_oracle.py at sf0.001 AND hand-verified at
    # sf0.01. Rotate them in first next round, the same way the
    # late-r4 quartet led r5.
    priority = [
        # (a) no driver row yet — r5 leads
        "table_upsert", "table_delete_mor", "table_compact",
        "stream_dedup", "table_time_travel", "table_wap",
        "table_partition_evolution", "table_cdc", "table_cdc_mor",
        "corpus_decontaminate", "corpus_pack",
        "tpch_q1", "tpch_q4", "tpch_q6", "tpch_q7", "tpch_q8",
        "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q17", "tpch_q18",
        "tpch_q19", "tpch_q21", "tpch_q22",
        "corpus_quality", "corpus_pii", "vocab_topk",
        "corpus_mix", "corpus_shuffle", "corpus_decontaminate_exact",
        # (b) table layer (ice_table/manifest/table_queries r5 diff)
        "table_incremental", "zorder_range_scan", "schema_evolution",
        # (c) streaming/ingest.py r5 diff rider (the queries.py diff is
        # stream_dedup-localized; see note above)
        "stream_ingest",
        # (d) the tpch veterans q3/q5/q10 all keep their green rows —
        # their functions are byte-identical since those rows (tpch.py's
        # r5 diff is purely additive); the three slots went to the NEW
        # corpus_decontaminate_exact, scan_jsonl, and
        # dedup_minhash_portable (no rows at all — and the last one
        # upgrades the MinHash-LSH family from rows-only to a FULL
        # value-hash check by rebuilding it on engine-portable md5)
        "scan_jsonl", "dedup_minhash_portable",
        # (e) similarity.py post-window diff (IVF monitors; the diff is
        # localized to IvfIndex, so sim_search_ivf re-verifies the
        # changed path; sim_search/sim_search_batch keep their green
        # rows — their functions and the shared prelude are
        # byte-identical — and sim_search_lsh its rows-only r4 row.
        # The freed slot re-verifies join_bucketed instead: its
        # dependency ice_table.py changed in r5 (WAP, maintenance,
        # expire pinning) — the create/as_bucketed_table path it uses
        # is byte-identical, but a driver row on current code beats a
        # third byte-identical TPC-H refresh
        "sim_search_ivf", "join_bucketed",
        # (f) session.py estimator riders (spread users)
        "agg_hash", "udf_scalar", "udaf_group_stats",
        "multimodal_meta", "multimodal_chunks", "multimodal_features",
        "text_analysis",
        "dedup_exact", "dedup_near_jaccard", "dedup_minhash_lsh",
        "dedup_embedding", "dedup_clusters",
    ]
    ordered: dict[str, Entry] = {k: out[k] for k in priority if k in out}
    ordered.update({k: v for k, v in out.items() if k not in ordered})
    return ordered
