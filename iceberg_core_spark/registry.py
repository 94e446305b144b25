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

    from iceberg_core_spark.functions.llm_queries import QUERIES as LLM
    from iceberg_core_spark.operators.relational_ext import QUERIES as RELX
    from iceberg_core_spark.operators.udfs import QUERIES as UDF
    from iceberg_core_spark.functions.sampling import QUERIES as SAMPLING
    from iceberg_core_spark.operators.bucketed import QUERIES as BUCKETED
    from iceberg_core_spark.operators.table_queries import QUERIES as TABLE
    from iceberg_core_spark.operators.tpch import QUERIES as TPCH
    from iceberg_core_spark.streaming.queries import QUERIES as STREAM

    from iceberg_core_spark.sources.avro_ocf import QUERIES as AVRO
    from iceberg_core_spark.streaming.stateful import QUERIES as STATEFUL

    out: dict[str, Entry] = {}
    out.update(LLM)      # north-star: dedup / similarity / text / multimodal
    out.update(SAMPLING) # hash-bucket split + stratified sampling
    out.update(STREAM)   # event-time windows, stream join, stream ingest
    out.update(STATEFUL) # applyInPandasWithState running stats (NEW r3)
    out.update(AVRO)     # OCF ingest roundtrip (NEW r3)
    out.update(UDF)      # pandas UDF / UDAF / UDTF
    out.update(BUCKETED) # co-located (exchange-free) fact-fact join
    out.update(TABLE)    # table-layer lifecycle (incremental change feed)
    out.update(REL)      # relational core
    out.update(RELX)     # bonus relational variants
    out.update(TPCH)     # headline multi-join analytics

    # ORDER MATTERS: the driver's correctness artifact covers the first
    # 50 registry entries in dict order. Round 4 completes the rotation
    # so every query has a row recorded on post-NTZ code across r3∪r4:
    # (a) the 7 rows-only queries that have NEVER had a driver row
    # recorded on current code; (b) the stream trio whose module
    # changed in r3 after their r2 rows; (c) the 23 queries whose only
    # green row predates r3's session.py load-path change; (d) queries
    # new or changed in round 4 (table layer rename/orphans —
    # zorder_range_scan, schema_evolution, table_incremental; dedup.py
    # slot-release; llm_queries/sampling/stateful oracle fixes;
    # agg_hash + udfs ride session.spread's estimator change and are
    # already in (c)). Queries NOT listed keep their r3 rows: their
    # modules are unchanged in r4 (relational.py tail, relational_ext,
    # asof, tpch q3/q5, avro, similarity). streaming/queries.py gained
    # stream_dedup in r4 (append-only diff); its out-of-window rows
    # (stream_ingest, win_tumbling) stay covered on current code by
    # the parametrized repo oracle tests, and the in-window stream
    # trio re-verifies the same module's shared paths.
    priority = [
        # (a) never-recorded rows-only production twins
        "dedup_minhash_lsh", "dedup_simhash", "dedup_embedding_lsh",
        "dedup_clusters_minhash", "sim_search_lsh", "sim_search_ivf",
        "agg_approx_distinct",
        # (b) stream trio: module changed in r3 after their r2 rows
        "win_sliding", "win_session", "stream_join",
        # (c) r2 rows predating the r3 load-path change
        "scan_parquet", "project", "filter_pred", "filter_range",
        "scalar_string", "scalar_date", "scalar_math", "scalar_array",
        "scalar_json", "agg_hash", "agg_distinct", "agg_rollup",
        "agg_cube", "agg_grouping_sets", "join_broadcast",
        "join_sortmerge", "join_left", "join_right", "join_full",
        "udf_scalar", "udaf_group_stats", "udtf_tokenize",
        "join_bucketed",
        # (d) new or changed in round 4
        "zorder_range_scan", "schema_evolution", "table_incremental",
        "dedup_exact", "dedup_near_jaccard", "dedup_embedding",
        "dedup_clusters", "text_analysis", "text_ngrams",
        "corpus_clean", "multimodal_meta", "multimodal_chunks",
        "multimodal_features", "stateful_stats", "split_train_test",
        "sample_stratified",
        # r3 flagged tpch_q10 warm-median as perf-suspect; refresh its
        # row alongside the clean-session bench confirmation
        "tpch_q10",
    ]
    ordered: dict[str, Entry] = {k: out[k] for k in priority if k in out}
    ordered.update({k: v for k, v in out.items() if k not in ordered})
    return ordered
