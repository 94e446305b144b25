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
    # 50 registry entries in dict order. Round 3 leads with (a) the 31
    # queries whose only driver row predates round-2 changes to their
    # modules (asof.py, tpch.py, relational.py, relational_ext.py), so
    # they get re-verified on current code; (b) queries new or changed
    # in round 3 (scan_avro, stateful_stats, sampling, multimodal/dedup
    # in llm_queries, table_incremental — its table layer changed).
    # Queries NOT in the priority list keep their fresh r2 rows because
    # their modules are unchanged since (streaming/queries.py, udfs.py,
    # bucketed.py, relational.py head, similarity.py).
    priority = [
        # (a) r1-only rows on since-changed modules — re-verify first
        "join_semi", "join_anti", "join_theta", "join_asof",
        "win_rank", "win_rank_ext", "win_analytic", "win_frame",
        "win_range_frame", "sort_limit", "topk_per_group",
        "union_all", "set_intersect", "set_except",
        "scalar_cond", "scalar_string2", "scalar_subquery",
        "scalar_subquery_corr", "explode_tokens", "map_funcs",
        "array_hof", "agg_stats", "agg_pivot", "agg_string_agg",
        "agg_salted", "agg_median", "agg_minmax_by", "agg_conditional",
        "tpch_q3", "tpch_q5", "tpch_q10",
        # (b) new or changed in round 3
        "scan_avro", "stateful_stats", "table_incremental",
        "split_train_test", "sample_stratified",
        "text_analysis", "dedup_exact", "dedup_near_jaccard",
        "dedup_embedding", "dedup_clusters", "corpus_clean",
        "sim_search", "sim_search_batch", "multimodal_meta",
        "multimodal_features", "multimodal_chunks", "text_ngrams",
        # streaming module changed in r3 (type-driven ts handling):
        # re-verify the changed ingest pipeline + the central
        # event-time window; remaining stream/LLM rows-only queries
        # keep their (module-stale) r2 rows — documented trade-off,
        # hash-match coverage outranks rows-only refresh in 50 slots
        "stream_ingest", "win_tumbling",
    ]
    ordered: dict[str, Entry] = {k: out[k] for k in priority if k in out}
    ordered.update({k: v for k, v in out.items() if k not in ordered})
    return ordered
