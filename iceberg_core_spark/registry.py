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
    from iceberg_core_spark.operators.tpch import QUERIES as TPCH
    from iceberg_core_spark.streaming.queries import QUERIES as STREAM

    out: dict[str, Entry] = {}
    out.update(REL)
    out.update(RELX)
    out.update(TPCH)
    out.update(UDF)
    out.update(LLM)
    out.update(STREAM)
    return out
