"""Relational operator surface (SURVEY.md §2.B).

Every operator here is declarative DataFrame code — Catalyst picks the
physical strategy (broadcast vs sort-merge, pushdown, codegen). The only
hand-built operator is the as-of join, which Spark lacks as a builtin.
"""

from iceberg_core_spark.operators.asof import asof_join

__all__ = ["asof_join"]
