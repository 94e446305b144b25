"""LLM-data-pipeline operator surface (SURVEY.md §2.B last row; the
north-star "dedup, similarity search, multimodal columns, text analysis").

All hot-path expressions are JVM-side built-ins (split/transform/filter/
array_* / xxhash64) — no row-at-a-time Python anywhere; the only Python
touchpoints are Arrow-batched pandas UDFs in the multimodal stubs.
"""
