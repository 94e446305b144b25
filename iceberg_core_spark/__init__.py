"""iceberg_core_spark — a PySpark-native analytics engine.

Re-expresses the capability surface of the reference streaming-ingest +
partitioned-block-store + range-query library (see SURVEY.md) as an
idiomatic Spark stack:

- ``iceberg_core_spark.table``   — native Iceberg-style table layer
  (partitioned, key-sorted Parquet + JSON manifest with per-file min/max
  stats, content hashes, snapshots, compaction).
- ``iceberg_core_spark.operators`` — relational operator surface
  (joins incl. as-of, aggregations, windows, set ops, sort/top-k).
- ``iceberg_core_spark.functions`` — scalar function surface and
  LLM-data-pipeline ops (dedup, similarity search, text analysis).
- ``iceberg_core_spark.streaming`` — Structured Streaming ingest into
  the table layer (the reference's BlockManager, Spark-first).
- ``iceberg_core_spark.multimodal`` — binary-column (image/audio)
  plumbing with stubbed decoders.

Everything is declarative DataFrame code: Catalyst handles pushdown,
pruning, join selection and whole-stage codegen; the only "optimizer"
code here is metadata-time manifest pruning (plain Python over manifest
entries) and LSH banding to prune similarity candidates.
"""

from iceberg_core_spark.caching import release_caches
from iceberg_core_spark.session import get_spark

__all__ = ["get_spark", "release_caches"]
__version__ = "0.1.0"
