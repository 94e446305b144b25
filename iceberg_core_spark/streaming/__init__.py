from iceberg_core_spark.streaming.ingest import (
    stream_cdc_to_table,
    stream_merge_to_table,
    stream_ingest_to_table,
    session_agg,
    sliding_counts,
    stream_dedup,
    stream_stream_join,
    tumbling_counts,
)

__all__ = [
    "stream_ingest_to_table",
    "stream_cdc_to_table",
    "stream_merge_to_table",
    "tumbling_counts",
    "sliding_counts",
    "session_agg",
    "stream_dedup",
    "stream_stream_join",
]
