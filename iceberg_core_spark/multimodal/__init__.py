from iceberg_core_spark.multimodal.binary_columns import (
    attach_metadata,
    decode_and_featurize,
    sample_chunks,
    to_binary,
)

__all__ = ["attach_metadata", "decode_and_featurize", "sample_chunks", "to_binary"]
