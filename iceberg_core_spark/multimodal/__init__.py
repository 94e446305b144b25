from iceberg_core_spark.multimodal.binary_columns import (
    attach_metadata,
    default_encoder,
    decode_and_featurize,
    decode_media_features,
    decode_payload,
    encode_media,
    encode_ppm_bytes,
    encode_wav_bytes,
    sample_chunks,
    to_binary,
)

__all__ = [
    "attach_metadata",
    "default_encoder",
    "decode_and_featurize",
    "decode_media_features",
    "decode_payload",
    "encode_media",
    "encode_ppm_bytes",
    "encode_wav_bytes",
    "sample_chunks",
    "to_binary",
]
