"""Multimodal column support: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
iterators.

The Spark-side plumbing — schema, partition-friendly layout, UDF
signatures, batch shapes — is real and tested. The actual media decode
is STUBBED (this container has no image/audio libraries): pass
``fake=True`` for a deterministic feature extractor (blake2b-seeded),
or ``fake=False`` to get the clearly-marked NotImplementedError where a
real decoder (PIL/librosa/ffmpeg) plugs in.

Scale notes: payload bytes travel Spark→Python as Arrow buffers (no
pickling); ``mapInPandas`` yields per-batch DataFrames so peak memory is
one Arrow batch (spark.sql.execution.arrow.maxRecordsPerBatch), not one
partition; feature vectors return as list<float> columns ready for
similarity.py. Binary payloads >2 GB per row are out of scope (Spark
BinaryType limit) — store a URI + byte-range instead and fetch in the
iterator.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 16

MEDIA_META_FIELDS = [
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("checksum", StringType()),
]


def to_binary(df: DataFrame, text_col: str, out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary payload column (here: utf-8 bytes of
    a text column — the container has no real media, but the column type
    and everything downstream is exactly what image bytes would use)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def attach_metadata(df: DataFrame, binary_col: str = "payload",
                    media_type: str = "text/plain") -> DataFrame:
    """Typed metadata struct computed JVM-side from the payload."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(F.col(binary_col)).cast("long").alias("n_bytes"),
            F.sha2(F.col(binary_col), 256).alias("checksum"),
        ),
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real encoder: blake2b(payload) seeds
    a fixed-dim pseudo-embedding. Same bytes → same vector, any machine."""
    digest = hashlib.blake2b(payload, digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(digest, "big"))
    return [float(x) for x in rng.standard_normal(dim).astype(np.float32)]


def decode_and_featurize(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = True,
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """binary payload → feature vector via ``mapInPandas`` (Arrow batches).

    Real pipeline shape: decode (PIL.Image.open / audio resample / frame
    sample) → model features. Here the decode step is stubbed; the
    distributed plumbing (schema, batching, skew-neutral narrow map) is
    the deliverable.
    """
    out_schema = StructType([
        StructField(id_col, df.schema[id_col].dataType),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/librosa/ffmpeg — "
                    "not available in this container; use fake=True"
                )
            payloads = pdf[binary_col]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_bytes": payloads.map(len).astype("int64"),
                "features": payloads.map(lambda p: _fake_features(bytes(p), dim)),
            })

    from iceberg_core_spark.session import spread

    return spread(df.select(id_col, binary_col)).mapInPandas(run, out_schema)


def sample_chunks(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    chunk_bytes: int = 256,
    every_n: int = 4,
) -> DataFrame:
    """Frame-sampling shape for video/audio payloads: split the byte
    stream into fixed-size chunks and keep every Nth (a real pipeline
    samples keyframes/windows; byte chunking stands in for the decoder).
    One input row → many (id, chunk_idx, chunk) rows via ``mapInPandas``
    — a narrow op, rows stay with their partition, memory bounded by one
    Arrow batch."""
    out_schema = StructType([
        StructField(id_col, df.schema[id_col].dataType),
        StructField("chunk_idx", LongType()),
        StructField("chunk", BinaryType()),
        StructField("chunk_bytes", LongType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, chunks = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(payload)
                for ci in range(0, (len(b) + chunk_bytes - 1) // chunk_bytes,
                                every_n):
                    ids.append(rid)
                    idxs.append(ci)
                    chunks.append(b[ci * chunk_bytes:(ci + 1) * chunk_bytes])
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                "chunk_idx": pd.Series(idxs, dtype="int64"),
                "chunk": chunks,
                "chunk_bytes": pd.Series([len(c) for c in chunks],
                                         dtype="int64"),
            })

    from iceberg_core_spark.session import spread

    return spread(df.select(id_col, binary_col)).mapInPandas(run, out_schema)
