"""Multimodal binary-column plumbing: schema, Arrow batch shapes,
determinism of the stubbed featurizer, and the explicit decode stub."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, FloatType, LongType

from iceberg_core_spark.multimodal import (
    attach_metadata,
    decode_and_featurize,
    to_binary,
)
from iceberg_core_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_bin(spark):
    return to_binary(load_table(spark, SF_DIR, "documents"), "text")


def test_binary_column_type(spark, docs_bin):
    assert isinstance(docs_bin.schema["payload"].dataType, BinaryType)


def test_metadata_struct(spark, docs_bin):
    meta = attach_metadata(docs_bin)
    row = meta.select("n_chars", "media_meta.*").first()
    assert row.media_type == "text/plain"
    assert row.n_bytes >= row.n_chars  # utf-8 bytes >= chars
    assert len(row.checksum) == 64  # sha256 hex


def test_featurize_schema_and_shapes(spark, docs_bin):
    feats = decode_and_featurize(docs_bin, fake=True)
    assert isinstance(feats.schema["features"].dataType, ArrayType)
    assert isinstance(feats.schema["features"].dataType.elementType, FloatType)
    assert isinstance(feats.schema["n_bytes"].dataType, LongType)
    rows = feats.collect()
    assert len(rows) == docs_bin.count()
    assert all(len(r.features) == 16 for r in rows)


def test_featurize_deterministic(spark, docs_bin):
    a = {r.doc_id: r.features for r in decode_and_featurize(docs_bin).collect()}
    b = {r.doc_id: r.features for r in decode_and_featurize(docs_bin).collect()}
    assert a == b


def test_real_decode_raises_not_implemented(spark, docs_bin):
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        decode_and_featurize(docs_bin, fake=False).collect()
