"""Multimodal binary-column plumbing: schema, Arrow batch shapes,
determinism of the featurizer, and the REAL stdlib container codecs
(WAV RIFF chunk walk, P6 PPM header parse) with planted payloads."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, FloatType, LongType

from iceberg_core_spark.multimodal import (
    attach_metadata,
    decode_and_featurize,
    decode_media_features,
    decode_payload,
    encode_media,
    encode_ppm_bytes,
    encode_wav_bytes,
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


PLANTED = b"The quick brown fox jumps over the lazy dog 0123456789"


def test_wav_roundtrip_planted():
    payload = encode_wav_bytes(PLANTED)
    # spec-level header facts, parsed back from bytes alone
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    media_type, rate, samples = decode_payload(payload)
    assert media_type == "audio/wav"
    assert rate == 16000
    assert samples.dtype == np.int16
    assert np.array_equal(
        samples, np.frombuffer(PLANTED, np.uint8).astype(np.int16))


def test_ppm_roundtrip_planted():
    payload = encode_ppm_bytes(PLANTED)
    assert payload[:2] == b"P6"
    media_type, width, raster = decode_payload(payload)
    assert media_type == "image/ppm"
    assert width == len(PLANTED) // 3
    assert np.array_equal(
        raster, np.frombuffer(PLANTED[: width * 3], np.uint8))


def test_decode_rejects_unknown_container():
    with pytest.raises(ValueError, match="unrecognized media container"):
        decode_payload(b"\x89PNG\r\n\x1a\n not actually supported")


def test_decode_media_features_planted(spark):
    df = spark.createDataFrame(
        [(0, "abcdef"), (1, "abcdefg")], ["doc_id", "text"])
    rows = {r.doc_id: r for r in
            decode_media_features(encode_media(df)).collect()}
    wav, ppm = rows[0], rows[1]
    b6 = np.frombuffer(b"abcdef", np.uint8)
    assert (wav.media_type, wav.n_units, wav.rate_or_width) == (
        "audio/wav", 6, 16000)
    assert (wav.sum_val, wav.min_val, wav.max_val) == (
        int(b6.sum()), int(b6.min()), int(b6.max()))
    # odd id → PPM, trailing byte of "abcdefg" dropped (width 2 = 6 bytes)
    assert (ppm.media_type, ppm.n_units, ppm.rate_or_width) == (
        "image/ppm", 2, 2)
    assert ppm.sum_val == int(b6.sum())


def test_real_featurize_from_decoded_samples(spark):
    df = spark.createDataFrame([(0, "hello media"), (1, "hello media")],
                               ["doc_id", "text"])
    feats = decode_and_featurize(encode_media(df), fake=False).collect()
    assert all(len(r.features) == 16 for r in feats)
    # same text, different containers (wav vs ppm-truncated) → both real
    assert all(abs(sum(r.features[:12]) - 1.0) < 1e-5 for r in feats)


def test_multimodal_features_oracle_non_ascii(spark, tmp_path):
    """The registered oracle must stay byte-based: for non-ASCII text,
    character-based SQL (length/ord) diverges from the engine's UTF-8
    byte arithmetic. 'é!' is 2 chars but 3 bytes — included by the
    byte filter, and its PPM raster covers all 3 bytes."""
    import duckdb

    from iceberg_core_spark.functions.llm_queries import (
        MULTIMODAL_FEATURES_SQL,
        multimodal_features,
    )
    from tests.oracle import compare

    rows = [
        (0, "héllo wörld"),      # wav over 13 UTF-8 bytes (11 chars)
        (1, "日本語テキスト"),     # ppm, 21 bytes (7 chars)
        (2, "ab"),               # 2 bytes: filtered out on both sides
        (3, "é!"),               # 3 bytes / 2 chars: byte-filter keeps it
        (4, "naïve résumé"),
    ]
    docs = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1) \
        .write.parquet(docs)
    got = multimodal_features(spark, str(tmp_path))
    assert {r.doc_id for r in got.select("doc_id").collect()} == {0, 1, 3, 4}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{docs}/*.parquet'")
    compare(got, con, MULTIMODAL_FEATURES_SQL, "multimodal_non_ascii")


def test_wav_walker_skips_odd_chunk_pad_byte():
    """RIFF chunks are word-aligned: an odd-sized chunk carries a pad
    byte not counted in its size field. A WAV with an odd-length LIST
    chunk before fmt/data must still decode (r12 review)."""
    import struct

    import numpy as np

    from iceberg_core_spark.multimodal.binary_columns import (
        _decode_wav,
        encode_wav_bytes,
    )

    good = encode_wav_bytes(b"abc")
    # splice an odd-sized LIST chunk (+ its pad byte) right after the
    # WAVE magic, before the fmt chunk
    odd_chunk = struct.pack("<4sI", b"LIST", 3) + b"INF" + b"\x00"
    patched_body = good[8:12] + odd_chunk + good[12:]
    payload = struct.pack("<4sI", b"RIFF", len(patched_body)) + patched_body
    rate, samples = _decode_wav(payload)
    assert rate == 16000
    assert np.array_equal(samples, np.frombuffer(b"abc", np.uint8)
                          .astype("<i2"))


def test_encoder_injection_runs_in_arrow_batches(spark, docs_bin):
    """The deep-feature hook (r13 ruling, TODO item 1): a caller-
    supplied batch callable runs inside the same mapInPandas loop —
    real model-inference plumbing, proven offline with a deterministic
    numpy 'model' (mean byte value per payload, dim 3)."""
    import numpy as np
    import pandas as pd

    from iceberg_core_spark.multimodal import decode_and_featurize

    def tiny_model(payloads: pd.Series) -> pd.Series:
        return pd.Series([
            [float(np.frombuffer(bytes(p), dtype=np.uint8).mean())] * 3
            for p in payloads])

    out = decode_and_featurize(docs_bin, encoder=tiny_model)
    rows = {r.doc_id: r.features for r in out.collect()}
    assert all(len(v) == 3 and v[0] == v[1] == v[2]
               for v in rows.values())
    # matches a driver-side evaluation of the same model byte-exact
    import pyarrow.parquet  # noqa: F401  (env sanity)
    one = docs_bin.limit(1).collect()[0]
    expected = tiny_model(pd.Series([one.payload]))[0]
    assert rows[one.doc_id] == [float(x) for x in expected]


def test_default_encoder_detects_model_libs(spark, docs_bin):
    """default_encoder() auto-detects an importable tensor library at
    runtime; offline (this container) it must raise the documented
    NotImplementedError naming the encoder= escape hatch. If torch IS
    importable, the returned encoder must run end-to-end."""
    from iceberg_core_spark.multimodal import (
        decode_and_featurize,
        default_encoder,
    )

    try:
        import torch  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="encoder="):
            default_encoder()
        pytest.skip("no tensor library in this environment — "
                    "detection raise verified, encode path skipped")
    enc = default_encoder(dim=4)
    out = decode_and_featurize(docs_bin, encoder=enc)
    assert all(len(r.features) == 4 for r in out.collect())


def test_encoder_output_index_is_normalized(spark, docs_bin):
    """r13 ADVICE: an encoder returning a freshly-built Series (its own
    RangeIndex) must still align row-for-row with the batch — without
    index normalization, pandas aligns by label during output-frame
    assembly and features silently go NaN for any non-matching index."""
    import numpy as np
    import pandas as pd

    from iceberg_core_spark.multimodal import decode_and_featurize

    def shifted_index_model(payloads: pd.Series) -> pd.Series:
        vals = [
            [float(np.frombuffer(bytes(p), dtype=np.uint8).mean())]
            for p in payloads
        ]
        # adversarial index: disjoint from any batch RangeIndex
        return pd.Series(vals, index=range(10_000, 10_000 + len(vals)))

    out = decode_and_featurize(docs_bin, encoder=shifted_index_model)
    rows = out.collect()
    assert rows and all(
        r.features is not None and len(r.features) == 1
        and r.features[0] is not None for r in rows)
    # and the values line up with a driver-side run of the same model
    one = docs_bin.limit(1).collect()[0]
    expected = shifted_index_model(pd.Series([one.payload])).iloc[0]
    got = {r.doc_id: r.features for r in rows}[one.doc_id]
    assert [float(x) for x in got] == [float(x) for x in expected]
