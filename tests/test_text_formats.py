"""JSONL/CSV corpus sources: lossless round trip against the parquet
original (the DuckDB oracle IS the original table), plus schema and
malformed-input behavior."""

import pytest

from iceberg_core_spark.sources.text_formats import (
    DOC_SCHEMA,
    QUERIES,
    read_jsonl_corpus,
    scan_csv,
    scan_jsonl,
)
from tests.oracle import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_DIR)
    yield c
    c.close()


def test_scan_jsonl_roundtrip_oracle(spark, con):
    fn, sql = QUERIES["scan_jsonl"]
    compare(fn(spark, SF_DIR), con, sql, "scan_jsonl")


def test_scan_csv_roundtrip_oracle(spark, con):
    compare(scan_csv(spark, SF_DIR), con,
            "SELECT doc_id, text, lang, source, n_chars FROM documents",
            "scan_csv")


def test_jsonl_declared_schema_no_inference(spark):
    df = scan_jsonl(spark, SF_DIR)
    assert df.schema == DOC_SCHEMA


def test_jsonl_preserves_tricky_strings(spark, tmp_path):
    """JSON escapes must round-trip: quotes, backslashes, newlines,
    non-ASCII — the cases a CSV-ish hand-rolled writer corrupts."""
    import json

    rows = [
        {"doc_id": 1, "text": 'say "hi"\\n', "lang": "en",
         "source": "s", "n_chars": 9},
        {"doc_id": 2, "text": "tab\there\nnewline", "lang": "zh",
         "source": "s", "n_chars": 16},
        {"doc_id": 3, "text": "héllo wörld — 你好", "lang": "de",
         "source": "s", "n_chars": 16},
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps(r, ensure_ascii=False)
                           for r in rows), encoding="utf-8")
    got = {r["doc_id"]: r["text"]
           for r in read_jsonl_corpus(spark, str(p)).collect()}
    assert got == {r["doc_id"]: r["text"] for r in rows}
