"""Capstone integration: the training-data LANDING pipeline end to
end, composed purely from library pieces — JSONL files stream in,
every micro-batch is PII-redacted and quality-gated in-flight (pure
Column transforms, no Python), and the survivors land in a
self-maintaining IceTable. The stream's final state must equal the
same transform applied in one batch pass, proving the streaming
composition changes nothing but latency."""

import json
import os

from pyspark.sql import functions as F

from iceberg_core_spark.functions import text as T
from iceberg_core_spark.functions.quality import redact_pii
from iceberg_core_spark.sources.text_formats import DOC_SCHEMA
from iceberg_core_spark.streaming import stream_ingest_to_table
from iceberg_core_spark.table import IceTable, MaintenancePolicy


def _doc(i: int, text: str, lang: str = "en") -> dict:
    return {"doc_id": i, "text": text, "lang": lang,
            "source": f"src{i % 3}", "n_chars": len(text)}


def _clean(df):
    """The in-flight prep: scrub PII, attach token count, gate short
    docs — pure Column expressions, streaming- and batch-identical."""
    out = df.withColumn("text", redact_pii(F.col("text")))
    out = out.withColumn("n_tokens",
                         T.token_count(F.col("text")).cast("long"))
    return out.filter(F.col("n_tokens") >= 5)


def test_streaming_corpus_landing_equals_batch(spark, tmp_path):
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    root = str(tmp_path / "corpus_table")
    ckpt = str(tmp_path / "ckpt")

    batches = [
        [_doc(1, "the quick brown fox jumps over the lazy dog"),
         _doc(2, "short doc"),  # gated: under 5 tokens
         _doc(3, "contact alice@example.com for the full corpus "
                 "details and more text")],
        [_doc(4, "from 10.0.0.1 the crawler fetched ten more pages "
                 "of useful text"),
         _doc(5, "tiny"),  # gated
         _doc(6, "plain clean document with enough tokens to pass "
                 "the gate easily")],
    ]
    for b, rows in enumerate(batches):
        p = os.path.join(src, f"b{b}.jsonl")
        with open(p + ".tmp", "w", encoding="utf-8") as f:
            f.write("\n".join(json.dumps(r) for r in rows))
        os.rename(p + ".tmp", p)
        q = stream_ingest_to_table(
            spark, src, root, DOC_SCHEMA,
            partition_col="lang", key_col="doc_id",
            source_format="json", transform=_clean,
            trigger={"availableNow": True}, checkpoint_dir=ckpt,
            maintenance=MaintenancePolicy(max_files_per_partition=4,
                                          keep_snapshots=5),
            maintenance_every=1,
        )
        assert q.awaitTermination(120)

    t = IceTable(spark, root)
    got = {r["doc_id"]: r for r in t.scan().collect()}

    # batch twin: same transform over all input at once
    all_rows = [r for rows in batches for r in rows]
    batch_df = _clean(spark.createDataFrame(
        [tuple(r[f.name] for f in DOC_SCHEMA.fields) for r in all_rows],
        DOC_SCHEMA))
    want = {r["doc_id"]: r for r in batch_df.collect()}

    assert set(got) == set(want) == {1, 3, 4, 6}
    for k in want:
        assert got[k]["text"] == want[k]["text"]
        assert got[k]["n_tokens"] == want[k]["n_tokens"]
    # PII actually scrubbed in the landed table
    assert "<EMAIL>" in got[3]["text"] and "@" not in got[3]["text"]
    assert "<IP>" in got[4]["text"]
    # reference-shaped range query works on the landed corpus
    assert t.query("en", 1, 4).count() == 3
