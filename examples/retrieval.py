#!/usr/bin/env python
"""Both halves of retrieval in one script: lexical (BM25 keyword
search over documents) and semantic (exact cosine top-k over
embeddings), each in its 100 TB shape.

Run:  PYTHONPATH=. python examples/retrieval.py

Lexical: term frequencies are literal per-term columns (no explode,
no shuffle), corpus stats collapse to one broadcast row, top-k per
query rides TakeOrderedAndProject — the corpus streams through
however many queries ride along. Semantic: the exact pass is one
corpus scan with the probe broadcast (the bucketed/IVF ANN variants
live in the registry as sim_search_lsh / sim_search_ivf).
"""

from pyspark.sql import functions as F

from iceberg_core_spark import get_spark
from iceberg_core_spark.functions.search import bm25_search
from iceberg_core_spark.functions.similarity import cosine_topk
from iceberg_core_spark.session import load_table

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("retrieval")
    spark.sparkContext.setLogLevel("ERROR")

    # --- lexical: BM25 over the documents corpus -------------------
    docs = load_table(spark, SF, "documents")
    queries = [(1, "spark shuffle join"), (2, "window hash sort")]
    hits = bm25_search(docs, queries, k=5)
    print("BM25 top-5 per query:")
    hits.orderBy("query_id", "rank").show(10, truncate=False)

    # attach the matched text for eyeballing relevance
    joined = (hits.join(docs.select("doc_id",
                                    F.substring("text", 1, 60)
                                    .alias("snippet")), "doc_id")
              .orderBy("query_id", "rank"))
    joined.show(4, truncate=False)

    # --- semantic: cosine top-k over the embeddings corpus ---------
    emb = load_table(spark, SF, "embeddings")
    [probe] = emb.filter("vec_id = 7").select("embedding").collect()
    top = cosine_topk(emb, [float(x) for x in probe["embedding"]],
                      k=5, extra_cols=("label",))
    print("cosine top-5 around vec_id 7 (itself first, sim 1.0):")
    top.show(truncate=False)
    rows = top.collect()
    assert rows[0]["vec_id"] == 7 and rows[0]["sim"] == 1.0
    print("RETRIEVAL OK")
    spark.stop()


if __name__ == "__main__":
    main()
