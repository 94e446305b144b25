#!/usr/bin/env python
"""Entity-resolution-style fuzzy matching: find document pairs whose
normalized openings are within a small edit distance, then widen a
keyword search with a document-scale term set.

Run:  PYTHONPATH=. python examples/fuzzy_matching.py

The fuzzy pass is the segment-pigeonhole-blocked Levenshtein join
(candidates come from exact-piece equi-joins, never a cross product —
see functions/fuzzy.py); the search pass is the explode-based BM25
that takes term sets past the column path's 64-term cap.
"""

from pyspark.sql import functions as F

from iceberg_core_spark import get_spark
from iceberg_core_spark.functions.fuzzy import (
    norm_ascii_prefix,
    fuzzy_self_match,
)
from iceberg_core_spark.functions.search import bm25_search_exploded
from iceberg_core_spark.session import load_table

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("fuzzy-matching")
    spark.sparkContext.setLogLevel("ERROR")

    # --- fuzzy openings: near-identical document variants ----------
    docs = load_table(spark, SF, "documents")
    pref = docs.select("doc_id",
                       norm_ascii_prefix(F.col("text")).alias("prefix"))
    pairs = fuzzy_self_match(pref, "doc_id", "prefix", max_dist=2)
    print("Document pairs with openings within edit distance 2:")
    (pairs.join(pref.withColumnRenamed("doc_id", "id_a"), "id_a")
     .orderBy("dist", "id_a", "id_b")
     .show(10, truncate=False))

    # --- document-as-query BM25 (past the 64-term column cap) ------
    sample = (docs.filter(F.col("text").isNotNull()
                          & (F.trim("text") != ""))
              .orderBy("doc_id").limit(1).collect()[0])
    hits = bm25_search_exploded(docs, [(sample["doc_id"],
                                        sample["text"])], k=5)
    print(f"Top-5 BM25 matches for doc {sample['doc_id']} "
          "used as the query:")
    hits.orderBy("rank").show(truncate=False)


if __name__ == "__main__":
    main()
