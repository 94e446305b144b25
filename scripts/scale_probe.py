#!/usr/bin/env python
"""Scale probe: measure how the dedup family's wall time grows with
corpus volume — the signal the sf0.1 bench can NEVER show (it measures
one fixed size), and the one that caught simhash's single-chunk
blocking going super-linear in r14 (8.2x work at 5x data while
minhash_lsh grew 4.55x).

Method (committed per the r14 verdict; the r14 probe lived in /tmp):

- Input at scale k = the sf documents table unioned k times with
  offset ids; copy texts perturb per --perturb (see
  materialize_scaled): "translate" makes cross-copy docs UNIQUE so
  growth measures the BACKGROUND blocking term (the billion-doc
  regime on a mostly-unique corpus), "tag" keeps copies as true
  near-dups so growth measures the dense-replica-cluster regime
  (candidate volume dominated by real collisions).
- Each scaled input is materialized to /tmp parquet first (generation
  cost excluded), then each operator runs one warm-up pass + N timed
  passes to a noop sink; the per-op number is the MIN of the timed
  passes (least-noise estimator for a fixed workload on a shared box).
- The headline is ratio_5x/1x per operator, printed as one JSON line.

A ratio near the scale factor k is linear (healthy); well above k is
super-linear — either a blocking constant blowing up (fix the scheme,
as r14 did for simhash) or a genuinely quadratic term (document it and
provide an escape hatch). Sub-linear means fixed overhead dominates at
probe scale; re-probe at bigger k before concluding anything.

Usage:
    python scripts/scale_probe.py [--sf DIR] [--scales 1,5]
        [--ops exact,minhash,simhash,simhash_single] [--passes 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_ops():
    """op name -> (input table, fn). Text ops probe over the scaled
    documents corpus; embedding_lsh probes over the scaled embeddings
    table (its scale posture was asserted-only before r15)."""
    from iceberg_core_spark.functions import dedup

    return {
        "exact": ("documents", lambda df: dedup.dedup_exact(df)),
        "minhash": ("documents", lambda df: dedup.minhash_lsh_pairs(df)),
        # default blocking: Manku chunk-pair keys (n_chunks=9)
        "simhash": ("documents", lambda df: dedup.simhash_pairs(df)),
        # the pre-r14 default: single-chunk 8-bit keys (n_chunks=8) —
        # kept in the probe so the background-term cut stays measured,
        # not asserted
        "simhash_single": ("documents",
                           lambda df: dedup.simhash_pairs(df, n_chunks=8)),
        "embedding_lsh": ("embeddings",
                          lambda df: dedup.embedding_dup_pairs_lsh(
                              df, dim=64)),
    }


def materialize_scaled(spark, sf_dir: str, k: int, out_dir: str,
                       perturb: str = "translate") -> str:
    """Write the k-times-scaled documents corpus to parquet; returns
    the path. doc_id offsets by c * 10^9 (ids stay unique); copy c's
    text perturbs per ``perturb``:

    - "translate" (default): a copy-specific letter substitution over
      the whole text — length- and structure-preserving but
      decorrelating (most shingles and simhash bits change), so
      cross-copy docs are UNIQUE and the measured growth is the
      BACKGROUND blocking term — the quantity that decides billion-doc
      behavior on a mostly-unique corpus.
    - "tag": a short copy prefix only — signatures stay within a few
      bits/shingles of the original, so every doc gains k-1 true
      near-dups: the DENSE-REPLICA-CLUSTER regime, where candidate
      volume is dominated by real collisions (and chunk-pair simhash
      blocking pays its documented 36-combo duplicate-candidate tax).
    """
    from pyspark.sql import functions as F

    from iceberg_core_spark.session import load_table

    # rotations of the high-frequency letters: copy c maps rot[0] to a
    # c-rotated target string, scrambling most 3-shingles and words
    letters = "etaoinsrhl"

    def scrambled(c):
        rot = letters[c % len(letters):] + letters[:c % len(letters)]
        return F.translate(F.col("text"), letters, rot)

    docs = load_table(spark, sf_dir, "documents")
    copies = []
    for c in range(k):
        if c == 0:
            text = F.col("text")
        elif perturb == "translate":
            text = F.concat(F.lit(f"copy{c} "), scrambled(c))
        else:
            text = F.concat(F.lit(f"copy{c} "), F.col("text"))
        copies.append(docs.select(
            (F.col("doc_id") + F.lit(c * 1_000_000_000)).alias("doc_id"),
            text.alias("text")))
    df = copies[0]
    for c in copies[1:]:
        df = df.unionByName(c)
    path = os.path.join(out_dir, f"docs_{perturb}_x{k}.parquet")
    df.repartition(32).write.mode("overwrite").parquet(path)
    return path


def materialize_scaled_embeddings(spark, sf_dir: str, k: int,
                                  out_dir: str,
                                  perturb: str = "translate") -> str:
    """k-times-scaled embeddings table. "translate": copy c's vectors
    ROTATE by c components — random-vector rotations are ~orthogonal,
    so cross-copy vectors are unique and growth measures the LSH
    bucket-collision background. "tag": copies are IDENTICAL vectors
    (cosine 1.0 dups) — the dense replica-cluster regime."""
    from pyspark.sql import functions as F

    from iceberg_core_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    copies = []
    for c in range(k):
        rot = c % dim
        if c == 0 or perturb != "translate" or rot == 0:
            vec = F.col("embedding")
        else:
            vec = F.concat(
                F.slice(F.col("embedding"), rot + 1, dim - rot),
                F.slice(F.col("embedding"), 1, rot))
        copies.append(emb.select(
            (F.col("vec_id") + F.lit(c * 1_000_000_000)).alias("vec_id"),
            vec.alias("embedding")))
    df = copies[0]
    for c in copies[1:]:
        df = df.unionByName(c)
    path = os.path.join(out_dir, f"emb_{perturb}_x{k}.parquet")
    df.repartition(32).write.mode("overwrite").parquet(path)
    return path


def time_op(spark, fn, path: str, passes: int) -> float:
    from iceberg_core_spark.caching import release_caches

    best = float("inf")
    for p in range(passes + 1):  # pass 0 = warm-up, untimed
        release_caches()
        df = spark.read.parquet(path)
        t0 = time.perf_counter()
        fn(df).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if p > 0:
            best = min(best, dt)
    release_caches()
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--scales", default="1,5")
    ap.add_argument("--ops", default="exact,minhash,simhash,simhash_single")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--perturb", default="translate",
                    choices=["translate", "tag"])
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    op_names = args.ops.split(",")

    from iceberg_core_spark.session import get_spark

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    ops = build_ops()
    work = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        kinds = {ops[n][0] for n in op_names if n in ops}
        paths: dict = {}
        if "documents" in kinds:
            paths["documents"] = {
                k: materialize_scaled(spark, args.sf, k, work,
                                      args.perturb) for k in scales}
        if "embeddings" in kinds:
            paths["embeddings"] = {
                k: materialize_scaled_embeddings(
                    spark, args.sf, k, work, args.perturb)
                for k in scales}
        counts = {kind: {k: spark.read.parquet(p).count()
                         for k, p in by_scale.items()}
                  for kind, by_scale in paths.items()}
        result: dict = {"metric": "dedup_scale_probe", "sf": args.sf,
                        "perturb": args.perturb, "scales": scales,
                        "rows": counts, "ops": {}}
        for name in op_names:
            if name not in ops:
                print(f"skipping unknown op {name}", file=sys.stderr)
                continue
            kind, fn = ops[name]
            secs = {k: round(
                time_op(spark, fn, paths[kind][k], args.passes), 3)
                    for k in scales}
            ratio = (round(secs[scales[-1]] / secs[scales[0]], 2)
                     if secs[scales[0]] > 0 else None)
            result["ops"][name] = {"sec": secs, "ratio": ratio}
            print(f"  {name}: {secs} ratio {ratio}", file=sys.stderr)
        print(json.dumps(result))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
