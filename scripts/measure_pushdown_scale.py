#!/usr/bin/env python
"""r10 VERDICT task 4 — measure before prototyping: when a judge's
batch exceeds ``pushdown_max_keys`` the corpus-side frames fall back
to the FULL skinny-store scan (index_store._push_batch_keys returns
both frames unchanged). Is that scan the dominant cost at GB store
sizes, or is the candidate join itself the cost?

Builds a synthetic GB-scale FuzzyIndex (JVM-side generated strings,
one IceTable commit, rebuild), then times:

  1. judge, batch under the knob   (pushdown ACTIVE: In-filter scan)
  2. judge, batch 10x the knob     (fallback: full skinny scan)
  3. the bare full scan of the two piece kinds (noop write) — the
     upper bound of what any scan-pruning scheme could save in (2)

If (3) is a small share of (2), no distributed pruning scheme (range
aggregate, coarse bloom) can materially help — the join/verify work
dominates — and the fallback stands as-is. Writes its findings as
one JSON line; run on an otherwise idle host.

Usage: PYTHONPATH=. python scripts/measure_pushdown_scale.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    from pyspark.sql import functions as F

    from iceberg_core_spark.functions.fuzzy_index import FuzzyIndex
    from iceberg_core_spark.session import get_spark
    from iceberg_core_spark.table import IceTable

    # the GB-scale judge join needs more than the library's 8g local
    # default (measurement session only — production sizing is the
    # cluster operator's knob)
    spark = get_spark("measure-pushdown-scale",
                      extra_conf={"spark.driver.memory": "48g"})
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    # synthetic corpus: unique-ish 64-char hex bodies with a varying
    # 0-16 char tail so the length-class machinery sees >1 class;
    # generated JVM-side (no Python row path)
    def doc_frame(lo: int, hi: int):
        return (
            spark.range(lo, hi, 1, par)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.sha2(F.col("id").cast("string"), 256),
                    F.expr("substring('abcdefghijklmnop', 1, "
                           "cast(id % 17 as int))"),
                ).alias("text"),
            )
        )

    base = tempfile.mkdtemp(prefix="ice_pushdown_scale_")
    out = {"n_docs": n_docs}
    try:
        t0 = time.perf_counter()
        t = IceTable.create(spark, os.path.join(base, "corpus"),
                            doc_frame(0, n_docs),
                            partition_col=None, key_col="doc_id")
        idx = FuzzyIndex(spark, os.path.join(base, "idx"))
        # rebuild (not sync+compact): a single-commit table leaves
        # compact() a no-op (one snap dir), which would measure an
        # UN-clustered layout; rebuild always routes through
        # _cluster_for_write, giving the production range-clustered
        # piece layout the file-skipping claim depends on
        idx.rebuild(t)
        out["build_sec"] = round(time.perf_counter() - t0, 1)
        out["store_bytes"] = {k: idx._store_bytes(k)
                              for k in idx._KIND_COLS}
        out["pushdown_floor_met"] = bool(
            idx._pushdown_limit("segs", "sprobe"))

        def timed(df) -> float:
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 2)

        # batches drawn from the same id space (worst case: every
        # batch piece has corpus partners). The knob bounds PROBE
        # rows (~(2d+1)^2(d+1) per doc), not batch docs — so 1k docs
        # is ~75k probe rows (under the 100k knob, pushdown ACTIVE)
        # and 13k docs is ~10x the knob (fallback full scan). The
        # off-switch twin for each size isolates what the In-literal
        # path actually buys vs costs at each key count.
        import statistics

        idx_off = FuzzyIndex(spark, os.path.join(base, "idx"),
                             pushdown_max_keys=0)
        timed(idx_off.judge(doc_frame(0, 100)))  # JVM/codegen warmup
        big = idx.pushdown_max_keys * 10 // 75
        cells = [(docs, tag, ix) for docs in (100, 1_000, big)
                 for tag, ix in (("auto", idx), ("off", idx_off))]
        runs: dict[str, list[float]] = {}
        for _ in range(3):  # interleaved passes; median rejects noise
            for docs, tag, ix in cells:
                runs.setdefault(f"judge_{docs}docs_{tag}_sec", []) \
                    .append(timed(ix.judge(doc_frame(0, docs))))
        out.update({k: round(statistics.median(v), 2)
                    for k, v in runs.items()})
        out["judge_big_fallback_sec"] = out[f"judge_{big}docs_auto_sec"]
        # the over-bound guard in isolation: two map-side counts of
        # the big batch's probe/segment frames
        from iceberg_core_spark.functions.fuzzy import (
            _prep, _probes, _segments, _check_params,
        )

        bb = _prep(doc_frame(0, big), "doc_id", "text")
        min_len = _check_params(idx.max_dist, idx.q)
        t0 = time.perf_counter()
        _probes(bb, idx.max_dist, min_len).count()
        _segments(bb.filter("__len >= %d" % min_len),
                  idx.max_dist).count()
        out["guard_counts_sec"] = round(time.perf_counter() - t0, 2)
        # the bare scan: everything a pruning scheme could ever save
        out["bare_scan_sec"] = timed(
            idx._read("segs").unionByName(
                idx._read("sprobe"), allowMissingColumns=True))
        out["scan_share_of_fallback"] = round(
            out["bare_scan_sec"] / out["judge_big_fallback_sec"], 3)
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
