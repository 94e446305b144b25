#!/usr/bin/env python
"""Profile one or more headline queries with per-stage/task metrics.

Runs each named query against the bench prep layout (same as bench.py)
with the Spark UI enabled, executes ONE warm pass after a cold pass,
and dumps, per query:
  - wall time (cold, warm)
  - per-job/stage breakdown from the status tracker (task time,
    shuffle read/write bytes, input bytes) for the WARM run
  - the SQL-tab operator metrics (from the UI REST endpoint) so
    exchange/scan/agg costs are attributable.

Usage: python scripts/profile_query_r15.py q1[,q2,...] [--sql]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _prep_layout  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    want_sql = "--sql" in sys.argv

    from iceberg_core_spark import get_spark
    from iceberg_core_spark.registry import all_queries

    spark = get_spark("profile-r15", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.retainedJobs": "2000",
        "spark.ui.retainedStages": "2000",
        "spark.sql.ui.retainedExecutions": "200",
    })
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    queries = all_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_dir, _ = _prep_layout(spark, sf_dir)

    ui = sc.uiWebUrl
    app_id = sc.applicationId

    def run(name: str, fn) -> None:
        # cold
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        # warm, bracketed by job ids
        tracker = sc.statusTracker()
        before_jobs = set(tracker.getJobIdsForGroup() or [])
        sc.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm = time.perf_counter() - t0
        sc.setJobDescription(None)
        after_jobs = set(tracker.getJobIdsForGroup() or [])
        print(f"\n=== {name}: cold {cold:.2f}s warm {warm:.2f}s ===")
        jobs = sorted(after_jobs - before_jobs)
        stage_rows = []
        seen = set()
        for jid in jobs:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                if sid in seen:
                    continue
                seen.add(sid)
                try:
                    with urllib.request.urlopen(
                            f"{ui}/api/v1/applications/{app_id}/stages/{sid}",
                            timeout=5) as r:
                        data = json.load(r)
                except Exception:
                    continue
                for att in data:
                    stage_rows.append((
                        sid,
                        att.get("status"),
                        att.get("numCompleteTasks", 0),
                        att.get("executorRunTime", 0) / 1000.0,
                        att.get("inputBytes", 0) / 1e6,
                        att.get("shuffleReadBytes", 0) / 1e6,
                        att.get("shuffleWriteBytes", 0) / 1e6,
                        (att.get("name") or "")[:80],
                    ))
        stage_rows.sort(key=lambda r: -r[3])
        print(" stage  status    tasks  runT(s)  in(MB)  shR(MB)  shW(MB)  name")
        for r in stage_rows[:25]:
            print(f" {r[0]:>5}  {r[1]:<8} {r[2]:>5}  {r[3]:7.2f} "
                  f"{r[4]:7.1f} {r[5]:8.2f} {r[6]:8.2f}  {r[7]}")
        total_rt = sum(r[3] for r in stage_rows)
        print(f" total executorRunTime {total_rt:.2f}s across "
              f"{len(stage_rows)} stages ({len(jobs)} jobs)")
        if want_sql:
            try:
                with urllib.request.urlopen(
                        f"{ui}/api/v1/applications/{app_id}/sql"
                        "?details=true&length=5", timeout=5) as r:
                    execs = json.load(r)
                ex = execs[0] if execs else {}
                for node in ex.get("nodes", [])[:40]:
                    mets = {m["name"]: m["value"]
                            for m in node.get("metrics", [])}
                    keep = {k: v for k, v in mets.items()
                            if any(s in k for s in (
                                "time", "rows", "size", "spill"))}
                    print(f"  [{node.get('nodeId')}] "
                          f"{node.get('nodeName')}: {keep}")
            except Exception as e:
                print(f"  (sql metrics unavailable: {e})")

    for n in names:
        run(n, queries[n][0])


if __name__ == "__main__":
    main()
