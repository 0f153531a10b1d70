"""Per-query job/stage profile via the Spark UI REST API (guide §1/§7.1).

Runs each named query solo (caches released between runs), twice —
run 1 warms codegen/broadcast paths, run 2 is the measured run — then
pulls /api/v1 job+stage metrics for the measured run and prints:

- wall seconds (run 2), number of Spark jobs, number of stages
- per-stage: duration, task count, shuffle read/write bytes, input bytes
- total scheduler overhead estimate (wall - sum of max task time per stage)

Usage:  python tools/profile_query.py [--sf DIR] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]

    from martech_pipelines_spark import caching, get_spark
    from martech_pipelines_spark.plans import QUERIES

    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    api = f"{base}/api/v1/applications/{app_id}"

    for name in args:
        fn = QUERIES[name]
        # warm run
        fn(spark, sf_dir).count()
        caching.release()
        jobs_before = {j["jobId"] for j in _get(api, "/jobs")}
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        caching.release()
        jobs = [j for j in _get(api, "/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in _get(api, f"/stages/{sid}"):
                    if att["status"] in ("COMPLETE", "FAILED"):
                        stages.append(att)
            except Exception:
                pass
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs, "
              f"{len(stages)} stages ===")
        stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        tot_run = sum(s.get("executorRunTime") or 0 for s in stages)
        print(f"  sum executorRunTime {tot_run/1000:.3f}s "
              f"(/32 cores = {tot_run/32000:.3f}s)")
        for s in stages[:14]:
            dur = (s.get("executorRunTime") or 0) / 1000
            print(
                f"  stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>3} "
                f"run={dur:7.3f}s in={s.get('inputBytes', 0):>9} "
                f"sRead={s.get('shuffleReadBytes', 0):>8} "
                f"sWrite={s.get('shuffleWriteBytes', 0):>8}  "
                f"{(s.get('name') or '')[:60]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
