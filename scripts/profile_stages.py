#!/usr/bin/env python
"""Stage-level profile of one contract query's steady-state run.

Replays the bench protocol for the named query (clearCache → build →
warm-up → one timed run) with the Spark UI enabled, then reads the UI
REST API and prints every stage of the timed run sorted by duration:
stage wall time, task-time sum, shuffle read/write bytes, and the
first line of the stage's name/description — the guide §1.1 empirical
loop without a browser.

Usage:  python scripts/profile_stages.py q_ngram_jaccard [--sf-dir ...]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["SPARK_GRAFT_UI"] = "true"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    from tia_data_pipeline_spark import plans
    from tia_data_pipeline_spark.plans.contract import TEMP_DERIVATION_DIRS
    from tia_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="profile_stages")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    q = plans.REGISTRY[args.query]
    mark = len(TEMP_DERIVATION_DIRS)
    try:
        spark.catalog.clearCache()
        df = q.build(spark, args.sf_dir)
        if len(TEMP_DERIVATION_DIRS) > mark:
            os.sync()
        sc.setJobDescription(f"{args.query}: warm-up")
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        warm = time.monotonic() - t0
        best = None
        for i in range(args.runs):
            sc.setJobDescription(f"{args.query}: timed")
            marker = sc.parallelize([0], 1).count()  # job boundary marker
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            timed = time.monotonic() - t0
            best = timed if best is None else min(best, timed)
        sc.setJobDescription(None)

        base = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[1]}/api/v1"
        app_id = sc.applicationId
        with urllib.request.urlopen(f"{base}/applications/{app_id}/jobs") as r:
            jobs = json.load(r)
        # jobs newest-first; the timed window = jobs after the LAST marker job
        timed_jobs = []
        for j in jobs:
            if (j.get("description") or "").endswith("timed"):
                timed_jobs.append(j)
        stage_ids = sorted({s for j in timed_jobs for s in j["stageIds"]})
        with urllib.request.urlopen(
            f"{base}/applications/{app_id}/stages?status=complete"
        ) as r:
            stages = json.load(r)
        rows = []
        for s in stages:
            if s["stageId"] not in stage_ids:
                continue
            dur = (s.get("executorRunTime") or 0) / 1000.0
            import datetime as _dt

            def _p(ts):
                return _dt.datetime.strptime(ts[:23], "%Y-%m-%dT%H:%M:%S.%f")

            wall = (
                (_p(s["completionTime"]) - _p(s["firstTaskLaunchedTime"])).total_seconds()
                if s.get("completionTime") and s.get("firstTaskLaunchedTime")
                else None
            )
            rows.append(
                {
                    "stage": s["stageId"],
                    "attempt": s["attemptId"],
                    "wall_s": round(wall, 3) if wall is not None else None,
                    "task_time_s": round(dur, 3),
                    "tasks": s.get("numCompleteTasks"),
                    "shuf_r_mb": round((s.get("shuffleReadBytes") or 0) / 1e6, 2),
                    "shuf_w_mb": round((s.get("shuffleWriteBytes") or 0) / 1e6, 2),
                    "in_mb": round((s.get("inputBytes") or 0) / 1e6, 2),
                    "name": (s.get("name") or "").split("\n")[0][:80],
                }
            )
        rows.sort(key=lambda r: -(r["wall_s"] or 0))
        print(json.dumps({"query": args.query, "warm": round(warm, 3), "timed_min": round(best, 3), "n_timed_jobs": len(timed_jobs), "n_stages": len(rows)}))
        for r_ in rows:
            print(
                f"  s{r_['stage']:>4} wall={r_['wall_s']!s:>7} task_sum={r_['task_time_s']:>8} "
                f"tasks={r_['tasks']:>4} shufR={r_['shuf_r_mb']:>8} shufW={r_['shuf_w_mb']:>8} "
                f"in={r_['in_mb']:>8}  {r_['name']}"
            )
    finally:
        for d in TEMP_DERIVATION_DIRS[mark:]:
            shutil.rmtree(d, ignore_errors=True)
        del TEMP_DERIVATION_DIRS[mark:]


if __name__ == "__main__":
    main()
