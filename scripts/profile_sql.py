#!/usr/bin/env python
"""Operator-level metrics of one contract query's steady-state run.

Like profile_stages.py but reads the SQL tab REST endpoint: prints the
final (AQE) plan graph of the LAST timed execution with per-node
metrics — where codegen time, rows, and spill actually land.

Usage:  python scripts/profile_sql.py q_pagerank [--sf-dir ...]
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
    args = ap.parse_args()

    from tia_data_pipeline_spark import plans
    from tia_data_pipeline_spark.plans.contract import TEMP_DERIVATION_DIRS
    from tia_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="profile_sql")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    q = plans.REGISTRY[args.query]
    mark = len(TEMP_DERIVATION_DIRS)
    try:
        spark.catalog.clearCache()
        df = q.build(spark, args.sf_dir)
        if len(TEMP_DERIVATION_DIRS) > mark:
            os.sync()
        df.write.format("noop").mode("overwrite").save()  # warm-up
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        timed = time.monotonic() - t0

        base = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[1]}/api/v1"
        app_id = sc.applicationId
        with urllib.request.urlopen(
            f"{base}/applications/{app_id}/sql?details=true&planDescription=false&length=200"
        ) as r:
            execs = json.load(r)
        last = max(execs, key=lambda e: e["id"])
        print(json.dumps({"query": args.query, "timed": round(timed, 3), "sql_id": last["id"], "duration_ms": last.get("duration")}))
        for n in last.get("nodes", []):
            mets = {m["name"]: m["value"] for m in n.get("metrics", [])}
            keep = {
                k: v
                for k, v in mets.items()
                if any(
                    s in k
                    for s in (
                        "time total",
                        "number of output rows",
                        "build time",
                        "collect time",
                        "shuffle bytes written",
                        "fetch wait time",
                        "time in aggregation",
                        "spill size",
                        "scan time",
                    )
                )
            }
            if keep:
                print(f"  [{n['nodeId']:>3}] {n['nodeName'][:60]}: {keep}")
    finally:
        for d in TEMP_DERIVATION_DIRS[mark:]:
            shutil.rmtree(d, ignore_errors=True)
        del TEMP_DERIVATION_DIRS[mark:]


if __name__ == "__main__":
    main()
