#!/usr/bin/env python
"""Interleaved A/B of `spark.sql.join.preferSortMergeJoin` (guide §3.1:
allow shuffled hash join when its size conditions are met — skips both
sort legs) plus AQE's runtime SMJ→SHJ rewrite
(`spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold`) across a
join-heavy sample of contract queries. Both are session-level runtime
confs, so one session toggles per round and shared-host noise hits
both variants.

Usage: python scripts/ab_shj.py [--rounds 4]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = [
    "q_join_enrich", "q_range_join", "q_star_join", "q_cohort_retention",
    "q_children_rollup", "q_revenue_by_segment", "q_self_join",
    "q_thread_closure", "q_knn_join", "q_funnel",
]

VARIANTS = {
    "smj_default": {
        "spark.sql.join.preferSortMergeJoin": "true",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0",
    },
    "shj_allowed": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "67108864",
    },
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    import bench
    from tia_data_pipeline_spark import plans
    from tia_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ab_shj")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    totals: dict[str, list[float]] = {n: [] for n in VARIANTS}
    per_q: dict[str, dict[str, list[float]]] = {
        n: {q: [] for q in QUERIES} for n in VARIANTS
    }
    load0 = os.getloadavg()
    for rnd in range(args.rounds):
        for vname, confs in VARIANTS.items():
            for k, v in confs.items():
                spark.conf.set(k, v)
            t_total = 0.0
            for q in QUERIES:
                spark.catalog.clearCache()
                df = plans.REGISTRY[q].build(spark, SF_DIR)
                if rnd == 0:
                    bench.run_once(df)  # warm-up
                t = bench.run_once(df)
                per_q[vname][q].append(t)
                t_total += t
            totals[vname].append(round(t_total, 3))
    print(
        json.dumps(
            {
                "totals": totals,
                "total_min": {n: min(t) for n, t in totals.items()},
                "total_median": {
                    n: round(statistics.median(t), 3) for n, t in totals.items()
                },
                "per_query_min": {
                    n: {q: round(min(t), 3) for q, t in qs.items()}
                    for n, qs in per_q.items()
                },
                "host_load": [round(x, 2) for x in (*load0, *os.getloadavg())],
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
