#!/usr/bin/env python
"""Interleaved A/B harness for plan-shape trades (VERDICT r11 #5/#6:
re-measure the q_dedup_batch digest form and the q_topk_per_group
fan_out trade under the post-writer-fix regime — the r4/r8 numbers
predate `spark.shuffle.sort.bypassMergeThreshold=0` and are stale).

Each variant is a named builder; rounds alternate A,B,A,B,… in the
same session/window (shared-host noise hits both sides), each round
re-building the plan and timing ONE noop materialization after a
per-variant warm-up run. Reports per-variant min/median over rounds.

Usage: python scripts/ab_compare.py <case> [--rounds 5]
Cases: dedup_batch, topk_per_group
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


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def case_dedup_batch(spark):
    from pyspark.sql import functions as F

    from tia_data_pipeline_spark.catalog import load_table

    def current(spark):
        li = load_table(spark, SF_DIR, "lineitem")
        return li.unionAll(li).dropDuplicates()

    def digest(spark):
        # the r8 alternative: group by a 128-bit whole-row digest,
        # survivors via per-column first()
        li = load_table(spark, SF_DIR, "lineitem")
        u = li.unionAll(li)
        cols = u.columns
        key = F.md5(F.to_json(F.struct(*cols)))
        return (
            u.withColumn("_d", key)
            .groupBy("_d")
            .agg(*[F.first(c).alias(c) for c in cols])
            .drop("_d")
            .select(*cols)
        )

    return {"dropDuplicates": current, "digest_first": digest}


def case_topk_per_group(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tia_data_pipeline_spark.catalog import load_table
    from tia_data_pipeline_spark.operators.scale import fan_out

    cols = [
        "l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber",
        "l_extendedprice",
    ]
    w = Window.partitionBy("l_returnflag", "l_linestatus").orderBy(
        F.col("l_extendedprice").desc_nulls_last(),
        F.col("l_orderkey").asc_nulls_last(),
        F.col("l_linenumber").asc_nulls_last(),
    )

    def topk(df):
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select(*cols)
        )

    def fanned(spark):
        return topk(fan_out(load_table(spark, SF_DIR, "lineitem").select(*cols)))

    def plain(spark):
        return topk(load_table(spark, SF_DIR, "lineitem").select(*cols))

    return {"fan_out": fanned, "no_fan_out": plain}


CASES = {"dedup_batch": case_dedup_batch, "topk_per_group": case_topk_per_group}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("case", choices=sorted(CASES))
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    from tia_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"ab_{args.case}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    variants = CASES[args.case](spark)

    times: dict[str, list[float]] = {n: [] for n in variants}
    load0 = os.getloadavg()
    for rnd in range(args.rounds):
        for name, build in variants.items():
            spark.catalog.clearCache()
            df = build(spark)
            if rnd == 0:
                _noop(df)  # warm-up: JIT + footer cache
            times[name].append(_noop(df))
    print(
        json.dumps(
            {
                "case": args.case,
                "rounds": args.rounds,
                "min": {n: round(min(t), 3) for n, t in times.items()},
                "median": {n: round(statistics.median(t), 3) for n, t in times.items()},
                "all": {n: [round(x, 3) for x in t] for n, t in times.items()},
                "host_load": [round(x, 2) for x in (*load0, *os.getloadavg())],
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
