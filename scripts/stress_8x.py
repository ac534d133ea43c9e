#!/usr/bin/env python
"""Standing 8× stress harness (SCALE.md methodology, VERDICT r11 #9):
materialize the sf0.1 corpus unioned with 7 id-shifted copies into a
temp sf-dir (docs 5k→40k — every near-dup cluster 8× deeper, the
adversarial direction for the shingle pair expansion), run the named
contract queries through the exact bench protocol against it, and
report per-query times PLUS the executor's peak memory and spill
totals from the SQL metrics (guide §2.5 skew / §5 spill evidence).

Usage:
  python scripts/stress_8x.py q_ngram_jaccard q_containment \
      [--tables documents] [--repeat 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
ID_COLS = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
    "lineitem": None,  # no single unique key; copies appended as-is
}


def build_8x(spark, tables: list[str]) -> str:
    """Write an 8×-duplicated sf dir: requested tables unioned with 7
    id-shifted copies (ids shifted by i*10_000_000 so entities inflate
    as DISTINCT near-dup members); all other tables symlinked."""
    from pyspark.sql import functions as F

    from tia_data_pipeline_spark.catalog import TABLES, load_table

    out = tempfile.mkdtemp(prefix="graft_8x_")
    for name in TABLES:
        src = os.path.join(SF_DIR, f"{name}.parquet")
        dst = os.path.join(out, f"{name}.parquet")
        if name not in tables:
            os.symlink(src, dst)
            continue
        df = load_table(spark, SF_DIR, name)
        idc = ID_COLS.get(name)
        parts = [df]
        for i in range(1, 8):
            c = df
            if idc is not None:
                c = c.withColumn(idc, F.col(idc) + F.lit(i * 10_000_000))
            parts.append(c)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(dst)
    return out


def _executor_peaks(spark) -> dict:
    """Driver-side status-store read: peak execution memory and spill
    accumulated across completed stages (REST-equivalent, no UI)."""
    peaks = {"peak_exec_mem_mb": 0.0, "spill_disk_mb": 0.0, "spill_mem_mb": 0.0}
    try:
        store = spark.sparkContext._jsc.sc().statusStore()
        it = store.stageList(None).iterator()
        while it.hasNext():
            s = it.next()
            peaks["spill_disk_mb"] += s.diskBytesSpilled() / 1e6
            peaks["spill_mem_mb"] += s.memoryBytesSpilled() / 1e6
            try:
                peaks["peak_exec_mem_mb"] = max(
                    peaks["peak_exec_mem_mb"], s.peakExecutionMemory() / 1e6
                )
            except Exception:  # noqa: BLE001 — field absent on some builds
                pass
    except Exception as exc:  # noqa: BLE001 — keep timings even if the
        # status-store Java surface shifts across Spark versions
        print(f"status-store peaks unavailable: {exc}", file=sys.stderr)
        return {k: -1.0 for k in peaks}
    return {k: round(v, 1) for k, v in peaks.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tables", default="documents")
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    import bench
    from tia_data_pipeline_spark import plans
    from tia_data_pipeline_spark.plans.contract import TEMP_DERIVATION_DIRS
    from tia_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="stress_8x")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sf8 = build_8x(spark, args.tables.split(","))
    try:
        for _ in range(args.repeat):
            load0 = os.getloadavg()
            results = {}
            for name in args.queries:
                mark = len(TEMP_DERIVATION_DIRS)
                before = _executor_peaks(spark)
                try:
                    results[name] = bench.bench_query(spark, plans.REGISTRY[name], sf8)
                except Exception as exc:  # noqa: BLE001
                    print(f"{name} failed: {exc}", file=sys.stderr)
                    results[name] = {"min": -1.0, "warm": -1.0, "n": 0}
                finally:
                    for d in TEMP_DERIVATION_DIRS[mark:]:
                        shutil.rmtree(d, ignore_errors=True)
                    del TEMP_DERIVATION_DIRS[mark:]
                after = _executor_peaks(spark)
                results[name]["peak_exec_mem_mb"] = after["peak_exec_mem_mb"]
                results[name]["spill_disk_mb"] = round(
                    after["spill_disk_mb"] - before["spill_disk_mb"], 1
                )
                results[name]["spill_mem_mb"] = round(
                    after["spill_mem_mb"] - before["spill_mem_mb"], 1
                )
            print(
                json.dumps(
                    {
                        "queries": results,
                        "sf_dir": sf8,
                        "host_load": [round(x, 2) for x in (*load0, *os.getloadavg())],
                    },
                    separators=(",", ":"),
                )
            )
    finally:
        shutil.rmtree(sf8, ignore_errors=True)


if __name__ == "__main__":
    main()
