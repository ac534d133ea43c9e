#!/usr/bin/env python
"""Dump .explain("formatted") for named contract queries to files.

Usage:
  python scripts/dump_plans.py --out plans/r11 --suffix _before q_pagerank ...
  python scripts/dump_plans.py --out plans/r11 --suffix _before --all

Plan-only: builds each query (eager index writes included) and prints the
formatted physical plan; nothing is executed through a sink. Temp derivation
dirs are cleaned per query, mirroring bench.py's isolation."""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="contract query names (q_*)")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    from tia_data_pipeline_spark import plans
    from tia_data_pipeline_spark.plans.contract import TEMP_DERIVATION_DIRS
    from tia_data_pipeline_spark.session import get_spark

    names = sorted(plans.REGISTRY) if args.all else args.queries
    unknown = [n for n in names if n not in plans.REGISTRY]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    for name in names:
        mark = len(TEMP_DERIVATION_DIRS)
        try:
            df = plans.REGISTRY[name].build(spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.out, f"{name}{args.suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            print(f"ok {name}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — record, don't abort
            print(f"FAIL {name}: {exc}", file=sys.stderr)
        finally:
            spark.catalog.clearCache()
            for d in TEMP_DERIVATION_DIRS[mark:]:
                shutil.rmtree(d, ignore_errors=True)
            del TEMP_DERIVATION_DIRS[mark:]


if __name__ == "__main__":
    main()
