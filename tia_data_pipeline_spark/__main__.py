"""CLI: run a declared contract query by name.

    python -m tia_data_pipeline_spark list
    python -m tia_data_pipeline_spark run q_revenue_by_segment [--sf DIR] [-n 20]
    python -m tia_data_pipeline_spark explain q_join_enrich [--sf DIR]
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="tia_data_pipeline_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list declared queries")
    for name in ("run", "explain"):
        p = sub.add_parser(name)
        p.add_argument("query")
        p.add_argument("--sf", default="/root/testdata/sf0.001")
        if name == "run":
            p.add_argument("-n", type=int, default=20, help="rows to show")
    args = ap.parse_args(argv)

    from tia_data_pipeline_spark.plans import REGISTRY

    if args.cmd == "list":
        for name, q in sorted(REGISTRY.items()):
            oracle = "oracle" if q.oracle else "rows-only"
            print(f"{name:24s} [{oracle:9s}] {q.covers}")
        return 0

    if args.query not in REGISTRY:
        print(f"unknown query {args.query!r}; `list` shows all", file=sys.stderr)
        return 2

    from tia_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"cli:{args.query}")
    df = REGISTRY[args.query].build(spark, args.sf)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.n, truncate=40)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
