"""Drive the driver contract exactly as the grading driver does:
fresh process, bare-ish session, sf0.01, DuckDB oracle differential."""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from tests.oracle import assert_parity, create_duck_views  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    # BARE session on purpose (not get_spark): the grading driver may
    # construct its own SparkSession, so every correctness-critical
    # conf must arrive via catalog._ensure_session_confs at query
    # build time — a get_spark-pinned conf that matters would make
    # this harness pass while the real driver diverges. Only capacity
    # knobs (master/heap/shuffle width/ui) are set here.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("drive_entry")
        .master("local[8]")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    rows = entry_mod.entry(spark).collect()
    print(f"entry(): {len(rows)} rows")
    assert len(rows) >= 1

    con = duckdb.connect()
    create_duck_views(con, SF_DIR)

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    print(f"queries: {len(qs)}, oracles: {len(oracles)}")
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            if name in oracles:
                assert_parity(df, con.sql(oracles[name]), name)
                status = "OK"
            else:
                # collect(), NOT count(): count() column-prunes every
                # computed projection, so a per-row ANSI fault (divide
                # by zero, cast overflow, NaN->BIGINT) in an output
                # column would never execute here yet abort in the
                # driver when it materializes values.
                n = len(df.collect())
                status = f"OK(rows-only n={n})"
        except Exception as exc:  # noqa: BLE001
            status = f"FAIL: {exc}"
            failures.append(name)
            traceback.print_exc()
        print(f"  {name}: {status} [{time.time() - t0:.1f}s]")

    print("RESULT:", "ALL-OK" if not failures else f"FAILURES: {failures}")
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
