"""Driver contract for the spark-graft builder (PySpark target).

Delegates to the engine's declared-query registry
(``tia_data_pipeline_spark.plans``): every operator from SURVEY.md §2
registers a named ``(spark, sf_dir) -> DataFrame`` builder plus, when
SQL-expressible, the DuckDB oracle the driver compares against.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tia_data_pipeline_spark import plans

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: scan→filter→join→agg — the
    reference's whole relational surface in one plan."""
    return plans.REGISTRY["q_revenue_by_segment"].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query."""
    return plans.oracle_sql()
