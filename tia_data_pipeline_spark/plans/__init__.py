"""The declared-query contract (SURVEY.md §2.6).

Importing this package populates the registry in
:mod:`tia_data_pipeline_spark.plans.contract`.
"""

from tia_data_pipeline_spark.plans import analytics, compat, llm, relational, windows  # noqa: F401
from tia_data_pipeline_spark.plans.contract import REGISTRY, oracle_sql, queries

__all__ = ["REGISTRY", "queries", "oracle_sql"]
