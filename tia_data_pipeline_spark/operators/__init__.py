"""Relational + LLM-pipeline operators.

Composable DataFrame→DataFrame operators. Everything is built from
declarative Spark primitives (the physical strategy — broadcast vs
sort-merge, partial aggregation, AQE skew handling — stays Catalyst's
call); Python only orchestrates plan construction.
"""

from tia_data_pipeline_spark.operators.incremental import dedup_batch, incremental_append
from tia_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash,
)
from tia_data_pipeline_spark.operators.similarity import (
    brute_force_top_k,
    lsh_top_k,
)
from tia_data_pipeline_spark.operators.windows import (
    daily_window,
    sessionize,
    sliding_window,
)

__all__ = [
    "incremental_append",
    "dedup_batch",
    "exact_dedup",
    "minhash_near_duplicates",
    "ngram_jaccard_pairs",
    "simhash",
    "brute_force_top_k",
    "lsh_top_k",
    "daily_window",
    "sessionize",
    "sliding_window",
]
