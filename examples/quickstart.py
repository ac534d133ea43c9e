#!/usr/bin/env python
"""Quickstart: the engine's main surfaces in one runnable script.

    python examples/quickstart.py [sf_dir]

Loads the corpus, runs the flagship relational query, a dedup sweep,
an embedding search, and the daily-window rollup — printing a few rows
of each.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from tia_data_pipeline_spark import get_spark
from tia_data_pipeline_spark.catalog import load_table
from tia_data_pipeline_spark.operators.dedup import exact_dedup, minhash_near_duplicates
from tia_data_pipeline_spark.operators.similarity import brute_force_top_k
from tia_data_pipeline_spark.operators.windows import daily_window, sessionize
from tia_data_pipeline_spark.plans import REGISTRY


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="quickstart")

    print("== flagship: revenue by market segment ==")
    REGISTRY["q_revenue_by_segment"].build(spark, sf_dir).show()

    print("== exact dedup survivors (first 5) ==")
    docs = load_table(spark, sf_dir, "documents")
    exact_dedup(docs, "text", "doc_id").orderBy("doc_id").show(5, truncate=40)

    print("== MinHash near-duplicate pairs (first 5) ==")
    minhash_near_duplicates(docs, "text", "doc_id", threshold=0.5).orderBy(
        "id_a", "id_b"
    ).show(5)

    print("== top-5 cosine neighbors of vec 0 ==")
    emb = load_table(spark, sf_dir, "embeddings")
    brute_force_top_k(
        emb.filter(F.col("vec_id") != 0), emb.filter(F.col("vec_id") == 0), k=5
    ).show()

    print("== daily event rollup (first 5 days) ==")
    daily_window(load_table(spark, sf_dir, "events")).orderBy("day").show(5)

    print("== sessions per user (first 5) ==")
    sessionize(load_table(spark, sf_dir, "events")).orderBy(
        "user_id", "session_id"
    ).show(5)

    print("== batch k-NN join: top-3 neighbors for 3 probes ==")
    from tia_data_pipeline_spark.operators.similarity import knn_join

    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    knn_join(emb, probes, k=3).orderBy("probe_id", "rank").show(9)

    print("== near-dup clusters -> one survivor per component ==")
    from tia_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs
    from tia_data_pipeline_spark.operators.graph import dedup_components

    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.4)
    dedup_components(pairs, docs).filter(~F.col("is_kept")).orderBy("doc_id").show(5)

    print("== Gopher quality gate (kept / dropped counts) ==")
    from tia_data_pipeline_spark.functions.text import gopher_rules

    _, keep = gopher_rules(F.col("text"))
    docs.select(keep.alias("keep")).groupBy("keep").count().show()


if __name__ == "__main__":
    main()
