#!/usr/bin/env python
"""Corpus health report: the round-5 statistics tier in one run.

    python examples/corpus_health.py [sf_dir]

Prints the reports a training-data pipeline publishes before mixing a
new snapshot: distribution drift (KS), unigram-mix divergence (JSD),
token-mass inequality (Gini), tokenizer fertility, the top BM25 hits
for a probe query, and the purchase-graph PageRank extremes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tia_data_pipeline_spark import get_spark
from tia_data_pipeline_spark.plans import REGISTRY


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="corpus_health")

    print("== Snapshot drift (KS over doc-length distributions) ==")
    REGISTRY["q_ks_drift"].build(spark, sf_dir).show(truncate=False)

    print("== Unigram-mix divergence + vocabulary overlap (JSD) ==")
    REGISTRY["q_jsd_mix"].build(spark, sf_dir).show(truncate=False)

    print("== Token-mass inequality per source (Gini, top 5) ==")
    REGISTRY["q_gini"].build(spark, sf_dir).orderBy("gini", ascending=False).show(5)

    print("== Tokenizer fertility per language ==")
    REGISTRY["q_tok_fertility"].build(spark, sf_dir).show()

    print("== BM25 top hits for the probe query ==")
    REGISTRY["q_bm25"].build(spark, sf_dir).show(5)

    print("== Purchase-graph PageRank extremes ==")
    pr = REGISTRY["q_pagerank"].build(spark, sf_dir)
    pr.orderBy(pr.rank_n.desc()).show(3)

    spark.stop()


if __name__ == "__main__":
    main()
