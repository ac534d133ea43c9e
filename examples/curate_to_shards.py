#!/usr/bin/env python
"""End-to-end training-data curation: corpus → training shards.

    python examples/curate_to_shards.py [sf_dir] [out_dir]

The production shape of the curation tier (SURVEY §2.4): quality gate
→ exact dedup → benchmark decontamination (Bloom pre-test + exact
join) → token-budgeted shard write with manifest. Every stage is
distributed; the only driver scalars are the 1-row totals printed
below.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from tia_data_pipeline_spark import get_spark
from tia_data_pipeline_spark.catalog import load_table
from tia_data_pipeline_spark.functions.text import word_count
from tia_data_pipeline_spark.operators.dedup import exact_dedup, word_shingles
from tia_data_pipeline_spark.operators.membership import (
    bloom_build,
    bloom_params,
    bloom_prefilter,
)
from tia_data_pipeline_spark.sources.shards import write_training_shards


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="shards_")
    spark = get_spark(app_name="curate-to-shards")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n0 = docs.count()

    # 1. quality gate (cheap shape rule; swap in gopher_quality for the
    #    full rule set)
    gated = docs.withColumn("n_tok", word_count(F.col("text"))).filter(
        (F.col("n_tok") >= 5) & (F.col("n_tok") <= 5_000)
    )

    # 2. exact dedup: one survivor per content hash
    clean = gated.join(
        exact_dedup(gated, "text", "doc_id").select("doc_id"), "doc_id", "left_semi"
    )

    # 3. decontamination vs a held-out set (doc_id % 17 plays the
    #    benchmark): Bloom pre-test drops almost everything cheaply,
    #    the exact semi-join confirms the sliver.
    sh = clean.select("doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("sh"))
    bench_sh = sh.filter(F.col("doc_id") % 17 == 0).select("sh").distinct()
    m, k = bloom_params(max(1, bench_sh.count()), 0.01)
    bloom_path = f"{out_dir}/_bloom"
    bloom_build(bench_sh, "sh", m_bits=m, k_hashes=k).write.mode("overwrite").parquet(bloom_path)
    bloom = spark.read.parquet(bloom_path)
    contaminated = (
        bloom_prefilter(sh.filter(F.col("doc_id") % 17 != 0), "sh", bloom, m_bits=m, k_hashes=k)
        .join(bench_sh.withColumnRenamed("sh", "bsh"), F.col("sh") == F.col("bsh"), "left_semi")
        .select("doc_id")
        .distinct()
    )
    train = clean.filter(F.col("doc_id") % 17 != 0).join(contaminated, "doc_id", "left_anti")

    # 4. semantic dedup (SemDeDup): cluster the near-dup PAIRS into
    #    components (pairwise dropping under-collapses chains — A~B,
    #    B~C keeps both B and C) and keep the LOWEST id per component,
    #    the same survivor convention as exact_dedup. Exact dedup
    #    caught byte copies; this catches paraphrase-level redundancy.
    #    Centers are the pinned trained quantizer; production re-trains
    #    via ivf_build_index on its own corpus.
    from tia_data_pipeline_spark.functions.vectors import valid_embeddings
    from tia_data_pipeline_spark.operators.graph import connected_components
    from tia_data_pipeline_spark.operators.similarity import semantic_dedup_pairs

    n_decon = train.count()
    emb = valid_embeddings(spark, sf_dir)
    sem_pairs = semantic_dedup_pairs(emb, threshold=0.35)
    comps = connected_components(sem_pairs)
    sem_drop = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    train = train.join(sem_drop, "doc_id", "left_anti")
    n_sem = train.count()

    # 5. data selection (DSIR): keep docs whose hashed-unigram
    #    importance weight toward the lang='en' target clears a
    #    threshold — resampling-by-weight is the production form; a
    #    cutoff keeps the example deterministic.
    from tia_data_pipeline_spark.plans.curation import q_dsir_weights

    weights = q_dsir_weights(spark, sf_dir).select("doc_id", "logweight_tok")
    train = (
        train.join(weights, "doc_id", "left")
        .filter(F.coalesce(F.col("logweight_tok"), F.lit(0.0)) >= -0.5)
        .drop("logweight_tok")
    )

    # 6. shard with a token budget; the manifest is the loader's index
    manifest = write_training_shards(
        train,
        f"{out_dir}/data",
        key_col="doc_id",
        weight_col="n_tok",
        tokens_per_shard=50_000,
        order_by=["doc_id"],
    )

    n_train = train.count()
    print(
        f"corpus {n0} -> gated+deduped {clean.count()} -> decontaminated "
        f"{n_decon} -> semantic-deduped {n_sem} -> DSIR-selected {n_train}"
    )
    print(f"shards at {out_dir}/data:")
    manifest.show(truncate=False)


if __name__ == "__main__":
    main()
