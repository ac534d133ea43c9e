"""End-to-end curation pipeline: quality gate → exact dedup → Bloom
decontamination → training shards. Composes the operator tier the way
a production pipeline would — each stage's guarantee checked on the
final artifact, not just in isolation."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF
from tia_data_pipeline_spark.catalog import load_table
from tia_data_pipeline_spark.functions.text import word_count
from tia_data_pipeline_spark.operators.dedup import exact_dedup, word_shingles
from tia_data_pipeline_spark.operators.membership import (
    bloom_build,
    bloom_params,
    bloom_prefilter,
)
from tia_data_pipeline_spark.sources.shards import (
    read_shard_manifest,
    write_training_shards,
)


def test_full_curation_to_shards(spark, tmp_path):
    docs = load_table(spark, SMOKE_SF, "documents").select("doc_id", "text")

    # 1. quality gate: length bounds (the cheap Gopher-style shape rule)
    gated = docs.withColumn("n_tok", word_count(F.col("text"))).filter(
        (F.col("n_tok") >= 5) & (F.col("n_tok") <= 5_000)
    )

    # 2. exact dedup: one survivor per content hash
    survivors = gated.join(
        exact_dedup(gated, "text", "doc_id").select("doc_id"), "doc_id", "left_semi"
    )

    # 3. decontamination: drop training docs sharing any 3-gram with the
    #    "benchmark" (doc_id % 17 == 0 stands in, as in q_decontaminate).
    #    Bloom pre-test first, exact semi-join on the sliver after — the
    #    composition must equal the plain exact path.
    sh = survivors.select("doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("sh"))
    bench_sh = sh.filter(F.col("doc_id") % 17 == 0).select("sh").distinct()
    train_sh = sh.filter(F.col("doc_id") % 17 != 0)

    n_bench = bench_sh.count()
    m, k = bloom_params(max(1, n_bench), 0.01)
    bloom_path = str(tmp_path / "bloom")
    bloom_build(bench_sh, "sh", m_bits=m, k_hashes=k).write.parquet(bloom_path)
    bloom = spark.read.parquet(bloom_path)

    candidates = bloom_prefilter(train_sh, "sh", bloom, m_bits=m, k_hashes=k)
    contaminated = candidates.join(
        bench_sh.withColumnRenamed("sh", "bsh"), F.col("sh") == F.col("bsh"), "left_semi"
    ).select("doc_id").distinct()

    exact_contaminated = train_sh.join(
        bench_sh.withColumnRenamed("sh", "bsh"), F.col("sh") == F.col("bsh"), "left_semi"
    ).select("doc_id").distinct()
    assert sorted(r["doc_id"] for r in contaminated.collect()) == sorted(
        r["doc_id"] for r in exact_contaminated.collect()
    ), "bloom pre-test changed decontamination semantics"

    clean = (
        survivors.filter(F.col("doc_id") % 17 != 0)
        .join(contaminated, "doc_id", "left_anti")
    )

    # 4. shard the cleaned corpus with a token budget + manifest
    out = str(tmp_path / "shards")
    manifest = write_training_shards(
        clean, out, key_col="doc_id", weight_col="n_tok", tokens_per_shard=4_000
    )

    back = spark.read.parquet(out)
    # complete and exact: what was cleaned is what was sharded
    assert back.count() == clean.count()
    # end-state invariants carried through the whole pipeline:
    assert back.filter((F.col("n_tok") < 5) | (F.col("n_tok") > 5_000)).count() == 0
    assert (
        back.groupBy(F.sha2(F.col("text"), 256)).count().filter(F.col("count") > 1).count()
        == 0
    ), "duplicate content survived to the shards"
    leaked = (
        back.select("doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("sh"))
        .join(bench_sh.withColumnRenamed("sh", "bsh"), F.col("sh") == F.col("bsh"), "left_semi")
        .count()
    )
    assert leaked == 0, "benchmark n-gram leaked into the training shards"
    # manifest accounts for every token
    man_total = read_shard_manifest(spark, out).agg(F.sum("n_tokens")).collect()[0][0]
    assert man_total == clean.agg(F.sum("n_tok")).collect()[0][0]
