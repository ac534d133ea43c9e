"""Training-shard writer: deterministic assignment, budgeted shard
mass, faithful manifest, per-shard ordering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF
from tia_data_pipeline_spark.catalog import load_table
from tia_data_pipeline_spark.functions.text import word_count
from tia_data_pipeline_spark.sources.shards import (
    read_shard_manifest,
    shard_assignment,
    write_training_shards,
)


@pytest.fixture()
def corpus(spark):
    return load_table(spark, SMOKE_SF, "documents").select(
        "doc_id", "text", word_count(F.col("text")).alias("n_tok")
    )


def test_round_trip_complete_and_deterministic(spark, corpus, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(
        corpus, out, key_col="doc_id", weight_col="n_tok", tokens_per_shard=5_000
    )
    back = spark.read.parquet(out)
    assert back.count() == corpus.count()
    # shard is a pure function of doc_id: re-deriving it from the read-
    # back rows must agree with the directory column
    n_shards = back.agg(F.max("shard")).collect()[0][0] + 1
    mismatch = back.filter(
        F.col("shard") != shard_assignment("doc_id", n_shards)
    ).count()
    assert mismatch == 0
    # second write is byte-level deterministic in assignment
    out2 = str(tmp_path / "shards2")
    write_training_shards(
        corpus, out2, key_col="doc_id", weight_col="n_tok", tokens_per_shard=5_000
    )
    back2 = spark.read.parquet(out2)
    a = {r["doc_id"]: r["shard"] for r in back.select("doc_id", "shard").collect()}
    b = {r["doc_id"]: r["shard"] for r in back2.select("doc_id", "shard").collect()}
    assert a == b


def test_shard_mass_tracks_budget(spark, corpus, tmp_path):
    budget = 5_000
    out = str(tmp_path / "shards")
    manifest = write_training_shards(
        corpus, out, key_col="doc_id", weight_col="n_tok", tokens_per_shard=budget
    ).collect()
    total = sum(r["n_tokens"] for r in manifest)
    n_shards = len(manifest)
    import math

    assert n_shards == max(1, math.ceil(total / budget))
    # hash assignment balances in expectation; allow a generous spread
    # at this tiny scale but catch a broken (all-one-shard) layout
    assert max(r["n_tokens"] for r in manifest) < 3 * budget
    assert min(r["n_tokens"] for r in manifest) > 0


def test_manifest_matches_data(spark, corpus, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(
        corpus, out, key_col="doc_id", weight_col="n_tok", tokens_per_shard=8_000
    )
    man = {r["shard"]: r for r in read_shard_manifest(spark, out).collect()}
    back = (
        spark.read.parquet(out)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("min_key"),
            F.max("doc_id").alias("max_key"),
        )
    )
    for r in back.collect():
        m = man[r["shard"]]
        assert (m["n_rows"], m["n_tokens"], m["min_key"], m["max_key"]) == (
            r["n_rows"],
            r["n_tokens"],
            r["min_key"],
            r["max_key"],
        )


def test_order_within_shard(spark, corpus, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(
        corpus,
        out,
        key_col="doc_id",
        weight_col="n_tok",
        tokens_per_shard=10_000,
        order_by=["doc_id"],
    )
    # iterate shards that actually received rows (hash assignment does
    # not guarantee every id in [0, max] is populated)
    shards = [r["shard"] for r in read_shard_manifest(spark, out).select("shard").collect()]
    assert shards
    for shard in shards:
        ids = [
            r["doc_id"]
            for r in spark.read.parquet(f"{out}/shard={shard}").select("doc_id").collect()
        ]
        assert ids == sorted(ids), f"shard {shard} not sorted"


def test_empty_and_bad_args(spark, corpus, tmp_path):
    with pytest.raises(ValueError):
        write_training_shards(
            corpus, str(tmp_path / "x"), key_col="doc_id", weight_col="n_tok", tokens_per_shard=0
        )
    empty = corpus.filter(F.lit(False))
    man = write_training_shards(
        empty, str(tmp_path / "e"), key_col="doc_id", weight_col="n_tok", tokens_per_shard=100
    )
    assert man.count() == 0
