"""Training-shard writer: token-budgeted, deterministic, manifested.

The last step of a curation pipeline (SURVEY §2.4 north-star tier) is
materializing the cleaned corpus as SHARDS a training loader can
stream: each shard holds roughly ``tokens_per_shard`` tokens, the
assignment is a pure function of the row key (stable under retries and
repartitioning within Spark; the hash is xxhash64, so NOT reproducible
from another engine — see :func:`shard_assignment`), and a manifest
records per-shard
row/token counts so the loader can plan epochs without scanning data.

Scale design (the q_pack_sequences argument, applied to the sink):

- NO global running total. The naive packer assigns shard = floor(
  cumulative_tokens / budget) over a single sorted partition — a
  one-task straggler at any scale. Here the shard id is a hash of the
  row key modulo the shard count, so assignment is embarrassingly
  parallel and each shard's expected token mass is total/n (law of
  large numbers over many small docs; the manifest REPORTS the actual
  per-shard mass so downstream can verify the spread).
- ONE driver-side scalar: the corpus token total that sizes the shard
  count (a 1-row aggregate, same class as the catalog's sink probe).
  Everything else is distributed.
- One keyed exchange: rows shuffle on the shard id so each shard
  writes as one task's contiguous output (``partitionBy`` then lays
  each shard in its own directory). An optional ``order_by`` sorts
  WITHIN each shard partition — per-shard locality for the loader,
  never a global sort.
- Re-reading ``path`` restores the shard id from the directory column;
  the manifest parquet at ``<path>/_shard_manifest`` joins on it.

Reference scope note: the reference stages page-sized JSON files with
no size governance (posts_pipeline.py:33-38); this sink is the
engine-tier replacement for corpus-scale output.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["shard_assignment", "write_training_shards", "read_shard_manifest"]

_SHARD_SEED = 42


def shard_assignment(key_col: str, n_shards: int) -> Column:
    """Deterministic shard id in [0, n_shards): xxhash64 of the row key
    (fixed seed) taken mod the shard count. A pure function of the key
    — identical across runs, executors, and retries; unrelated to the
    md5-digit constructions reserved for oracle-checked paths (a sink
    has no cross-engine oracle, so the cheaper JVM hash is the right
    tool)."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    return F.pmod(F.xxhash64(F.col(key_col), F.lit(_SHARD_SEED)), F.lit(n_shards)).cast("int")


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    key_col: str,
    weight_col: str,
    tokens_per_shard: int,
    order_by: list[str] | None = None,
    data_format: str = "parquet",
) -> DataFrame:
    """Write ``df`` as token-budgeted training shards under ``path``
    and a per-shard manifest under ``<path>/_shard_manifest``; returns
    the manifest DataFrame (shard, n_rows, n_tokens, min_key, max_key).

    ``weight_col`` is the per-row token count (see
    ``functions.text.word_count`` or a tokenizer column); the shard
    count is ``ceil(sum(weight) / tokens_per_shard)`` so every shard
    carries ~``tokens_per_shard`` tokens in expectation.
    """
    if tokens_per_shard < 1:
        raise ValueError("tokens_per_shard must be >= 1")
    if "shard" in df.columns:
        raise ValueError(
            "df already has a 'shard' column; rename it — the writer owns "
            "that name for the partition directory"
        )
    total = df.agg(F.sum(F.col(weight_col)).alias("t")).collect()[0]["t"] or 0
    n_shards = max(1, math.ceil(total / tokens_per_shard))

    sharded = df.withColumn("shard", shard_assignment(key_col, n_shards))
    # One task per shard directory: shuffle on the shard id itself.
    # (Hash collisions between shard ids in the same task are fine —
    # partitionBy still splits them into their own directories.)
    laid_out = sharded.repartition(n_shards, "shard")
    if order_by:
        laid_out = laid_out.sortWithinPartitions("shard", *order_by)
    (
        laid_out.write.mode("overwrite")
        .partitionBy("shard")
        .format(data_format)
        .save(path)
    )

    # The manifest aggregates the JUST-WRITTEN output, not the input
    # lineage: df may be the tail of an expensive curation pipeline,
    # and re-executing it for the stats would be a third full upstream
    # run (total-agg + write are already two). Reading the laid-out
    # shards back is a cheap scan of exactly what the manifest
    # describes — and doubles as a write-visibility check.
    # explicit schema: partition discovery on an empty output (zero
    # rows written) has nothing to infer from, and the shard column
    # type stays the writer's int regardless of directory inference
    back = df.sparkSession.read.format(data_format).schema(sharded.schema).load(path)
    manifest = (
        back.groupBy(F.col("shard").cast("int").alias("shard"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.col(weight_col)).cast("bigint").alias("n_tokens"),
            F.min(F.col(key_col)).alias("min_key"),
            F.max(F.col(key_col)).alias("max_key"),
        )
        .orderBy("shard")
    )
    manifest.write.mode("overwrite").parquet(f"{path}/_shard_manifest")
    return manifest


def read_shard_manifest(spark, path: str) -> DataFrame:
    """The manifest previously written by :func:`write_training_shards`."""
    return spark.read.parquet(f"{path}/_shard_manifest")
