"""Persisted inverted text index — lexical retrieval's analogue of the
IVF embedding index (``operators/similarity.py``): build once, serve
many queries from partition-pruned scans.

Layout under ``path``:

- **postings** (the main table): one row per (term, doc) with the term
  frequency, written with a WRITE-TIME PARTITION COLUMN ``_bucket =
  pmod(xxhash64(term), n_buckets)`` — a query's terms hash to a handful
  of buckets, the ``_bucket IN (...)`` predicate becomes a partition
  filter, and the serve scan opens only those buckets' files
  (plan-pinned in tests/test_text_index.py). Per-term document
  frequency is denormalized onto every posting at build time so serving
  needs no second aggregate over the index.
- ``_doc_stats``: (doc_id, dl) — per-document token length for the
  BM25 length normalizer.
- ``_corpus_stats``: one row (n_docs, total_tokens, n_buckets) — the
  scalars plus the bucket modulus, so serving can never hash terms
  with a different modulus than the build.

Scoring is the q_bm25 arithmetic verbatim (``plans/llm.py``): idf as
differences of integer-argument logs, tf saturation with cleared
denominators, per-term scores integered to nano-units before the
per-doc sum — so serving from the index reproduces the full-scan query
bit-for-bit (equivalence-tested).

Scale: the build is explode → one (term, doc) aggregate → one (term)
window for df (both on the same shuffle key family) → partitioned
write. Serving scans |query-bucket| / n_buckets of the postings before
any row work, joins doc lengths only for candidate docs, and top-k is
a TakeOrderedAndProject.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tia_data_pipeline_spark.functions import text as TX
from tia_data_pipeline_spark.functions.text import portable_round

_INDEX_SEED = 0x1DE7


def build_text_index(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
) -> None:
    """Write the inverted index for ``docs`` under ``path``."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    toks = base.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").cast("bigint").alias("tf"))
    # df rides on the same rows via a (tok) window — serving never
    # re-aggregates the index
    df_w = Window.partitionBy("tok")
    postings = tf.select(
        "tok",
        "doc_id",
        "tf",
        F.count("*").over(df_w).cast("bigint").alias("df"),
        F.pmod(F.xxhash64(F.col("tok"), F.lit(_INDEX_SEED)), F.lit(n_buckets))
        .cast("int")
        .alias("_bucket"),
    )
    postings.write.partitionBy("_bucket").mode("overwrite").parquet(path)

    dl = base.select("doc_id", TX.word_count(F.col("text")).alias("dl"))
    dl.write.mode("overwrite").parquet(f"{path}/_doc_stats")
    # aggregate the JUST-WRITTEN stats table, not the source lineage:
    # re-running the tokenize over the text corpus would double the
    # stats phase for identical numbers (same rule as the shard
    # writer's manifest). n_buckets persists WITH the index — a serve
    # called with a different modulus would hash terms into the wrong
    # partitions and silently return a partial top-k.
    spark = docs.sparkSession
    spark.read.parquet(f"{path}/_doc_stats").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_tokens"),
        F.lit(n_buckets).cast("int").alias("n_buckets"),
        # postings schema persists with the index (the persisted-index
        # rule): an EMPTY corpus writes no postings files, and serving
        # must still read the dir (zero hits) instead of failing
        # schema inference
        F.lit(postings.schema.json()).alias("postings_schema"),
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_corpus_stats")


def bm25_search_indexed(
    spark: SparkSession,
    path: str,
    terms: list[str],
    *,
    k: int = 10,
) -> DataFrame:
    """Serve a BM25 top-k from the written index: the query terms'
    buckets are computed DRIVER-SIDE (a few xxhash64 calls via one tiny
    local expression — control plane), the postings scan carries both a
    ``_bucket IN`` partition filter and the ``tok IN`` row filter, and
    only candidate docs join the length table. Scores are the q_bm25
    integer arithmetic, so the result equals the full-scan query."""
    if not terms:
        raise ValueError("terms must be non-empty")
    # the bucket modulus and postings schema come from the index
    # itself (one 1-row read)
    stats_row = spark.read.parquet(f"{path}/_corpus_stats").collect()[0]
    n_buckets = int(stats_row["n_buckets"])
    bucket_rows = (
        spark.range(1)
        .select(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.lit(t), F.lit(_INDEX_SEED)), F.lit(n_buckets))
                    for t in terms
                ]
            ).alias("b")
        )
        .collect()
    )
    buckets = sorted({int(x) for x in bucket_rows[0]["b"]})

    from pyspark.sql.types import StructType

    postings_schema = StructType.fromJson(json.loads(stats_row["postings_schema"]))
    postings = (
        spark.read.schema(postings_schema)
        .parquet(path)
        .filter(F.col("_bucket").isin(buckets))
        .filter(F.col("tok").isin(*terms))
    )
    dl = spark.read.parquet(f"{path}/_doc_stats")
    scal = F.broadcast(spark.read.parquet(f"{path}/_corpus_stats"))

    sc = (
        postings.join(dl, "doc_id")
        .crossJoin(scal)
        .select(
            "doc_id",
            TX.nano_int(
                (
                    F.log(2 * (F.col("n_docs") - F.col("df")) + 1)
                    - F.log(2 * F.col("df") + 1)
                )
                * (
                    (22 * F.col("tf") * F.col("total_tokens"))
                    / (
                        10 * F.col("tf") * F.col("total_tokens")
                        + 3 * F.col("total_tokens")
                        + 9 * F.col("dl") * F.col("n_docs")
                    )
                )
            ).alias("sc_n"),
        )
    )
    agg = sc.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_terms"),
        F.sum("sc_n").cast("bigint").alias("score_n"),
    )
    # Projection/order mirror q_bm25 exactly (bit-for-bit equivalence
    # is test-pinned): the raw nano-nat score_n stays OFF the output —
    # ln() is 1-ulp divergent cross-engine — and the top-k orders on
    # the 6-dp rounded score with doc_id tiebreak.
    out = agg.select(
        "doc_id",
        "n_terms",
        portable_round(F.col("score_n") / F.lit(1_000_000_000.0), 6).alias("score"),
    )
    return out.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
