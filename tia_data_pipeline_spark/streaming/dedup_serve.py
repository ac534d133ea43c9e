"""Streaming incremental fuzzy dedup — the serving loop over the
persisted MinHash signature index.

The batch operator (:func:`…operators.dedup.minhash_dedup_incremental`)
dedupes ONE shard; this runs the production loop: documents arrive as a
stream, every micro-batch probes the index for near-duplicates of what
it carries, emits the pairs, and (optionally) appends its own
signatures so later batches dedupe against it — the streaming form of
``comments_pipeline.py:33``'s daily-increment semantics, like
streaming/windows.py is for inc-window.

Exactly-once contents under Structured Streaming's at-least-once
``foreachBatch`` replay:

* pair output: each batch OVERWRITES its own ``batch_id=N`` parquet
  subdirectory — a replayed batch rewrites identical content instead
  of appending duplicates;
* index update: :func:`_append_delta` anti-joins already-indexed ids
  over the pruned scan (twice ≡ once, tested batch-side), so a replay
  adds nothing.

Inside one batch the banded signature frame is persisted ONCE and
shared by the probe and the append (the signature aggregate is the
CPU-heavy leg — computing it twice per batch would double the
steady-state cost), with the cache released on every exit path: a
foreachBatch loop that leaks one cache per trigger runs its executors
out of storage memory by the hundredth batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from tia_data_pipeline_spark.operators.dedup import (
    _append_delta,
    _band_shard,
    _probe_pairs,
    minhash_band_frame,
    minhash_index_meta,
)


def dedup_increment_batch(
    batch_docs: DataFrame,
    index_path: str,
    pairs_out: str,
    batch_id: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_bucket: int = 1000,
    update_index: bool = True,
) -> None:
    """One micro-batch of the serving loop: probe → write pairs to
    ``pairs_out/batch_id=N`` (overwrite: replay-idempotent) → append
    the batch's own signatures (idempotent). Callable directly for a
    scheduled daily job; :func:`stream_dedup_incremental` wires it to
    ``foreachBatch``."""
    spark = batch_docs.sparkSession
    meta = minhash_index_meta(spark, index_path)
    banded = (
        minhash_band_frame(
            batch_docs, text_col, id_col,
            k=meta["k"], bands=meta["bands"], seed=meta["seed"],
            shingle_n=meta["shingle_n"], portable=meta["portable"],
        )
        .withColumn("bshard", _band_shard(meta["n_shards"]))
        .persist()
    )
    try:
        pairs = _probe_pairs(
            banded, spark, index_path, meta,
            threshold=threshold, max_bucket=max_bucket,
        )
        pairs.write.mode("overwrite").parquet(f"{pairs_out}/batch_id={batch_id}")
        if update_index:
            # AFTER the probe is written: appending first would make the
            # batch's own docs index-visible to its own probe and turn
            # every doc into a (doc, itself)-adjacent storm of
            # intra-batch pairs on replay ordering. Probe-then-append
            # also makes intra-batch duplicates surface exactly once —
            # in the NEXT batch that touches the bucket, not twice.
            _append_delta(banded, spark, index_path, meta)
    finally:
        banded.unpersist()


def stream_dedup_incremental(
    doc_stream: DataFrame,
    *,
    index_path: str,
    pairs_out: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_bucket: int = 1000,
    update_index: bool = True,
    available_now: bool = True,
) -> StreamingQuery:
    """Run a document stream through the incremental dedup loop.

    ``available_now=True`` drains what exists and stops (the scheduled
    daily-shard mode, same trigger discipline as
    streaming/sinks.py::stream_upsert_jdbc); ``False`` runs
    continuously. The index must already exist
    (:func:`…operators.dedup.minhash_write_index` — day-zero bootstrap
    may write an EMPTY corpus; the meta table keeps it probeable)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        dedup_increment_batch(
            batch_df, index_path, pairs_out, batch_id,
            text_col=text_col, id_col=id_col,
            threshold=threshold, max_bucket=max_bucket,
            update_index=update_index,
        )

    writer = doc_stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
