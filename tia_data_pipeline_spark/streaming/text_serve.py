"""Structured Streaming form of the inverted text index (BM25)
lifecycle — the fifth persisted index family joins the streaming club
(round 10; the MinHash/SimHash/embedding probes and the IVF write side
gained their loops in rounds 8-9, and `stream_index_deletes` carries
every family's takedown stream, text included).

The loop is a `foreachBatch` over
:func:`…operators.text_index.text_index_append`, which is already the
idempotent unit the at-least-once trigger needs: membership anchors on
``_doc_stats`` (a replayed batch's docs anti-join away — twice ≡
once), and the one non-atomic window (postings committed, membership
not yet) is healed downstream — the serve's (tok, doc_id) pre-
aggregate collapses the duplicates exactly and compaction removes
them physically (ADVICE r9 #2, `operators/text_index.py`).

Cite: reference `comments_pipeline.py:22-104` (the daily-increment
ingest DAG) — here as a continuous document stream feeding a
retrieval index instead of a Postgres table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def text_index_append_batch(
    batch_docs: DataFrame,
    index_path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One micro-batch of the text-index WRITE loop: delta-sized
    idempotent append. Split out of the stream wiring (the
    dedup_serve discipline) so tests and batch backfills drive the
    exact code the stream runs."""
    from tia_data_pipeline_spark.operators.text_index import text_index_append

    text_index_append(batch_docs, index_path, id_col=id_col, text_col=text_col)


def stream_text_index_append(
    doc_stream: DataFrame,
    *,
    index_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
) -> StreamingQuery:
    """Run a document stream through the text-index append loop — the
    write-side twin of the other families' `stream_*` loops (same
    trigger discipline: ``availableNow`` drains the backlog and stops,
    the scheduled-backfill form; ``available_now=False`` runs the
    continuous service form). Serving stays
    :func:`…operators.text_index.bm25_search_indexed` over the same
    dir — df is computed at serve time, so appended documents are
    searchable with exact document frequencies the moment their batch
    commits, no repair step."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        text_index_append_batch(
            batch_df, index_path, id_col=id_col, text_col=text_col
        )

    writer = doc_stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
