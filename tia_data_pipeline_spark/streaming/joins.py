"""Watermarked stream-stream joins.

The reference joins comments to their parent posts with a batch window
query (``comments_pipeline.py:27-37``); the fully-streaming form of
that shape is a STREAM-STREAM join — e.g. attributing each purchase
event to the preceding view by the same user (click attribution), or
pairing child records with parents as both arrive.

Spark requirements, encoded here rather than left to the caller:
watermarks on BOTH sides plus a time-range join predicate, so the
engine can bound the join state (each side buffers only rows younger
than watermark + interval; without the range predicate state grows
forever). The batch twin :func:`interval_join_batch` is the
oracle-checked semantics — tests assert stream ≡ batch on identical
input split across micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prefixed(df: DataFrame, prefix: str, key_col: str, ts_col: str) -> DataFrame:
    renamed = df
    for c in df.columns:
        renamed = renamed.withColumnRenamed(c, f"{prefix}{c}")
    return renamed.withColumnRenamed(f"{prefix}{key_col}", f"{prefix}_key").withColumnRenamed(
        f"{prefix}{ts_col}", f"{prefix}_ts"
    )


def interval_join_batch(
    left: DataFrame,
    right: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    within: str = "1 hour",
) -> DataFrame:
    """Batch semantics: each RIGHT row pairs with every LEFT row of the
    same key whose timestamp lies in ``(right_ts - within, right_ts]``
    — 'the views that led to this purchase'. Column names come back
    prefixed ``l_`` / ``r_`` (keys as ``l__key``/``r__key``) so the two
    sides' identical schemas never collide."""
    l = _prefixed(left, "l_", key_col, ts_col)
    r = _prefixed(right, "r_", key_col, ts_col)
    return l.join(r, _interval_cond(within))


def _interval_cond(within: str):
    """ONE statement of the key + time-range predicate — the batch and
    streaming twins must never drift (their equivalence IS the module's
    contract)."""
    return (
        (F.col("l__key") == F.col("r__key"))
        & (F.col("l__ts") <= F.col("r__ts"))
        & (F.col("l__ts") > F.col("r__ts") - F.expr(f"INTERVAL {within}"))
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming form of :func:`interval_join_batch`: both sides
    watermarked, same key + time-range predicate. The range bound lets
    Spark evict join state (a side buffers rows only until the other
    side's watermark passes their interval); joined rows emit as both
    sides arrive, across micro-batches. Inner join: a right row whose
    left partner never arrives (or arrives beyond the watermark) emits
    nothing, exactly like the batch twin on the delivered data."""
    l = _prefixed(left, "l_", key_col, ts_col).withWatermark("l__ts", watermark)
    r = _prefixed(right, "r_", key_col, ts_col).withWatermark("r__ts", watermark)
    return l.join(r, _interval_cond(within))
