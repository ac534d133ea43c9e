"""Custom stateful streaming operator via ``applyInPandasWithState``.

Where the built-in windowed aggregates can't express the semantics
(cross-batch running state per key with custom transition logic), the
engine drops to Spark's arbitrary-state API: one Arrow-batched Python
transition function per key group, state persisted in the state store
between micro-batches and evicted by timeout.

Demo operator: per-user *running profile* — cumulative event count,
cumulative value in exact cents, and last-seen timestamp — emitted
once per micro-batch per active user (the reference's `comments_count`
denormalization, maintained incrementally instead of recomputed).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_cents bigint, last_seen timestamp"
)
STATE_SCHEMA = "n_events bigint, total_cents bigint, last_seen timestamp"


def _update_user_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Transition function: fold this micro-batch's events for one user
    into (n_events, total_cents, last_seen)."""
    (user_id,) = key
    if state.exists:
        n_events, total_cents, last_seen = state.get
    else:
        n_events, total_cents, last_seen = 0, 0, None

    for pdf in pdfs:
        n_events += len(pdf)
        # exact integer cents, same arithmetic as functions.text.money_sum
        # — and the same NULL semantics: F.sum skips NULLs, so the fold
        # drops NaN before the int cast (astype('int64') on a NaN would
        # kill the whole streaming query on one NULL value)
        vals = (pdf["value"].dropna() * 100).round()
        total_cents += int(vals.astype("int64").sum()) if len(vals) else 0
        ts_vals = pdf["ts"].dropna()
        if len(ts_vals):
            batch_max = ts_vals.max()
            last_seen = batch_max if last_seen is None else max(last_seen, batch_max)

    state.update((n_events, total_cents, last_seen))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n_events],
            "total_cents": [total_cents],
            "last_seen": [last_seen],
        }
    )


def running_user_profile(events: DataFrame) -> DataFrame:
    """Streaming per-user running profile (update mode). State lives in
    the state store keyed by user_id; at scale the shuffle is one hash
    exchange on the key and state size is O(active users)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
