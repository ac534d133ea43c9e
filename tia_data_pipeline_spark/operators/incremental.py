"""Idempotent incremental-load operators.

The reference achieves idempotency with per-row
``INSERT … ON CONFLICT ON CONSTRAINT <pk> DO NOTHING``
(``posts_pipeline.py:53-59``, ``comments_pipeline.py:98-104``) —
Postgres's PK index does the dedup. The engine form is declarative:
within-batch key-dedup plus a left-anti join against the target's key
set, then a plain append. Running a batch twice is a no-op (property
tested in ``tests/test_incremental.py``).

Scale notes: the anti-join shuffles only the key columns of the
existing side (project before join); when the incoming batch is small
relative to the target (the common ingest shape) AQE broadcasts the
*incoming* side. At 100 TB the existing-side key scan is pruned by
partition predicates (pass ``existing`` pre-filtered to the affected
partitions, as the reference prunes to 'yesterday').
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_batch(batch: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Within-batch key dedup (SURVEY op ``dedup-batch``): set semantics
    on the PK, collapsing refetch overlap. Arbitrary-but-deterministic
    survivor is fine for the reference semantic (duplicate rows are
    identical re-fetches)."""
    return batch.dropDuplicates(list(keys))


def incremental_append(
    incoming: DataFrame, existing: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Rows of ``incoming`` whose key is absent from ``existing`` —
    the `ON CONFLICT DO NOTHING` invariant (SURVEY op ``antijoin-incr``).

    Only the key columns of ``existing`` participate (column pruning →
    the target scan reads just the PK), and the anti-join is null-safe
    on composite keys.
    """
    keys = list(keys)
    new_rows = dedup_batch(incoming, keys)
    existing_keys = existing.select(*keys)
    return new_rows.join(existing_keys, on=keys, how="left_anti")


def merge_upsert_plan(
    incoming: DataFrame, existing: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Full-table merge: latest incoming row wins per key, existing rows
    without a replacement survive. The transactional form would be Delta
    ``MERGE WHEN NOT MATCHED THEN INSERT``; this is the pure-DataFrame
    plan (recompute target) for stores without ACID merge."""
    keys = list(keys)
    replaced = existing.join(incoming.select(*keys), on=keys, how="left_anti")
    return replaced.unionByName(dedup_batch(incoming, keys))
