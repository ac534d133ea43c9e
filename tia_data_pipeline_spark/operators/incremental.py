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


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    *,
    eff_col: str = "_eff",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type-2 merge — the KEEP-HISTORY form of
    the reference's upsert (`ON CONFLICT DO UPDATE` discards the old
    row; SCD2 closes it instead).

    ``current`` holds open versions (``valid_to`` NULL) with their
    ``valid_from``; ``updates`` holds the new snapshot with its
    effective timestamp in ``eff_col``. Semantics per key:

    - changed attrs → the open row closes (``valid_to`` = effective ts)
      AND a new open row begins;
    - unchanged attrs → the open row passes through untouched (no
      churn, the classic SCD2 no-op guard);
    - key only in updates → new open row;
    - key only in current → untouched.

    One shuffle: a single full-outer join on the keys; the three output
    legs are narrow projections of that one joined frame, unioned.
    Attr comparison is null-safe per column. At warehouse scale the
    current side is pruned to open rows before the join (pass it
    pre-filtered), and the join inherits AQE broadcast when a snapshot
    is small.
    """
    from pyspark.sql import functions as F

    keys, attrs = list(keys), list(attrs)
    if not keys or not attrs:
        raise ValueError("scd2_merge requires non-empty keys and attrs")
    cur = current.select(
        *[F.col(k).alias(f"_ck_{k}") for k in keys],
        *[F.col(a).alias(f"_ca_{a}") for a in attrs],
        F.col(valid_from).alias("_c_from"),
        F.lit(True).alias("_c_present"),
    )
    upd = updates.select(
        *[F.col(k).alias(f"_uk_{k}") for k in keys],
        *[F.col(a).alias(f"_ua_{a}") for a in attrs],
        F.col(eff_col).alias("_u_eff"),
        F.lit(True).alias("_u_present"),
    )
    cond = None
    for k in keys:
        c = F.col(f"_ck_{k}").eqNullSafe(F.col(f"_uk_{k}"))
        cond = c if cond is None else (cond & c)
    j = cur.join(upd, cond, "full_outer")

    in_cur = F.coalesce(F.col("_c_present"), F.lit(False))
    in_upd = F.coalesce(F.col("_u_present"), F.lit(False))
    changed = None
    for a in attrs:
        c = ~F.col(f"_ca_{a}").eqNullSafe(F.col(f"_ua_{a}"))
        changed = c if changed is None else (changed | c)

    def leg(sel: DataFrame, key_src: str, attr_src: str, vfrom, vto) -> DataFrame:
        return sel.select(
            *[F.col(f"_{key_src}_{k}").alias(k) for k in keys],
            *[F.col(f"_{attr_src}_{a}").alias(a) for a in attrs],
            vfrom.alias(valid_from),
            vto.alias(valid_to),
        )

    null_ts = F.lit(None).cast("timestamp")
    # untouched open rows: no update, or update with identical attrs
    untouched = leg(j.filter(in_cur & (~in_upd | ~changed)), "ck", "ca", F.col("_c_from"), null_ts)
    # closed-out old versions
    closed = leg(j.filter(in_cur & in_upd & changed), "ck", "ca", F.col("_c_from"), F.col("_u_eff"))
    # new open versions (changed keys + brand-new keys)
    opened = leg(j.filter(in_upd & (~in_cur | changed)), "uk", "ua", F.col("_u_eff"), null_ts)
    return untouched.unionByName(closed).unionByName(opened)
