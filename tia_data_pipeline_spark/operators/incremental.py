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
    on the PK, collapsing refetch overlap. The survivor among duplicate
    keys is whichever row a partition scans first — fine for the
    reference semantic (duplicate rows are identical re-fetches);
    batches that can carry CONFLICTING versions of a key should use
    ``merge_upsert_plan(..., order_col=...)`` for a deterministic
    winner."""
    return batch.dropDuplicates(list(keys))


def incremental_append(
    incoming: DataFrame, existing: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Rows of ``incoming`` whose key is absent from ``existing`` —
    the `ON CONFLICT DO NOTHING` invariant (SURVEY op ``antijoin-incr``).

    Only the key columns of ``existing`` participate (column pruning →
    the target scan reads just the PK), and the anti-join is NULL-SAFE
    on composite keys (``eqNullSafe`` per column — the lakehouse merge
    documents the same trap: plain ``on=keys`` equality never matches a
    NULL key, so a NULL-keyed row would re-append on every retry and
    break the twice-is-a-no-op invariant).
    """
    from functools import reduce

    from pyspark.sql import functions as F

    keys = list(keys)
    new_rows = dedup_batch(incoming, keys)
    existing_keys = existing.select(*[F.col(k).alias(f"_ek_{k}") for k in keys])
    cond = reduce(
        lambda a, b: a & b,
        [new_rows[k].eqNullSafe(existing_keys[f"_ek_{k}"]) for k in keys],
    )
    return new_rows.join(existing_keys, cond, "left_anti")


def merge_upsert_plan(
    incoming: DataFrame,
    existing: DataFrame,
    keys: Sequence[str],
    *,
    order_col: str | None = None,
) -> DataFrame:
    """Full-table merge: the incoming row wins per key, existing rows
    without a replacement survive. The transactional form would be Delta
    ``MERGE WHEN NOT MATCHED THEN INSERT``; this is the pure-DataFrame
    plan (recompute target) for stores without ACID merge.

    Within-batch survivor: with ``order_col`` set, the row with the
    HIGHEST value per key wins (ties broken by the row's full content
    — deterministic "latest wins"). Without it, duplicates collapse
    via ``dropDuplicates`` — fine when duplicate keys are identical
    refetches (the reference semantic), but an incoming batch carrying
    CONFLICTING versions of a key gets a partitioning-dependent
    survivor; pass ``order_col`` for reproducible merges there."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from functools import reduce

    keys = list(keys)
    if order_col is None:
        winners = dedup_batch(incoming, keys)
    else:
        # tiebreak on the remaining SORTABLE columns only — map types
        # are unorderable at ANY nesting depth (a bare map column, an
        # array<map<...>>, a struct with a map field all fail planning
        # as sort expressions), so exclude on substring, not prefix
        others = [
            c
            for c, t in incoming.dtypes
            if c not in keys and c != order_col and "map<" not in t
        ]
        w = Window.partitionBy(*keys).orderBy(
            F.col(order_col).desc(), *[F.col(c).desc() for c in others]
        )
        winners = (
            incoming.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    # null-safe like every other merge-family anti-join (see
    # incremental_append): plain equality never matches a NULL key, so
    # the old NULL-key row would survive alongside the new winner and
    # the target would grow by one NULL row per merge
    inc_keys = incoming.select(*[F.col(k).alias(f"_ik_{k}") for k in keys])
    cond = reduce(
        lambda a, b: a & b,
        [existing[k].eqNullSafe(inc_keys[f"_ik_{k}"]) for k in keys],
    )
    replaced = existing.join(inc_keys, cond, "left_anti")
    return replaced.unionByName(winners)


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

    Preconditions stated (the merge-family discipline):

    - ``updates`` is KEY-DEDUPED here before the join — the LATEST
      ``eff_col`` per key wins, ties broken by the sortable attr
      columns, then by a canonical ``to_json`` render of any
      map-typed attrs (so even map-attr-only differences pick the
      same winner on every retry/partitioning; two snapshot extracts
      unioned, or a retry overlap, would otherwise fan the one open
      row into N joined rows: the same old version closed N times
      plus N simultaneously-open versions).
    - rows whose ``eff_col`` is NULL are dropped from ``updates``: an
      event-time merge cannot close or open a version at an unknown
      time (a NULL ``valid_to`` on the closed leg would masquerade as
      a second OPEN row). Event-time ops filter NULL ts, per the
      engine-wide invariant.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    keys, attrs = list(keys), list(attrs)
    if not keys or not attrs:
        raise ValueError("scd2_merge requires non-empty keys and attrs")
    updates = updates.filter(F.col(eff_col).isNotNull())
    sortable_attrs = [
        a for a in attrs if "map<" not in dict(updates.dtypes).get(a, "")
    ]
    map_attrs = [a for a in attrs if a not in sortable_attrs]
    # Map-typed attrs can't participate in the sort directly
    # (unorderable since Spark 3), but they still need a deterministic
    # LAST-RESORT tiebreak: two update rows tying on keys, eff_col and
    # every sortable attr while differing only in a map attr would
    # otherwise get an arbitrary row_number winner — the surviving
    # version could differ across retries/partitionings, breaking the
    # retry-idempotence this dedup exists for (ADVICE r6). to_json of
    # the map attrs is a pure function of the row (entry order is part
    # of the stored value), so ordering on the rendered string picks
    # the same winner on every execution; rows identical under the
    # render are identical versions, so either winner is the same row.
    map_tiebreak = (
        [F.to_json(F.struct(*[F.col(a) for a in map_attrs]))] if map_attrs else []
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(eff_col).desc(), *[F.col(a) for a in sortable_attrs], *map_tiebreak
    )
    updates = (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
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
        ca, ua = F.col(f"_ca_{a}"), F.col(f"_ua_{a}")
        if a in map_attrs:
            # `<=>` rejects MAP types outright (unorderable since
            # Spark 3) — map attrs compare by their to_json render,
            # the same canonical form as the dedup tiebreak above.
            # Entry order is part of the render: two maps with the
            # same entries stored in different order count as changed
            # (a spurious version, never a missed one).
            ca, ua = F.to_json(ca), F.to_json(ua)
        c = ~ca.eqNullSafe(ua)
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
