"""Idempotency property of the incremental load — the reference's
`ON CONFLICT DO NOTHING` invariant (posts_pipeline.py:57): applying a
batch twice ≡ once."""

from __future__ import annotations

from pyspark.sql import functions as F

from tia_data_pipeline_spark.operators.incremental import (
    dedup_batch,
    incremental_append,
    merge_upsert_plan,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "id bigint, v string")


def test_incremental_append_filters_existing(spark):
    existing = _frame(spark, [(1, "a"), (2, "b")])
    incoming = _frame(spark, [(2, "b2"), (3, "c"), (3, "c-dup")])
    got = incremental_append(incoming, existing, ["id"]).collect()
    assert sorted(r["id"] for r in got) == [3]


def test_twice_equals_once(spark):
    existing = _frame(spark, [(1, "a")])
    batch = _frame(spark, [(1, "a"), (2, "b"), (3, "c")])
    first = incremental_append(batch, existing, ["id"])
    after_first = existing.unionByName(first)
    second = incremental_append(batch, after_first, ["id"])
    assert second.count() == 0
    assert after_first.count() == 3


def test_dedup_batch_keeps_one_per_key(spark):
    batch = _frame(spark, [(1, "x"), (1, "x"), (2, "y")])
    assert dedup_batch(batch, ["id"]).count() == 2


def test_merge_upsert_latest_wins(spark):
    existing = _frame(spark, [(1, "old"), (2, "keep")])
    incoming = _frame(spark, [(1, "new")])
    got = {r["id"]: r["v"] for r in merge_upsert_plan(incoming, existing, ["id"]).collect()}
    assert got == {1: "new", 2: "keep"}


def test_scd2_merge_semantics(spark):
    from datetime import datetime

    from tia_data_pipeline_spark.operators.incremental import scd2_merge

    t0 = datetime(2020, 1, 1)
    eff = datetime(2020, 6, 1)
    cur = spark.createDataFrame(
        [(1, "a", t0), (2, "b", t0), (3, "c", t0)],
        "k bigint, v string, valid_from timestamp",
    )
    upd = spark.createDataFrame(
        [(2, "b", eff), (3, "C2", eff), (4, "d", eff)],
        "k bigint, v string, eff timestamp",
    )
    rows = {
        (r["k"], r["v"]): (r["valid_from"], r["valid_to"])
        for r in scd2_merge(cur, upd, keys=["k"], attrs=["v"], eff_col="eff").collect()
    }
    assert rows == {
        (1, "a"): (t0, None),  # no update → untouched
        (2, "b"): (t0, None),  # identical attrs → no churn
        (3, "c"): (t0, eff),  # changed → old version closed...
        (3, "C2"): (eff, None),  # ...new version opened
        (4, "d"): (eff, None),  # brand-new key
    }


def test_incremental_append_null_keys_idempotent(spark):
    """NULL-keyed rows must not re-append on retry: the anti-join is
    null-safe (plain on=keys equality never matches NULL = the trap
    lakehouse._merge_parquet_fallback documents)."""
    existing = _frame(spark, [(None, "n"), (1, "a")])
    batch = _frame(spark, [(None, "n"), (2, "b")])
    first = incremental_append(batch, existing, ["id"])
    assert sorted(r["v"] for r in first.collect()) == ["b"]
    after = existing.unionByName(first)
    assert incremental_append(batch, after, ["id"]).count() == 0


def test_merge_upsert_order_col_deterministic_winner(spark):
    """With conflicting in-batch versions of a key, order_col picks the
    highest deterministically; without it the survivor is explicitly
    unspecified (documented), so only the order_col form is asserted."""
    existing = _frame(spark, [(1, "old")])
    incoming = spark.createDataFrame(
        [(1, "v1", 10), (1, "v2", 20), (2, "x", 5)], "id bigint, v string, ver bigint"
    )
    got = {
        r["id"]: r["v"]
        for r in merge_upsert_plan(
            incoming, existing.withColumn("ver", F.lit(0)), ["id"], order_col="ver"
        ).collect()
    }
    assert got == {1: "v2", 2: "x"}


def test_merge_upsert_order_col_skips_nested_maps(spark):
    """ADVICE r4: map types are unorderable at ANY depth — an
    array<map<...>> or struct-with-map column must be excluded from the
    tiebreak sort, not just top-level maps (which used to be the only
    exclusion and left nested maps to fail planning)."""
    incoming = spark.createDataFrame(
        [
            (1, "v1", 10, [{"a": "1"}], {"m": {"k": "v"}}),
            (1, "v2", 20, [{"a": "2"}], {"m": {"k": "w"}}),
        ],
        "id bigint, v string, ver bigint, tags array<map<string,string>>, "
        "meta struct<m: map<string,string>>",
    )
    existing = incoming.limit(0)
    got = merge_upsert_plan(incoming, existing, ["id"], order_col="ver").collect()
    assert len(got) == 1 and got[0]["v"] == "v2"


def test_merge_upsert_null_key_converges(spark):
    """NULL-keyed rows replace instead of accumulating: the anti-join
    is null-safe like the rest of the merge family."""
    existing = _frame(spark, [(None, "old"), (1, "a")])
    incoming = _frame(spark, [(None, "new")])
    merged = merge_upsert_plan(incoming, existing, ["id"])
    rows = {(r["id"], r["v"]) for r in merged.collect()}
    assert rows == {(1, "a"), (None, "new")}
    # and re-merging converges (no growth)
    again = merge_upsert_plan(incoming, merged, ["id"])
    assert again.count() == 2


def test_scd2_merge_dedups_batch_and_drops_null_eff(spark):
    """Within-batch key dups collapse to the LATEST eff (a retry
    overlap must not close the same version twice or open two
    concurrent versions), and NULL-eff update rows are dropped (an
    event-time merge cannot act at an unknown time)."""
    from datetime import datetime

    from tia_data_pipeline_spark.operators.incremental import scd2_merge

    t0 = datetime(2020, 1, 1)
    e1, e2 = datetime(2020, 6, 1), datetime(2020, 7, 1)
    cur = spark.createDataFrame(
        [(1, "a", t0), (2, "b", t0)], "k bigint, v string, valid_from timestamp"
    )
    upd = spark.createDataFrame(
        [(1, "a1", e1), (1, "a2", e2), (2, "ignored", None)],
        "k bigint, v string, eff timestamp",
    )
    rows = {
        (r["k"], r["v"]): (r["valid_from"], r["valid_to"])
        for r in scd2_merge(cur, upd, keys=["k"], attrs=["v"], eff_col="eff").collect()
    }
    assert rows == {
        (1, "a"): (t0, e2),  # closed ONCE, at the winning (latest) eff
        (1, "a2"): (e2, None),  # one open version, the latest
        (2, "b"): (t0, None),  # NULL-eff update dropped → untouched
    }


def test_scd2_map_attr_tiebreak_deterministic(spark):
    """Two update rows tying on key, eff_col and every sortable attr
    but differing ONLY in a map-typed attr must pick the SAME winner on
    every execution/partitioning (ADVICE r6): the to_json render of the
    map attrs is the last-resort sort key."""
    from pyspark.sql import types as T

    from tia_data_pipeline_spark.operators.incremental import scd2_merge

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("m", T.MapType(T.StringType(), T.LongType())),
            T.StructField("eff", T.TimestampType()),
            T.StructField("valid_from", T.TimestampType()),
            T.StructField("valid_to", T.TimestampType()),
        ]
    )
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 2, 1)
    cur = spark.createDataFrame([(1, "a", {"k": 1}, None, t0, None)], schema).select(
        "id", "v", "m", "valid_from", "valid_to"
    )
    upd_rows = [
        (1, "a", {"k": 2}, t1, None, None),
        (1, "a", {"k": 3}, t1, None, None),
    ]
    winners = set()
    for seed in range(3):
        upd = (
            spark.createDataFrame(
                upd_rows if seed % 2 == 0 else list(reversed(upd_rows)), schema
            )
            .select("id", "v", "m", "eff")
            .repartition(seed + 1)
        )
        out = scd2_merge(
            cur, upd, keys=["id"], attrs=["v", "m"], eff_col="eff"
        )
        open_rows = [
            r
            for r in out.collect()
            if r["valid_to"] is None and r["valid_from"] == t1
        ]
        assert len(open_rows) == 1
        winners.add(tuple(sorted(open_rows[0]["m"].items())))
    assert len(winners) == 1, f"nondeterministic map-attr winner: {winners}"


def test_hash_sample_rate16_matches_sql_twin_on_null_ids(spark):
    """hash_sample keeps NO NULL-id row at ANY rate — including 16 —
    matching its declared SQL twin `hash_bucket < k` (ADVICE r6: the
    old keep-all short-circuit kept NULL ids the oracle form drops)."""
    from tia_data_pipeline_spark.operators.sampling import hash_sample

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c")], "id bigint, v string"
    )
    got = hash_sample(df, "id", 16).collect()
    assert sorted(r["v"] for r in got) == ["a", "b"]
