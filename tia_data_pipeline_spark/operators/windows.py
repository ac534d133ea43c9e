"""Event-time window operators (batch forms).

Generalizes the reference's daily incremental window (`inc-window`:
``comments_pipeline.py:27-33,107`` — yesterday's tumbling day, computed
as a range predicate) into proper tumbling / sliding / session windows
over an event-time column. Streaming forms live in
``tia_data_pipeline_spark.streaming``; these batch forms are the
correctness surface the oracle verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tia_data_pipeline_spark.functions.text import finite_value, money_sum


def daily_window(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """1-day tumbling window: count + sum(value) per day.

    ``F.window`` aligns to epoch boundaries, so for a 1-day width the
    window start ≡ date_trunc('day') in UTC — the oracle uses the
    latter. Two-phase hash aggregate; at scale the input is
    partition-pruned by the same day column. The money sum goes through
    exact integer cents (order-independent, oracle-stable).

    Event-time precondition, stated explicitly: rows without a
    timestamp are excluded (F.window would silently drop them anyway
    while a SQL date_trunc would emit a NULL group — the explicit
    filter makes both engines agree by construction).
    """
    return (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(F.window(F.col(ts_col), "1 day").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            # non-finite values are corrupt measurements: the event
            # still counts, its value contributes nothing (NULL)
            money_sum(finite_value(F.col("value")), decimals=2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("day"), "n_events", "sum_value")
    )


def sliding_window(
    events: DataFrame, ts_col: str = "ts", width: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Sliding window (width 1h, slide 15m): each event lands in
    width/slide windows. Spark's native `window()` does the fan-out
    JVM-side; the oracle reproduces it by exploding k∈[0,4). NULL
    timestamps are excluded explicitly (same rationale as
    daily_window)."""
    return (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(F.window(F.col(ts_col), width, slide).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            money_sum(
                finite_value(F.col("value")), count_expr=F.count("*"), decimals=2
            ).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
    )


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Batch sessionization: a session breaks after `gap_minutes` of
    key-inactivity. lag → new-session flag → cumulative-sum session
    index → per-session aggregate. One shuffle on the key (both window
    functions and the final groupBy share the hash partitioning on
    user_id; Catalyst reuses the exchange).

    Gap arithmetic is in integer microseconds (``unix_micros`` ≡ DuckDB
    ``epoch_us``) so the oracle compares the exact same values; the
    tiebreak column pins lag() order for equal timestamps.

    Type-proof: ``unix_micros`` accepts only TIMESTAMP, so the column
    is cast to it first — under a UTC session timezone the cast from
    TIMESTAMP_NTZ is value-identical, making the operator safe even if
    a caller's scan inferred NTZ (the catalog pins the conf, but a
    bare-session drift should degrade to the same values, not an
    AnalysisException).
    """
    # sessionization REQUIRES a key and a time: a NULL in either has
    # no session semantics, and NULL ordering diverges across engines
    # (Spark sorts NULLS FIRST ascending, DuckDB NULLS LAST), so the
    # precondition is an explicit filter both the oracle and the
    # streaming form state identically
    events = events.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
    # tiebreak NULL placement stated (the nullable-sort-key rule): a
    # NULL tiebreak within a ts-tie sorts FIRST on Spark and LAST on
    # DuckDB. Today the divergence is output-invariant (tied rows land
    # in the same session either way), but any future per-row output
    # (first/last event per session) would silently diverge — pin the
    # order now, mirrored as NULLS LAST in the oracle text.
    w_order = Window.partitionBy(key_col).orderBy(
        ts_col, F.col(tiebreak_col).asc_nulls_last()
    )
    gap_us = gap_minutes * 60 * 1_000_000
    ts_instant = F.col(ts_col).cast("timestamp")
    us = F.unix_micros(ts_instant)
    with_flag = events.withColumn(
        "_new_session",
        F.when(
            F.lag(ts_col).over(w_order).isNull()
            | (us - F.unix_micros(F.lag(ts_instant).over(w_order)) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    with_id = with_flag.withColumn(
        "session_id",
        F.sum("_new_session").over(
            w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_id.groupBy(key_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select(key_col, "session_id", "session_start", "session_end", "n_events")
    )


def cohort_retention(
    events: DataFrame, key_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Cohort retention: users grouped by first-activity day; for each
    (cohort_day, day_offset) the count of distinct users active that
    many days after joining — the engagement curve every product/
    training-data freshness dashboard needs.

    One shuffle on the key computes each user's cohort day as a window
    min (no self-join back onto events); the (cohort, offset) rollup is
    a standard two-phase distinct-count. At extreme user cardinality
    swap ``countDistinct`` for ``approx_count_distinct`` — the exact
    form is the oracle-checkable baseline.
    """
    # cohorts need an identified user and a timestamp (precondition
    # stated explicitly; see sessionize)
    events = events.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
    day = F.date_trunc("day", F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col)
    with_cohort = events.select(F.col(key_col), day.alias("_day")).withColumn(
        "cohort_day", F.min("_day").over(w)
    )
    return (
        with_cohort.groupBy(
            "cohort_day",
            F.datediff(F.col("_day"), F.col("cohort_day")).cast("bigint").alias("day_offset"),
        )
        .agg(F.countDistinct(key_col).cast("bigint").alias("n_users"))
        .select("cohort_day", "day_offset", "n_users")
    )
