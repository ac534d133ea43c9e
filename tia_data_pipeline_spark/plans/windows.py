"""Incremental / window tier (SURVEY §2.6, step 3-4).

The reference's daily incremental batch (`inc-window`) generalized to
tumbling, sliding, and session windows over ``events``. Oracle casts
``ts::TIMESTAMP`` everywhere: the parquet column is µs NTZ (the
pinned invariant — the catalog disables inferTimestampNTZ so Spark
scans it as TimestampType) and the cast keeps DuckDB comparing the
same µs instants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tia_data_pipeline_spark.catalog import load_table
from tia_data_pipeline_spark.functions.text import (
    finite_value,
    finite_value_sql,
    money_sum_sql,
)
from tia_data_pipeline_spark.operators.windows import daily_window, sessionize, sliding_window
from tia_data_pipeline_spark.plans.contract import contract_query

_GAP_US = 30 * 60 * 1_000_000
_SLIDE_US = 15 * 60 * 1_000_000


@contract_query(
    "q_daily_window",
    oracle=(
        "SELECT date_trunc('day', ts::TIMESTAMP) AS day, count(*) AS n_events, "
        f"{money_sum_sql(finite_value_sql('value'), decimals=2)} AS sum_value "
        "FROM events WHERE ts IS NOT NULL GROUP BY 1"
    ),
    covers="inc-window (comments_pipeline.py:27-33,107)",
)
def q_daily_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily tumbling window — F.window('1 day') starts align with
    date_trunc('day') in UTC."""
    return daily_window(load_table(spark, sf_dir, "events"))


@contract_query(
    "q_sliding_window",
    oracle=(
        # FLOOR division, not // : DuckDB's // (like Spark's div)
        # truncates toward zero, which mis-aligns pre-1970 windows
        # (negative epoch_us) one slide late while F.window floors —
        # subtracting the positive modulus makes the numerator exactly
        # divisible, so truncation == floor in pure integers.
        f"WITH e AS (SELECT ts::TIMESTAMP AS ts, {finite_value_sql('value')} AS value, "
        "  (epoch_us(ts::TIMESTAMP) - ((epoch_us(ts::TIMESTAMP) % {slide}) + {slide}) % {slide}) "
        "    // {slide} AS w0 "
        "  FROM events WHERE ts IS NOT NULL) "
        "SELECT make_timestamp((w0 - k) * {slide}) AS window_start, "
        "count(*) AS n_events, {avg} AS avg_value "
        "FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) "
        "GROUP BY 1".format(slide=_SLIDE_US, avg=money_sum_sql("value", "count(*)", 2))
    ),
    covers="ext-stream-windows (sliding; generalizes inc-window)",
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding by 15 minutes: every event lands in
    exactly 4 windows; Spark fans out JVM-side via `window()`, the
    oracle by exploding k∈[0,4)."""
    return sliding_window(load_table(spark, sf_dir, "events"))


@contract_query(
    "q_gap_fill",
    oracle=(
        "WITH hours AS (SELECT unnest(generate_series("
        "  TIMESTAMP '2024-01-02 00:00:00', TIMESTAMP '2024-01-02 23:00:00', "
        "  INTERVAL 1 HOUR)) AS hour_ts), "
        "actual AS (SELECT date_trunc('hour', ts::TIMESTAMP) AS hour_ts, count(*) AS n "
        "  FROM events WHERE ts::TIMESTAMP >= TIMESTAMP '2024-01-02' "
        "  AND ts::TIMESTAMP < TIMESTAMP '2024-01-03' GROUP BY 1) "
        "SELECT h.hour_ts, coalesce(a.n, 0)::BIGINT AS n_events "
        "FROM hours h LEFT JOIN actual a ON h.hour_ts = a.hour_ts"
    ),
    covers="time-series resample with gap filling (hypertable-rollup flavor)",
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly counts for one day with empty hours zero-filled: the
    dense time spine is generated in-plan (sequence + explode) and
    left-joins the sparse aggregate — no driver-side calendar loop."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-02 00:00:00").cast("timestamp"),
                F.lit("2024-01-02 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour_ts")
    )
    actual = (
        events.filter(
            (F.col("ts") >= F.lit("2024-01-02")) & (F.col("ts") < F.lit("2024-01-03"))
        )
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_ts"))
        .agg(F.count("*").alias("n"))
    )
    return spine.join(actual, "hour_ts", "left").select(
        "hour_ts", F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events")
    )


@contract_query(
    "q_histogram",
    oracle=(
        f"SELECT (floor({finite_value_sql('value')} / 25) * 25)::BIGINT AS bucket_lo, "
        "count(*) AS n FROM events GROUP BY 1"
    ),
    covers="value histogram (fixed-width bucketing)",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values — bucket arithmetic is a
    narrow expression, the aggregate two-phase; the distributed form of
    a dashboard histogram at any scale."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            (F.floor(finite_value(F.col("value")) / 25) * 25)
            .cast("bigint")
            .alias("bucket_lo")
        )
        .agg(F.count("*").alias("n"))
    )


@contract_query(
    "q_session_window",
    oracle=(
        "WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events "
        "  WHERE user_id IS NOT NULL AND ts IS NOT NULL), "
        "flagged AS ("
        "  SELECT user_id, event_id, ts, "
        "    CASE WHEN lag(ts) OVER w IS NULL "
        "         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap} THEN 1 ELSE 0 END AS new_s "
        "  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id NULLS LAST)), "
        "sess AS ("
        "  SELECT user_id, ts, "
        "    (sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id NULLS LAST "
        "       ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id "
        "  FROM flagged) "
        "SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end, "
        "count(*) AS n_events FROM sess GROUP BY user_id, session_id".format(gap=_GAP_US)
    ),
    covers="ext-stream-windows (session; batch emulation via lag/cumsum)",
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user (batch form; streaming form in
    streaming/windows.py uses session_window + watermark)."""
    return sessionize(load_table(spark, sf_dir, "events"), gap_minutes=30)
