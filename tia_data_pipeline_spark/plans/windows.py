"""Incremental / window tier (SURVEY §2.6, step 3-4).

The reference's daily incremental batch (`inc-window`) generalized to
tumbling, sliding, and session windows over ``events``. Oracle casts
``ts::TIMESTAMP`` everywhere: the parquet column is ns-precision and
DuckDB reads TIMESTAMP_NS, while Spark's TimestampType is µs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tia_data_pipeline_spark.catalog import load_table
from tia_data_pipeline_spark.functions.text import money_sum_sql
from tia_data_pipeline_spark.operators.windows import daily_window, sessionize, sliding_window
from tia_data_pipeline_spark.plans.contract import contract_query

_GAP_US = 30 * 60 * 1_000_000
_SLIDE_US = 15 * 60 * 1_000_000


@contract_query(
    "q_daily_window",
    oracle=(
        "SELECT date_trunc('day', ts::TIMESTAMP) AS day, count(*) AS n_events, "
        f"{money_sum_sql('value', decimals=2)} AS sum_value FROM events GROUP BY 1"
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
        "WITH e AS (SELECT ts::TIMESTAMP AS ts, value FROM events) "
        "SELECT make_timestamp((epoch_us(ts) // {slide} - k) * {slide}) AS window_start, "
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
    "q_session_window",
    oracle=(
        "WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events), "
        "flagged AS ("
        "  SELECT user_id, event_id, ts, "
        "    CASE WHEN lag(ts) OVER w IS NULL "
        "         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap} THEN 1 ELSE 0 END AS new_s "
        "  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "sess AS ("
        "  SELECT user_id, ts, "
        "    (sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id "
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
