"""Streaming window pipelines (SURVEY §2.6 step 5 / §2.4
ext-stream-windows).

The reference's daily pipeline is a scheduled batch over an event-time
predicate with ~1h allowed lateness (`inc-window`,
``comments_pipeline.py:27-33,107``). Streaming form: ``readStream`` →
watermark → windowed agg → ``Trigger.AvailableNow`` so the same job
definition serves both the continuous and the catch-up/batch run. The
batch operators in ``operators/windows.py`` remain the oracle-checked
correctness surface; tests assert stream≡batch on the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tia_data_pipeline_spark.functions.text import money_sum

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(spark: SparkSession, path: str, *, max_files_per_trigger: int = 4) -> DataFrame:
    """File-based micro-batch source over an events directory (parquet,
    µs timestamps — write with ``catalog.load_table`` semantics).

    Pins the correctness-critical session confs first: the batch path
    gets UTC/NTZ pinning through ``catalog.load_table``, but a
    streaming-only pipeline on a bare driver session would otherwise
    read the µs NTZ parquet in local time and bucket every event into
    the wrong window."""
    from tia_data_pipeline_spark.catalog import _ensure_session_confs

    _ensure_session_confs(spark)
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_daily_counts(events: DataFrame, *, watermark: str = "25 hours") -> DataFrame:
    """Daily tumbling aggregate with allowed lateness ≈ the reference's
    'run at 01:00 for yesterday' slack. State for a window is evicted
    once the watermark passes its end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            money_sum(F.col("value"), decimals=2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("day"), "n_events", "sum_value")
    )


def stream_session_windows(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native streaming session windows (``F.session_window``) keyed by
    user — the streaming analogue of ``operators.windows.sessionize``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def run_available_now(
    stream_df: DataFrame, *, checkpoint: str, table_name: str, output_mode: str = "complete"
) -> None:
    """Drain everything currently available and stop — the scheduled-
    batch execution mode (`Trigger.AvailableNow`): same code path as
    continuous, but runs to completion like the reference's daily job.

    ``output_mode``: "complete" for aggregations (the memory sink holds
    the final aggregate table); "append" for row streams (dedup,
    enrichment) where complete mode is invalid.
    """
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(table_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_dedup_events(
    events: DataFrame, *, key_cols: tuple[str, ...] = ("event_id",), watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exactly-once ingest guard: drop duplicate events by key
    within the watermark horizon (``dropDuplicatesWithinWatermark``) —
    the streaming form of `dedup-batch` / the reference's
    ``ON CONFLICT DO NOTHING``. State per key is evicted once the
    watermark passes, so memory is bounded by the lateness window
    (a plain ``dropDuplicates`` on a stream would keep ALL keys
    forever — unbounded state at 100 TB/day ingest).

    Duplicates whose repeats arrive within the watermark of the first
    sighting are removed even when the copies land in different
    micro-batches; a repeat later than the horizon is by definition
    outside the delivery-retry window this guard models.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(key_cols))
