"""Structured Streaming forms of the incremental pipelines."""

from tia_data_pipeline_spark.streaming.windows import (
    stream_daily_counts,
    stream_session_windows,
    run_available_now,
)

__all__ = ["stream_daily_counts", "stream_session_windows", "run_available_now"]
