"""Streaming ≡ batch: the AvailableNow streaming pipelines must agree
with the oracle-checked batch operators on the same input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tia_data_pipeline_spark.catalog import load_table
from tia_data_pipeline_spark.operators.windows import daily_window
from tia_data_pipeline_spark.streaming.windows import (
    events_stream,
    run_available_now,
    stream_daily_counts,
    stream_session_windows,
)
from tests.conftest import SMOKE_SF


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Re-materialize events (µs timestamps) as a multi-file parquet
    dir so maxFilesPerTrigger produces several micro-batches."""
    path = str(tmp_path_factory.mktemp("events_stream") / "events")
    load_table(spark, SMOKE_SF, "events").repartition(6).write.parquet(path)
    return path


def test_stream_daily_equals_batch(spark, events_dir, tmp_path):
    stream = stream_daily_counts(events_stream(spark, events_dir))
    run_available_now(stream, checkpoint=str(tmp_path / "ckpt"), table_name="daily_stream")
    got = {
        r["day"]: (r["n_events"], r["sum_value"])
        for r in spark.table("daily_stream").collect()
    }
    expect = {
        r["day"]: (r["n_events"], r["sum_value"])
        for r in daily_window(load_table(spark, SMOKE_SF, "events")).collect()
    }
    assert got == expect


def test_stream_session_windows_runs(spark, events_dir, tmp_path):
    stream = stream_session_windows(events_stream(spark, events_dir))
    run_available_now(stream, checkpoint=str(tmp_path / "ckpt2"), table_name="sess_stream")
    out = spark.table("sess_stream")
    assert out.count() > 0
    # session invariant: start <= end, n_events >= 1
    bad = out.filter((F.col("session_start") > F.col("session_end")) | (F.col("n_events") < 1))
    assert bad.count() == 0
