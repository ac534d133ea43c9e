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


def test_stream_sessions_equal_batch_sessionize(spark, events_dir, tmp_path):
    """Native streaming session_window ≡ the batch lag/cumsum
    sessionize on the same 30-min gap: same (user, start, count)."""
    from tia_data_pipeline_spark.operators.windows import sessionize

    stream = stream_session_windows(events_stream(spark, events_dir))
    run_available_now(stream, checkpoint=str(tmp_path / "ck3"), table_name="sess_eq")
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.table("sess_eq").collect()
    }
    expect = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in sessionize(load_table(spark, SMOKE_SF, "events"), gap_minutes=30).collect()
    }
    assert got == expect


def test_stream_sliding_window_equals_batch(spark, events_dir, tmp_path):
    from tia_data_pipeline_spark.operators.windows import sliding_window
    from tia_data_pipeline_spark.streaming.windows import EVENTS_STREAM_SCHEMA
    from pyspark.sql import functions as F2

    src = events_stream(spark, events_dir)
    stream = (
        src.withWatermark("ts", "2 hours")
        .groupBy(F2.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F2.count("*").alias("n_events"))
        .select(F2.col("w.start").alias("window_start"), "n_events")
    )
    run_available_now(stream, checkpoint=str(tmp_path / "ck5"), table_name="slide_stream")
    got = {
        (r["window_start"], r["n_events"]) for r in spark.table("slide_stream").collect()
    }
    expect = {
        (r["window_start"], r["n_events"])
        for r in sliding_window(load_table(spark, SMOKE_SF, "events"))
        .select("window_start", "n_events")
        .collect()
    }
    assert got == expect


def test_checkpoint_restart_is_exactly_once(spark, events_dir, tmp_path):
    """Re-running the drained stream with the same checkpoint must add
    nothing — the reference's ON CONFLICT idempotency, supplied by the
    engine's checkpointing instead of the database."""
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck4")
    src = events_stream(spark, events_dir).select("event_id", "ts", "value")
    for _ in range(2):
        q = (
            src.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    total = spark.read.parquet(out_dir).count()
    assert total == load_table(spark, SMOKE_SF, "events").count()


def test_stream_dedup_within_watermark(spark, events_dir, tmp_path):
    """dropDuplicatesWithinWatermark must remove key repeats even when
    copies land in different micro-batches, matching batch
    dropDuplicates on the doubled input."""
    from tia_data_pipeline_spark.streaming.windows import stream_dedup_events

    # double every file: same events dir read twice into one stream dir
    doubled = str(tmp_path / "doubled")
    base = load_table(spark, SMOKE_SF, "events")
    base.repartition(3).write.parquet(doubled)
    base.repartition(5).write.mode("append").parquet(doubled)

    stream = stream_dedup_events(
        events_stream(spark, doubled, max_files_per_trigger=2), watermark="365 days"
    )
    run_available_now(
        stream, checkpoint=str(tmp_path / "ck4"), table_name="dedup_stream", output_mode="append"
    )
    out = spark.table("dedup_stream")
    assert out.count() == base.count()
    assert out.select("event_id").distinct().count() == base.count()


def test_events_stream_pins_confs_on_bare_session(spark, events_dir):
    """A streaming-only pipeline may be the FIRST thing run on a bare
    driver session (no catalog.load_table call to pin UTC/NTZ): the
    source itself must self-heal the session or every NTZ timestamp
    reads shifted by the local-time offset (the round-2 failure mode,
    streaming edition)."""
    bare = spark.newSession()
    bare.conf.set("spark.sql.session.timeZone", "America/New_York")
    bare.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    events_stream(bare, events_dir)
    assert bare.conf.get("spark.sql.session.timeZone") == "UTC"
    assert bare.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled") == "false"


def test_stream_interval_join_equals_batch(spark, events_dir, tmp_path):
    """Stream-stream watermarked interval join (view->purchase
    attribution within 1h per user) must equal the batch twin on the
    same input, with the two sides arriving across several
    micro-batches (maxFilesPerTrigger splits the 6-file dir)."""
    from tia_data_pipeline_spark.streaming.joins import (
        interval_join_batch,
        stream_interval_join,
    )
    from tia_data_pipeline_spark.streaming.windows import events_stream

    ev = load_table(spark, SMOKE_SF, "events").select("event_id", "ts", "user_id", "event_type")
    views_b = ev.filter(F.col("event_type") == "view")
    buys_b = ev.filter(F.col("event_type") == "purchase")
    expect = sorted(
        (r["l_event_id"], r["r_event_id"])
        for r in interval_join_batch(views_b, buys_b, within="1 hour").collect()
    )
    assert expect, "batch twin matched nothing — fixture no longer exercises the join"

    s = events_stream(spark, events_dir, max_files_per_trigger=2).select(
        "event_id", "ts", "user_id", "event_type"
    )
    joined = stream_interval_join(
        s.filter(F.col("event_type") == "view"),
        s.filter(F.col("event_type") == "purchase"),
        within="1 hour",
        watermark="365 days",  # drain-everything test: no late-drop semantics in play
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ij_stream")
        .option("checkpointLocation", str(tmp_path / "ij_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["l_event_id"], r["r_event_id"]) for r in spark.table("ij_stream").collect()
    )
    assert got == expect
