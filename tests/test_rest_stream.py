"""Streaming REST poll source: micro-batch per poll, checkpointed
offsets, records flow into a streaming sink."""

from __future__ import annotations

import time

from tia_data_pipeline_spark.sources.rest_stream import RestPollStreamDataSource, demo_poll


def test_rest_poll_stream_ingests_polls(spark, tmp_path):
    spark.dataSource.register(RestPollStreamDataSource)
    stream = (
        spark.readStream.format("rest_poll")
        .schema("id bigint, title string, word_count int")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("poll_feed")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("poll_feed").count() >= 15:  # ≥ 3 polls
                break
            time.sleep(1)
        rows = spark.table("poll_feed").collect()
        assert len(rows) >= 15
        ids = {r["id"] for r in rows}
        # polls arrive in order from poll 0 upward, each complete
        for poll in range(3):
            assert {rec["id"] for rec in demo_poll(poll)} <= ids
        assert all(r["word_count"] == r["id"] % 53 for r in rows)
    finally:
        q.stop()
