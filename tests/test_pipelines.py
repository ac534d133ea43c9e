"""End-to-end pipeline semantics mirrored from the reference DAGs:
hourly overlap is idempotent; the daily run fans out only over the
window's posts and manifests only posts with comments."""

from __future__ import annotations

from pyspark.sql import types as T

from tia_data_pipeline_spark.pipelines import comments_pipeline, posts_pipeline

POST_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("date_gmt", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("categories", T.ArrayType(T.StringType())),
    ]
)
COMMENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("date_gmt", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def test_posts_pipeline_hourly_idempotent(spark):
    # defined in-function: cloudpickle serializes it by value so the
    # executors don't need to import the test module
    def _page_fetcher(page: int):
        # the API returns the same "latest 30" window on overlapping runs
        if page > 1:
            return []
        return [
            {
                "id": i,
                "date_gmt": f"2022-01-01T0{i % 10}:00:00",
                "content": f"post body {i}",
                "categories": ["tech", "asia"],
            }
            for i in range(100, 130)
        ]

    empty = spark.createDataFrame([], "id bigint, date_gmt string, content string, categories string, word_count bigint")
    first = posts_pipeline(spark, _page_fetcher, POST_SCHEMA, empty, ts_string_cols=["date_gmt"])
    rows = first.collect()
    assert len(rows) == 30
    by_id = {r["id"]: r for r in rows}
    assert by_id[100]["date_gmt"] == "2022-01-01 00:00:00"  # ts-norm applied
    assert by_id[100]["word_count"] == 3
    assert by_id[100]["categories"] == '["tech","asia"]'  # json-ser applied

    # the next hourly run re-fetches the same page → nothing to insert
    loaded = empty.unionByName(first)
    second = posts_pipeline(spark, _page_fetcher, POST_SCHEMA, loaded, ts_string_cols=["date_gmt"])
    assert second.count() == 0


def test_posts_pipeline_streaming_end_to_end(spark, tmp_path):
    """The hourly pipeline as a continuous job: polls stream in,
    normalization applies in-flight, parquet sink accumulates
    exactly-once."""
    import time

    from tia_data_pipeline_spark.pipelines import posts_pipeline_streaming

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("date_gmt", T.StringType()),
            T.StructField("content", T.StringType()),
        ]
    )
    stream = posts_pipeline_streaming(
        spark,
        schema,
        fetcher_path="tests.fixtures_stream:stream_posts_feed",
        trigger_interval="1 second",
    )
    out = str(tmp_path / "posts")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 6:
                    break
            except Exception:
                pass
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination()
    got = spark.read.parquet(out).collect()
    assert len(got) >= 6
    by_id = {r["id"]: r for r in got}
    first = by_id[0]
    assert first["date_gmt"] == "2022-01-01 00:00:00"  # ts-norm in-flight
    assert first["word_count"] == 4  # derived in-flight ("streamed post body 0")


def test_comments_pipeline_window_fanout_and_manifest(spark):
    posts = spark.createDataFrame(
        [
            (1, "2022-01-01 05:00:00"),
            (2, "2022-01-01 23:00:00"),
            (3, "2022-01-02 00:30:00"),  # outside window
        ],
        "id bigint, date_gmt string",
    )

    def fetcher(post_id):
        if post_id == 2:
            return []  # no comments → excluded from manifest
        return [
            {"id": post_id * 10 + k, "date_gmt": "2022-01-01T06:00:00", "content": f"re {k}"}
            for k in range(2)
        ]

    existing = spark.createDataFrame(
        [(10, "2022-01-01 06:00:00", "re 0", 2, 1)],
        "id bigint, date_gmt string, content string, word_count bigint, post_id bigint",
    ).select("id", "date_gmt", "content", "word_count", "post_id")

    to_insert, manifest = comments_pipeline(
        spark,
        posts,
        fetcher,
        COMMENT_SCHEMA,
        existing,
        window_start="2022-01-01",
        window_end="2022-01-02",
    )
    inserted = to_insert.collect()
    # post 1 contributes 11 (10 exists already); post 3 outside window
    assert sorted(r["id"] for r in inserted) == [11]
    assert all(r["date_gmt"] == "2022-01-01 06:00:00" for r in inserted)
    assert sorted(r["post_id"] for r in manifest.collect()) == [1]


def test_comments_pipeline_streaming_equals_batch(spark, tmp_path):
    """VERDICT r4 #5: the streaming keyed fan-out daily pipeline must
    converge to exactly the batch comments_pipeline contents — stream
    parents in two file-arrival waves into a Derby sink, compare to the
    batch form over the same parents, then re-drain to prove the
    exactly-once layer (offsets x MERGE) holds."""
    from tia_data_pipeline_spark.pipelines import comments_pipeline_streaming
    from tia_data_pipeline_spark.sources.jdbc import jdbc_read

    def fetcher(post_id):
        if post_id == 2:
            return []
        return [
            {"id": post_id * 10 + k, "date_gmt": "2022-01-01T06:00:00", "content": f"re {k}"}
            for k in range(2)
        ]

    posts_rows = [(1, "2022-01-01 05:00:00"), (2, "2022-01-01 23:00:00"), (3, "2022-01-01 09:00:00")]
    posts_schema = "id bigint, date_gmt string"
    posts_dir = str(tmp_path / "posts")
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    # wave 1: two parents on disk before the stream starts
    spark.createDataFrame(posts_rows[:2], posts_schema).write.mode("append").parquet(posts_dir)

    def drain():
        stream = spark.readStream.schema(posts_schema).parquet(posts_dir)
        q = comments_pipeline_streaming(
            spark,
            stream,
            fetcher,
            COMMENT_SCHEMA,
            url=url,
            table="comments_stream",
            checkpoint=str(tmp_path / "ck"),
        )
        q.awaitTermination()

    drain()
    # wave 2: a later parent arrives; a fresh availableNow drain picks
    # up only the new file (checkpointed offsets)
    spark.createDataFrame(posts_rows[2:], posts_schema).write.mode("append").parquet(posts_dir)
    drain()

    got = sorted(
        map(tuple, jdbc_read(spark, url, 'SELECT * FROM comments_stream').collect())
    )

    # batch reference over the same parents
    posts = spark.createDataFrame(posts_rows, posts_schema)
    existing = spark.createDataFrame([], "id bigint, date_gmt string, content string, word_count bigint")
    to_insert, _ = comments_pipeline(
        spark, posts, fetcher, COMMENT_SCHEMA, existing,
        window_start="2022-01-01", window_end="2022-01-02",
    )
    expect = sorted(map(tuple, to_insert.collect()))
    assert got == expect and len(got) == 4  # posts 1 and 3, two comments each

    # replay drain with nothing new: exactly-once contents hold
    drain()
    assert sorted(
        map(tuple, jdbc_read(spark, url, 'SELECT * FROM comments_stream').collect())
    ) == expect


def test_source_probe_failure_skips_fetch(spark):
    """HttpSensor semantics (reference ``posts_pipeline.py:66-73``):
    a down source is a pre-flight SKIP — empty insert batch, same
    schema, and the distributed fetch never launches."""
    from tia_data_pipeline_spark.pipelines import source_probe

    calls = {"fetch": 0}

    def _fetcher(page: int):
        calls["fetch"] += 1
        return [{"id": 1, "date_gmt": "2022-01-01T00:00:00", "content": "x", "categories": []}]

    def _dead_probe():
        raise ConnectionError("endpoint down")

    empty = spark.createDataFrame(
        [], "id bigint, date_gmt string, content string, categories string, word_count bigint"
    )
    out = posts_pipeline(
        spark, _fetcher, POST_SCHEMA, empty, ts_string_cols=["date_gmt"], probe=_dead_probe
    )
    assert out.columns == empty.columns  # schema preserved through the skip
    assert out.count() == 0
    assert calls["fetch"] == 0  # fetch never launched

    # sensor retry: flaky probe that comes up on the 3rd poke
    flaky = {"n": 0}

    def _flaky_probe():
        flaky["n"] += 1
        if flaky["n"] < 3:
            raise ConnectionError("warming up")

    assert source_probe(_flaky_probe, retries=3, backoff_s=0.0)
    assert flaky["n"] == 3
    assert not source_probe(_dead_probe, retries=2, backoff_s=0.0)


def test_rollup_daily_incremental_converges_to_batch(spark, tmp_path):
    """Sequential (and overlapping, late-arriving) batches must end at
    exactly the batch answer: each affected day recomputes from ALL its
    events, so order and batch boundaries cannot matter."""
    from pyspark.sql import functions as F

    from tests.conftest import SMOKE_SF
    from tia_data_pipeline_spark.catalog import load_table
    from tia_data_pipeline_spark.operators.windows import daily_window
    from tia_data_pipeline_spark.pipelines import rollup_daily_incremental

    events = load_table(spark, SMOKE_SF, "events")
    path = str(tmp_path / "daily_rollup")

    # three overlapping slices, applied out of order: days 3-4, 1-3, 2
    def sl(lo, hi):
        d = F.dayofmonth(F.col("ts"))
        return events.filter((d >= lo) & (d <= hi))

    for batch in (sl(3, 4), sl(1, 3), sl(2, 2)):
        rollup_daily_incremental(spark, events, batch, path)

    got = {
        r["day"]: (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(path).collect()
    }
    expect = {
        r["day"]: (r["n_events"], r["sum_value"])
        for r in daily_window(events).collect()
    }
    # the incremental table covers exactly the touched days, each equal
    # to the batch rollup for that day
    touched = {d for d in expect if d.day in (1, 2, 3, 4)}
    assert set(got) == touched
    for d in touched:
        assert got[d] == expect[d]


def test_rollup_daily_incremental_tolerates_malformed_string_ts(spark, tmp_path):
    """Review r7 (live-repro'd): a malformed string timestamp must not
    ANSI-abort the rollup — the first hardening parsed only the
    affected-day expression, and the bad row still reached
    daily_window's F.window over the raw string, where Spark's
    implicit cast raised CAST_INVALID_INPUT. The typed column now
    replaces ts_col in BOTH frames; the malformed row becomes a NULL
    ts and is dropped by daily_window's stated precondition."""
    from tia_data_pipeline_spark.pipelines import rollup_daily_incremental

    events = spark.createDataFrame(
        [
            (1, "2024-01-02 10:00:00", 1.0),
            (2, "2024-01-02 11:30:00", 2.0),
            (3, "not-a-date", 3.0),
        ],
        "event_id bigint, ts string, value double",
    )
    out = str(tmp_path / "rollup")
    rollup_daily_incremental(spark, events, events, out)
    got = spark.read.parquet(out)
    rows = {str(r["day"]): r["n_events"] for r in got.collect()}
    assert rows == {"2024-01-02 00:00:00": 2}
