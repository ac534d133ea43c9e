"""The reference's two DAGs as engine pipelines.

A user of ``dendihandian/tia-data-pipeline`` runs two jobs
(SURVEY §3.1-3.2); these are their engine equivalents, composed from
the same operators the declared-query contract verifies. Airflow's
task graph (sense → extract → transform → load → cleanup) collapses
into one lazy Spark plan per pipeline; the scheduler's only remaining
job is to call these with a window.

posts_pipeline  (hourly — reference ``posts_pipeline.py:63,109``):
    sense API/sink → fetch latest page → normalize → idempotent append.
comments_pipeline (daily — reference ``comments_pipeline.py:107,154``):
    query parent window from the sink → keyed fan-out fetch →
    normalize (+ parent enrichment) → idempotent append (+ manifest).

The wall-clock wart in the reference (window computed from
``datetime.now()`` at task runtime, breaking backfills —
``comments_pipeline.py:27-30``) is fixed by taking the window bounds
as explicit parameters.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tia_data_pipeline_spark.ingest import normalize_records
from tia_data_pipeline_spark.operators.incremental import incremental_append
from tia_data_pipeline_spark.sources.rest import (
    KeyFetcher,
    PageFetcher,
    keyed_fanout_source,
    paginated_rest_source,
)


def sink_probe(spark: SparkSession) -> bool:
    """`SqlSensor`/`const-probe` (reference ``posts_pipeline.py:76-81``):
    SELECT 1 against the engine before writing."""
    return spark.sql("SELECT 1 AS is_accessible").collect()[0][0] == 1


def source_probe(
    probe: Callable[[], object],
    *,
    retries: int = 3,
    backoff_s: float = 0.5,
) -> bool:
    """`HttpSensor` analogue (reference ``posts_pipeline.py:66-73``):
    poke the source before launching the distributed fetch. ``probe``
    is any zero-arg callable that raises on unavailability (production:
    a HEAD/GET against the endpoint; tests inject a fake). Pokes up to
    ``retries`` times with linear backoff — the sensor's poke interval
    — and returns False instead of raising, so the pipeline can turn
    an unavailable source into a pre-flight *skip* rather than a task
    error mid-job. Control-plane only: runs once on the driver, never
    inside a Spark task."""
    for attempt in range(retries):
        try:
            probe()
            return True
        except Exception:  # noqa: BLE001 — any failure means "not up yet"
            if attempt < retries - 1:
                time.sleep(backoff_s * (attempt + 1))
    return False


def posts_pipeline(
    spark: SparkSession,
    fetcher: PageFetcher | None,
    schema: T.StructType | None,
    existing_posts: DataFrame,
    *,
    n_pages: int = 1,
    key: str = "id",
    ts_string_cols: Sequence[str] = ("date_gmt", "modified_gmt"),
    probe: Callable[[], object] | None = None,
) -> DataFrame:
    """Hourly posts ingest: fetch the latest page(s), normalize
    (nested→JSON, ts-norm, word_count), drop re-fetch overlap against
    the existing table. Returns the rows an idempotent append would
    insert — run it twice, the second result is empty.

    ``fetcher=None`` / ``schema=None`` use the reference's own contract
    (``sources/contracts.py``): the stdlib GET against the public posts
    endpoint and the 33-column DDL schema — a migrating user passes
    only the Spark session and the existing table.

    Pre-flight order mirrors the reference DAG: source sensor, then
    sink sensor, then the fetch. An unavailable *source* is a skip —
    the returned insert batch is empty (same schema) and the
    distributed fetch never launches; an unavailable *sink* is an
    error, because a skip would silently drop fetched data. ``probe``
    defaults to fetching page 1 on the driver, exactly the reference's
    HttpSensor GET."""
    if fetcher is None or schema is None:
        from tia_data_pipeline_spark.sources import contracts

        fetcher = fetcher if fetcher is not None else contracts.default_page_fetcher()
        schema = schema if schema is not None else contracts.POSTS_SCHEMA
    if not source_probe(probe or (lambda: fetcher(1))):
        raw = spark.createDataFrame([], schema)  # pre-flight skip
    else:
        if not sink_probe(spark):  # pragma: no cover - always true locally
            raise RuntimeError("sink probe failed")
        raw = paginated_rest_source(spark, fetcher, n_pages, schema)
    normalized = normalize_records(raw, text_col="content", ts_string_cols=ts_string_cols)
    return incremental_append(normalized, existing_posts, keys=[key])


def posts_pipeline_streaming(
    spark: SparkSession,
    schema: T.StructType,
    *,
    fetcher_path: str | None = None,
    # same default as the batch posts_pipeline — the streaming form of
    # the SAME pipeline must normalize the same columns, or one record
    # ingested both ways stores different timestamp bytes
    ts_string_cols: Sequence[str] = ("date_gmt", "modified_gmt"),
    trigger_interval: str = "1 hour",
):
    """The whole hourly pipeline as ONE continuous job: the `rest_poll`
    streaming source replaces the Airflow schedule (trigger interval ≙
    @hourly), the normalization runs as stateless streaming
    projections, and checkpointed offsets replace the PK conflict-skip
    for run-level idempotency. Returns an unstarted streaming
    DataFrame; attach a sink + checkpoint with ``writeStream``.

    Schema-on-read is PERMISSIVE like the reference's staging reads:
    record keys absent from the declared schema are dropped, declared
    fields absent from a record surface as NULL — so the fetcher and
    schema must agree on field names.
    """
    from tia_data_pipeline_spark.sources.rest_stream import RestPollStreamDataSource

    spark.dataSource.register(RestPollStreamDataSource)
    reader = spark.readStream.format("rest_poll").schema(schema)
    if fetcher_path:
        reader = reader.option("fetcher", fetcher_path)
    raw = reader.load()
    return normalize_records(raw, text_col="content", ts_string_cols=ts_string_cols)


def comments_pipeline(
    spark: SparkSession,
    posts_table: DataFrame,
    fetcher: KeyFetcher | None,
    schema: T.StructType | None,
    existing_comments: DataFrame,
    *,
    window_start: str,
    window_end: str,
    date_col: str = "date_gmt",
    post_key: str = "id",
    comment_key: str = "id",
) -> tuple[DataFrame, DataFrame]:
    """Daily comments ingest for posts in [window_start, window_end).

    Returns (rows_to_insert, manifest) — the manifest being the post
    ids that produced ≥1 comment (`snk-manifest`,
    ``comments_pipeline.py:45-49``). The driving key set stays
    distributed end to end; empty fetches vanish via the fan-out
    source's skip-empty guard.

    ``fetcher=None`` / ``schema=None`` use the reference's contract
    (``sources/contracts.py``): the stdlib per-post comments GET and
    the 17-column DDL schema.
    """
    if fetcher is None or schema is None:
        from tia_data_pipeline_spark.sources import contracts

        fetcher = fetcher if fetcher is not None else contracts.default_key_fetcher()
        schema = schema if schema is not None else contracts.COMMENTS_SCHEMA
    window_posts = posts_table.filter(
        (F.col(date_col) >= F.lit(window_start)) & (F.col(date_col) < F.lit(window_end))
    ).select(F.col(post_key).alias("post_id"))
    fetched = keyed_fanout_source(window_posts, "post_id", fetcher, schema)
    # persist before forking to_insert/manifest: both outputs derive
    # from this frame, and an unpersisted fan-out re-executes every
    # per-post REST GET per consumer — 2× API load, and the two actions
    # could observe DIFFERENT responses (a comment added between them
    # puts a post in the manifest whose rows are absent from the insert
    # set). Cache lifecycle: CacheManager holds it until unpersist or
    # session end — a long-lived driver looping windows should
    # unpersist the returned frames (or clearCache) between runs.
    fetched = fetched.persist()
    # the fan-out's driving-key helper column is not part of the sink
    # contract (the record's own `post` field carries it — the
    # reference's load inserts exactly the DDL columns); keep it only
    # if the declared schema names it.
    if "post_id" not in schema.fieldNames():
        rows = fetched.drop("post_id")
    else:  # pragma: no cover - schema that declares the key keeps it
        rows = fetched
    normalized = normalize_records(
        rows, text_col="content", ts_string_cols=("date_gmt", "editable_until")
    )
    to_insert = incremental_append(normalized, existing_comments, keys=[comment_key])
    manifest = fetched.select("post_id").distinct()
    return to_insert, manifest


def comments_pipeline_streaming(
    spark: SparkSession,
    posts_stream: DataFrame,
    fetcher: KeyFetcher | None,
    schema: T.StructType | None,
    *,
    url: str,
    table: str,
    checkpoint: str,
    post_key: str = "id",
    comment_key: str = "id",
    available_now: bool = True,
):
    """The daily keyed fan-out pipeline as ONE continuous job — the
    streaming mirror of :func:`comments_pipeline`
    (reference ``comments_pipeline.py:107``), shaped like
    :func:`posts_pipeline_streaming` + ``stream_upsert_jdbc``.

    ``posts_stream`` is a STREAMING frame of parent posts standing in
    for the reference's 'yesterday's posts' sink query: instead of a
    scheduler recomputing a wall-clock window daily, whatever parents
    arrive in a micro-batch ARE that batch's window. Per micro-batch:
    distinct parent keys → keyed fan-out comments fetch (the driving
    key set stays distributed, ``sources/rest.py``) → normalize (same
    ``date_gmt``/``editable_until`` ts-norm as the batch form — one
    comment ingested both ways must store identical bytes) → keyed
    MERGE into the JDBC sink. Checkpointed offsets make the stream
    at-least-once; the MERGE makes replay harmless — exactly-once
    table contents, the same two-layer idempotency as
    ``streaming/sinks.py``. Returns the started StreamingQuery.

    ``fetcher=None`` / ``schema=None`` use the reference's contract
    (``sources/contracts.py``), as in the batch form."""
    from tia_data_pipeline_spark.sources.jdbc import jdbc_ensure_table, jdbc_merge_upsert

    if fetcher is None or schema is None:
        from tia_data_pipeline_spark.sources import contracts

        fetcher = fetcher if fetcher is not None else contracts.default_key_fetcher()
        schema = schema if schema is not None else contracts.COMMENTS_SCHEMA

    # Ensure the sink table ONCE before the stream starts (the
    # normalized schema is a pure function of the declared record
    # schema — derive it from an empty frame), not per micro-batch.
    norm_schema = normalize_records(
        spark.createDataFrame([], schema),
        text_col="content",
        ts_string_cols=("date_gmt", "editable_until"),
    ).schema
    jdbc_ensure_table(spark, url, table, norm_schema, [comment_key])

    def write_batch(batch_posts: DataFrame, batch_id: int) -> None:
        window_posts = batch_posts.select(F.col(post_key).alias("post_id")).distinct()
        fetched = keyed_fanout_source(window_posts, "post_id", fetcher, schema)
        rows = fetched if "post_id" in schema.fieldNames() else fetched.drop("post_id")
        normalized = normalize_records(
            rows, text_col="content", ts_string_cols=("date_gmt", "editable_until")
        )
        jdbc_merge_upsert(normalized, url, table, [comment_key])

    writer = posts_stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def rollup_daily_incremental(
    spark: SparkSession,
    events: DataFrame,
    new_batch: DataFrame,
    rollup_path: str,
    *,
    ts_col: str = "ts",
) -> None:
    """Incrementally maintain the daily rollup table — the reference's
    daily semantic (`inc-window`: recompute yesterday's window, upsert
    by day; ``comments_pipeline.py:27-33,107``) generalized to ANY set
    of affected days and a lakehouse target.

    Correctness rule: a day's rollup row is always recomputed from ALL
    of that day's events (never combined from partial aggregates), so
    late-arriving batches converge to the batch answer — applying
    batches in any order ends at ``daily_window(all events)``. The
    affected-day set comes from the new batch; at scale the
    events-side join is a partition prune (events partitioned by day),
    so each run touches only the dirty days, and the upsert is the
    table-format MERGE (`sources/lakehouse.py`).

    Property-tested: sequential batches ≡ one batch
    (tests/test_pipelines.py).
    """
    from tia_data_pipeline_spark.operators.windows import daily_window
    from tia_data_pipeline_spark.sources.lakehouse import merge_upsert_table

    # try_to_timestamp, not cast: ts_col is a PARSE PATH when callers
    # pass string timestamps (normalize_records passes non-19-char API
    # garbage through untouched), and an ANSI cast would abort the
    # whole rollup on one malformed value. The conversion is applied
    # PER FRAME and the typed column replaces ts_col in BOTH frames
    # before anything else touches it — the first fix parsed only the
    # affected-day expression, and the malformed row (NULL day via
    # eqNullSafe) still reached daily_window's F.window over the raw
    # string, where Spark's implicit ANSI cast aborted anyway
    # (review r7, live repro). A malformed ts becomes a NULL
    # timestamp, which daily_window's stated NULL-ts precondition
    # then drops.
    def _typed(df: DataFrame) -> DataFrame:
        if dict(df.dtypes).get(ts_col) == "string":
            return df.withColumn(ts_col, F.try_to_timestamp(F.col(ts_col)))
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))

    events, new_batch = _typed(events), _typed(new_batch)
    day = F.date_trunc("day", F.col(ts_col))
    affected_days = new_batch.select(day.alias("_day")).distinct()
    dirty = events.join(
        F.broadcast(affected_days), day.eqNullSafe(F.col("_day")), "left_semi"
    )
    rollup = daily_window(dirty, ts_col=ts_col)
    merge_upsert_table(spark, rollup, rollup_path, keys=["day"], update_on_match=True)
