"""Sources: REST fan-out with injected fetchers, JSON staging round-
trip with corrupt-record capture, ingest façade composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tia_data_pipeline_spark.sources.files import read_json_records, write_json_records
from tia_data_pipeline_spark.sources.rest import keyed_fanout_source, paginated_rest_source

POST_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("title", T.StringType()),
    ]
)


def test_paginated_rest_source(spark):
    def fetcher(page: int):
        if page > 3:
            return []
        return [{"id": page * 10 + i, "title": f"p{page}-{i}"} for i in range(2)]

    df = paginated_rest_source(spark, fetcher, n_pages=5, schema=POST_SCHEMA)
    rows = df.collect()
    assert len(rows) == 6  # pages 4,5 empty
    assert {r["id"] for r in rows} == {10, 11, 20, 21, 30, 31}


def test_keyed_fanout_source_skips_empty(spark):
    keys = spark.createDataFrame([(1,), (2,), (3,)], "post_id bigint")

    def fetcher(post_id):
        if post_id == 2:
            return []  # the empty-comments guard (comments_pipeline.py:41)
        return [{"id": post_id * 100, "title": f"c-of-{post_id}"}]

    df = keyed_fanout_source(keys, "post_id", fetcher, POST_SCHEMA)
    rows = df.collect()
    assert {r["post_id"] for r in rows} == {1, 3}
    assert {r["id"] for r in rows} == {100, 300}


def test_json_staging_roundtrip_and_corrupt_record(spark, tmp_path):
    good = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, title string")
    path = str(tmp_path / "stage")
    write_json_records(good, path)
    back = read_json_records(spark, path, POST_SCHEMA).cache()
    assert back.filter(F.col("_corrupt_record").isNotNull()).count() == 0
    assert sorted(r["id"] for r in back.select("id").collect()) == [1, 2]

    # malformed line lands in _corrupt_record instead of failing
    # (.cache(): Spark disallows querying only the corrupt-record column
    # straight off a raw file scan)
    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    (bad_dir / "x.json").write_text('{"id": 1, "title": "ok"}\n{not json at all\n')
    parsed = read_json_records(spark, str(bad_dir), POST_SCHEMA).cache()
    assert parsed.filter(F.col("_corrupt_record").isNotNull()).count() == 1
    assert parsed.filter(F.col("id") == 1).count() == 1


def test_read_json_records_does_not_mutate_caller_schema(spark, tmp_path):
    """Regression: the corrupt-record column must be added to a copy —
    StructType.add mutates in place, silently growing a schema object
    the caller reuses."""
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("id", T.LongType())])
    path = str(tmp_path / "one.json")
    write_json_records(spark.range(3).withColumnRenamed("id", "id"), path)
    read_json_records(spark, path, schema).collect()
    assert schema.names == ["id"]


def test_keyed_fanout_empty_marker_rows(spark):
    """skip_empty=False emits one NULL-record marker row per empty key,
    distinguishing 'fetched, empty' from 'never fetched'."""
    keys = spark.createDataFrame([(1,), (2,)], "post_id bigint")

    def fetcher(post_id):
        return [] if post_id == 2 else [{"id": 100, "title": "t"}]

    rows = keyed_fanout_source(keys, "post_id", fetcher, POST_SCHEMA, skip_empty=False).collect()
    by_key = {r["post_id"]: r for r in rows}
    assert set(by_key) == {1, 2}
    assert by_key[1]["id"] == 100
    assert by_key[2]["id"] is None and by_key[2]["title"] is None


def test_keyed_fanout_key_declared_in_schema_no_duplicate_column(spark):
    """Review r5: a record schema that itself declares the driving key
    must yield ONE column of that name (the record's own field), not an
    ambiguous duplicate with the helper key column."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [T.StructField("post_id", T.LongType()), T.StructField("body", T.StringType())]
    )
    keys = spark.createDataFrame([(1,), (2,)], "post_id bigint")

    def fetcher(post_id):
        return [{"post_id": post_id, "body": f"b{post_id}"}]

    df = keyed_fanout_source(keys, "post_id", fetcher, schema)
    assert df.columns == ["post_id", "body"]
    got = sorted((r["post_id"], r["body"]) for r in df.collect())
    assert got == [(1, "b1"), (2, "b2")]


def test_keyed_fanout_null_and_integral_keys(spark):
    """Review r5: a NULL in a nullable bigint key column promotes the
    pandas batch to float64 — the fetcher must receive real ints (not
    1.0 / NaN), and NULL keys are skipped (nothing to fetch)."""
    keys = spark.createDataFrame([(1,), (None,), (2,)], "post_id bigint")
    seen = []

    def fetcher(post_id):
        seen.append(post_id)
        assert isinstance(post_id, int), f"fetcher got {type(post_id).__name__}"
        return [{"id": post_id * 100, "title": f"c{post_id}"}]

    df = keyed_fanout_source(keys, "post_id", fetcher, POST_SCHEMA)
    assert {r["post_id"] for r in df.collect()} == {1, 2}
