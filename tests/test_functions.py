"""Unit tier (SURVEY §5.2): CPython/reference parity of the scalar
normalization ops on adversarial inputs."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tia_data_pipeline_spark.functions.text import (
    normalize_iso_timestamp,
    parse_iso_timestamp,
    tokens,
    word_count,
)
from tia_data_pipeline_spark.ingest import normalize_records

# FIXTURES.md §B edge rows — ASCII whitespace cases must match CPython
# str.split() exactly (the pinned semantics; unicode spaces диverge by
# design and are excluded from the parity claim).
WORD_COUNT_CASES = [
    "",
    "   ",
    "a",
    "a b  c",
    "tab\tnl\nmix",
    " leading",
    "trailing ",
    "\t\n\x0b\f\r",
    "a\x0bb",
    "many   spaces   between   words",
]


def test_word_count_matches_cpython_split(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(WORD_COUNT_CASES)], "i int, content string")
    got = {
        r["i"]: r["wc"]
        for r in df.select("i", word_count(F.col("content")).alias("wc")).collect()
    }
    for i, s in enumerate(WORD_COUNT_CASES):
        assert got[i] == len(s.split()), f"case {s!r}: spark {got[i]} vs cpython {len(s.split())}"


def test_word_count_null_is_null(spark):
    df = spark.createDataFrame([(1, None)], "i int, content string")
    assert df.select(word_count(F.col("content")).alias("wc")).collect()[0]["wc"] is None


def test_tokens_empty_returns_empty_array(spark):
    df = spark.createDataFrame([("",), ("  ",)], "content string")
    rows = df.select(tokens(F.col("content")).alias("t")).collect()
    assert all(r["t"] == [] for r in rows)


# ts-norm: only 19-char bare-ISO strings are rewritten
# (posts_pipeline.py:38 checks len==19 and value[10]=='T').
TS_CASES = [
    ("2022-01-01T01:00:00", "2022-01-01 01:00:00"),  # normalized
    ("2022-01-01 01:00:00", "2022-01-01 01:00:00"),  # already normal
    ("2022-01-01T01:00:00.123", "2022-01-01T01:00:00.123"),  # len≠19 → untouched
    ("2022-01-01T01:00:00Z", "2022-01-01T01:00:00Z"),  # len≠19 → untouched
    ("not a timestamp", "not a timestamp"),
]


def test_ts_normalize_matches_reference(spark):
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(TS_CASES)], "i int, ts string")
    got = {
        r["i"]: r["out"]
        for r in df.select("i", normalize_iso_timestamp(F.col("ts")).alias("out")).collect()
    }
    for i, (_, expect) in enumerate(TS_CASES):
        assert got[i] == expect


def test_parse_iso_timestamp_both_forms(spark):
    df = spark.createDataFrame(
        [("2022-01-01T01:00:00",), ("2022-01-01 01:00:00",)], "ts string"
    )
    rows = df.select(parse_iso_timestamp(F.col("ts")).alias("p")).collect()
    assert rows[0]["p"] == rows[1]["p"]
    assert rows[0]["p"].year == 2022


def test_normalize_records_schema_driven(spark):
    """The whole transform stage (json-ser + ts-norm + word-count) in
    one projection, against a posts-shaped nested record."""
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("date_gmt", T.StringType()),
            T.StructField("content", T.StringType()),
            T.StructField("author", T.StructType([T.StructField("id", T.IntegerType()), T.StructField("display_name", T.StringType())])),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ]
    )
    df = spark.createDataFrame(
        [(1, "2022-01-01T01:00:00", "hello  world", (7, "dd"), ["a", "b"])], schema
    )
    out = normalize_records(df, text_col="content", ts_string_cols=["date_gmt"]).collect()[0]
    assert out["date_gmt"] == "2022-01-01 01:00:00"
    assert out["word_count"] == 2
    assert json.loads(out["author"]) == {"id": 7, "display_name": "dd"}
    assert json.loads(out["tags"]) == ["a", "b"]
    # scalars untouched
    assert out["id"] == 1 and out["content"] == "hello  world"
