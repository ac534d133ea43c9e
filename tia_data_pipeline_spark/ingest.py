"""Ingestion façade: the reference's transform+load stage as two
declarative functions.

``normalize_records`` is the whole of ``transform_posts_json``
(``posts_pipeline.py:29-44``) / ``transform_comments_json``
(``comments_pipeline.py:52-78``) — nested→JSON serialization, bare-ISO
timestamp normalization, derived word_count — applied schema-driven
instead of per-record type sniffing. ``incremental_load`` is the load
stage's `ON CONFLICT DO NOTHING` invariant (see operators/incremental).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tia_data_pipeline_spark.functions.text import (
    json_serialize_nested,
    normalize_iso_timestamp,
    word_count,
)
from tia_data_pipeline_spark.operators.incremental import incremental_append


def normalize_records(
    df: DataFrame,
    *,
    text_col: str | None = "content",
    ts_string_cols: Sequence[str] = (),
) -> DataFrame:
    """Schema-driven record normalization (SURVEY §2.2, all four ops).

    - every nested (struct/array/map) column → compact JSON string
      (`json-ser`, ``posts_pipeline.py:36-37``);
    - each named string column in ``ts_string_cols`` gets the 19-char
      bare-ISO ``T``→space rewrite (`ts-norm`, ``posts_pipeline.py:38-39``);
    - ``word_count`` derived from ``text_col`` (`word-count`/
      `col-derive`, ``posts_pipeline.py:41``).

    One projection; every op is a Catalyst expression, so the whole
    normalization is a single codegen'd map stage regardless of width.
    """
    # engine-wide bare-session rule: json_serialize_nested's byte-level
    # contract needs jsonGenerator.ignoreNullFields=false, but the REST
    # pipelines never traverse catalog.load_table where it is otherwise
    # pinned — a caller-provided session (Spark's getOrCreate ignores
    # builder confs on a pre-existing session) would silently omit NULL
    # struct fields and break the reference-byte parity.
    from tia_data_pipeline_spark.catalog import _ensure_session_confs

    _ensure_session_confs(df.sparkSession)
    cols: list = []
    for field in df.schema.fields:
        c: F.Column = json_serialize_nested(df.schema, field.name)
        if field.name in ts_string_cols and isinstance(field.dataType, T.StringType):
            c = normalize_iso_timestamp(F.col(field.name))
        cols.append(c.alias(field.name))
    out = df.select(*cols)
    if text_col is not None and text_col in df.columns:
        out = out.withColumn("word_count", word_count(F.col(text_col)))
    return out


def incremental_load(
    incoming: DataFrame, existing: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Rows that an idempotent append would actually insert — running
    the same batch twice yields zero (property-tested)."""
    return incremental_append(incoming, existing, keys)
