"""Compatibility tier — stateless ops (SURVEY §2.6, step 1).

Each query is the test-schema projection of a reference semantic; the
reference citation lives in ``covers`` (ids defined in SURVEY §2).
All scans stay declarative so Catalyst pushes filters/projections into
the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tia_data_pipeline_spark.catalog import load_table
from tia_data_pipeline_spark.functions import text as TX
from tia_data_pipeline_spark.plans.contract import contract_query


@contract_query(
    "q_scan_project",
    oracle="SELECT l_orderkey, l_quantity, l_extendedprice FROM lineitem",
    covers="src-json-file→parquet scan, column pruning",
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection scan — column pruning reaches the parquet footer
    (ReadSchema lists exactly 3 of 11 columns)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )


@contract_query(
    "q_proj_alias",
    oracle="SELECT o_orderkey AS post_id FROM orders",
    covers="proj-alias (comments_pipeline.py:33)",
)
def q_proj_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`SELECT id AS post_id` analogue."""
    return load_table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("post_id"))


@contract_query(
    "q_filter_range",
    oracle=(
        "SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'"
    ),
    covers="filter-range (comments_pipeline.py:33)",
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-open event-time range — pushed down to the parquet scan."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")


@contract_query(
    "q_const_probe",
    oracle="SELECT 1 AS is_accessible",
    covers="const-probe (posts_pipeline.py:79)",
)
def q_const_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`SELECT 1` connectivity probe → OneRowRelation."""
    return spark.sql("SELECT 1 AS is_accessible")


@contract_query(
    "q_word_count",
    oracle=(
        f"SELECT doc_id, {TX.word_count_sql('text')} AS word_count FROM documents"
    ),
    covers="word-count + col-derive (posts_pipeline.py:41)",
)
def q_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CPython `len(content.split())` parity via pinned whitespace class."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.word_count(F.col("text")).alias("word_count"))


@contract_query(
    "q_ts_normalize",
    oracle=(
        "SELECT event_id, "
        "strftime(ts::TIMESTAMP, '%Y-%m-%dT%H:%M:%S') AS ts_iso, "
        "strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS ts_norm "
        "FROM events"
    ),
    covers="ts-norm (posts_pipeline.py:38-39)",
)
def q_ts_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render events.ts in the API's bare-ISO form, then apply the
    reference's 19-char T→space rewrite.

    Stated domain bound (review r7): the Spark side rewrites T→space
    only for EXACTLY-19-char renders (the reference's guard), while
    the oracle's strftime always emits the space — a year ≥ 10000
    renders 20 chars and would diverge. No such timestamp exists in
    any corpus or hostile sweep (pre-1970 is the stressed direction);
    if a far-future dimension is ever added, the sweep must carry the
    19-char guard on the oracle side too."""
    events = load_table(spark, sf_dir, "events")
    iso = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss")
    return events.select(
        "event_id",
        iso.alias("ts_iso"),
        TX.normalize_iso_timestamp(iso).alias("ts_norm"),
    )


@contract_query(
    "q_json_ser",
    oracle=(
        "SELECT doc_id, "
        "to_json(struct_pack(doc_id := doc_id, lang := lang, source := source)) AS meta_json "
        "FROM documents"
    ),
    covers="json-ser (posts_pipeline.py:36-37)",
)
def q_json_ser(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested value → compact JSON string at the sink boundary."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.to_json(F.struct("doc_id", "lang", "source")).alias("meta_json"),
    )
