"""Catalog DDL + staging lifecycle (SURVEY ops snk-ddl, snk-cleanup)."""

from __future__ import annotations

import os

from tia_data_pipeline_spark.catalog import ensure_table, load_table, remove_staging
from tests.conftest import SMOKE_SF


def test_ensure_table_idempotent(spark, tmp_path):
    path = str(tmp_path / "regions")
    load_table(spark, SMOKE_SF, "region").write.parquet(path)
    t1 = ensure_table(spark, "region_tbl", path)
    t2 = ensure_table(spark, "region_tbl", path)  # IF NOT EXISTS: no-op
    assert t1.count() == t2.count() == 5
    assert spark.catalog.tableExists("region_tbl")
    spark.sql("DROP TABLE region_tbl")


def test_remove_staging(spark, tmp_path):
    path = str(tmp_path / "stage")
    load_table(spark, SMOKE_SF, "region").write.json(path)
    assert os.path.exists(path)
    assert remove_staging(spark, path) is True
    assert not os.path.exists(path)
    # deleting a missing path is a clean False, not an error
    assert remove_staging(spark, path) is False


def test_ns_to_us_matches_duckdb_for_negative_ns(spark, tmp_path):
    """The catalog's ns→µs conversion (`ts div 1000`, truncation toward
    zero) must match DuckDB's TIMESTAMP_NS→TIMESTAMP cast for pre-1970
    values too. Measured DuckDB: -1 ns → 0 µs, -1500 ns → -1 µs — i.e.
    truncation, NOT floor (floor would give -1 and -2)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    ns_vals = [-1, -1500, -999, -1000, 1500, 1_700_000_000_123_456_789]
    path = str(tmp_path / "ns_events.parquet")
    pq.write_table(
        pa.table({"ts": pa.array(ns_vals, type=pa.timestamp("ns"))}), path
    )

    raw = spark.read.parquet(path)  # bigint ns under nanosAsLong
    spark_us = [
        r["us"]
        for r in raw.select(
            F.unix_micros(F.timestamp_micros(F.expr("ts div 1000"))).alias("us")
        ).collect()
    ]
    duck_us = [
        r[0]
        for r in duckdb.connect()
        .execute(f"SELECT epoch_us(ts::TIMESTAMP) FROM read_parquet('{path}') ORDER BY ts")
        .fetchall()
    ]
    assert sorted(spark_us) == sorted(duck_us) == [-1, -1, 0, 0, 1, 1_700_000_000_123_456]
