"""Spark 4 Python DataSource: one task per REST page, schema-on-read,
downstream relational ops compose (the reference's 'latest 30' = top-k
over the feed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tia_data_pipeline_spark.sources.rest_datasource import RestPagesDataSource, demo_fetch


def _feed(spark, n_pages=5):
    spark.dataSource.register(RestPagesDataSource)
    return (
        spark.read.format("rest_pages")
        .schema("id bigint, title string, word_count int")
        .option("n_pages", str(n_pages))
        .load()
    )


def test_reads_all_pages_in_parallel_partitions(spark):
    df = _feed(spark)
    assert df.count() == 150  # 5 pages × 30
    assert df.rdd.getNumPartitions() == 5  # one partition per page
    assert df.select(F.max("id")).first()[0] == 10_000


def test_empty_pages_yield_no_rows(spark):
    assert _feed(spark, n_pages=8).count() == 150  # pages 6-8 empty


def test_latest_30_composes_on_top(spark):
    latest = _feed(spark).orderBy(F.col("id").desc()).limit(30).collect()
    expect = sorted((r["id"] for r in demo_fetch(1)), reverse=True)[:30]
    assert [r["id"] for r in latest] == expect
