"""Spark 4 Python DataSource for paginated REST APIs.

The `src-rest-page` operator (reference ``posts_pipeline.py:23-27``)
as a first-class connector: ``spark.read.format("rest_pages")`` with
one input partition per page, so a backfill parallelizes across the
cluster and Spark owns task retry per page (the reference's Airflow
retry policy, per-partition instead of per-DAG).

The fetch callable is referenced by import path (``module:function``)
because DataSource options are strings and the reader deserializes on
executors. ``demo_fetch`` is a deterministic synthetic API used by
tests and smoke runs.

Usage::

    spark.dataSource.register(RestPagesDataSource)
    (spark.read.format("rest_pages")
        .schema("id bigint, title string")
        .option("n_pages", "100")
        .option("fetcher", "my_pkg.api:fetch_page")
        .load())
"""

from __future__ import annotations

import importlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def resolve_fetcher(path: str):
    """'module.sub:func' → callable(page:int) -> list[dict]."""
    mod_name, _, fn_name = path.partition(":")
    return getattr(importlib.import_module(mod_name), fn_name)


def demo_fetch(page: int) -> list[dict]:
    """Deterministic synthetic 'latest posts' API: 30 posts per page,
    5 pages, ids descending like a recency feed."""
    if page > 5:
        return []
    per_page = 30
    top_id = 10_000 - (page - 1) * per_page
    return [
        {
            "id": top_id - i,
            "title": f"post {top_id - i}",
            "word_count": (top_id - i) % 97,
        }
        for i in range(per_page)
    ]


class PagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


class RestPagesReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.n_pages = int(options.get("n_pages", "1"))
        self.fetcher_path = options.get(
            "fetcher", "tia_data_pipeline_spark.sources.rest_datasource:demo_fetch"
        )
        self.field_names = [f.name for f in schema.fields]

    def partitions(self) -> list[PagePartition]:
        return [PagePartition(p) for p in range(1, self.n_pages + 1)]

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        fetch = resolve_fetcher(self.fetcher_path)
        for rec in fetch(partition.page):
            yield tuple(rec.get(name) for name in self.field_names)


class RestPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest_pages"

    def reader(self, schema) -> RestPagesReader:
        return RestPagesReader(schema, self.options)
