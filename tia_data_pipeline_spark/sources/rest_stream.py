"""Streaming Python DataSource: the reference's scheduled REST poll as
a real ``readStream`` source.

The reference polls 'the latest posts' hourly from Airflow
(``posts_pipeline.py:63``) — an external scheduler driving a batch
pull. Spark 4's Python streaming data source moves the poll loop into
the engine: each micro-batch is one poll, offsets are the poll
counter, and the scheduler collapses into a trigger
(``processingTime='1 hour'`` ≙ @hourly; ``availableNow`` for catch-up).
Exactly-once bookkeeping (which polls are ingested) comes from
checkpointed offsets instead of the reference's PK conflict-skip.

The fetch callable is injected by import path, as in
``rest_datasource.py``; ``demo_poll`` simulates a feed where new posts
appear over time.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

from tia_data_pipeline_spark.sources.rest_datasource import resolve_fetcher


def demo_poll(poll: int) -> list[dict]:
    """Deterministic synthetic feed: each poll reveals 5 new posts
    (ids strictly increasing, like a recency feed consumed forward)."""
    return [
        {"id": poll * 100 + i, "title": f"post {poll}-{i}", "word_count": (poll * 100 + i) % 53}
        for i in range(5)
    ]


class RestPollStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema, options):
        self.field_names = [f.name for f in schema.fields]
        self.fetcher_path = options.get(
            "fetcher", "tia_data_pipeline_spark.sources.rest_stream:demo_poll"
        )

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def _rows(self, poll: int):
        fetch = resolve_fetcher(self.fetcher_path)
        return [tuple(rec.get(n) for n in self.field_names) for rec in fetch(poll)]

    def read(self, start: dict):
        poll = start["poll"]
        return iter(self._rows(poll)), {"poll": poll + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay for recovery: re-fetch every poll in
        # range, STREAMED — a list would materialize the whole recovery
        # gap (thousands of polls after a long outage) on the driver
        def gen():
            for poll in range(start["poll"], end["poll"]):
                yield from self._rows(poll)

        return gen()


class RestPollStreamDataSource(DataSource):
    """``spark.readStream.format("rest_poll")``."""

    @classmethod
    def name(cls) -> str:
        return "rest_poll"

    def simpleStreamReader(self, schema) -> RestPollStreamReader:
        return RestPollStreamReader(schema, self.options)
