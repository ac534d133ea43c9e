"""NULL/empty-text robustness: every documents-only contract query
must stay engine-parity on a corpus containing NULL and empty texts.

The driver corpus has zero NULL texts, so the sf0.01 gate can never
exercise these paths — yet four latent divergences (feature-hash
render, spurious chunking rows, fingerprint NULL-vs-0, fertility/boost
ANSI divide-by-zero) were found exactly here in round 5. This suite
synthesizes the hostile corpus once and sweeps the whole registry
slice so new document queries inherit the check automatically."""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle import assert_parity
from tia_data_pipeline_spark import plans

_OTHER_TABLES = ("embeddings", "events", "orders", "lineitem", "customer",
                 "supplier", "nation", "region", "part")


def _doc_only_queries():
    return [
        name
        for name, q in plans.REGISTRY.items()
        if q.oracle is not None
        and "documents" in q.oracle
        and not any(t in q.oracle for t in _OTHER_TABLES)
    ]


@pytest.fixture(scope="module")
def null_sf(spark, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("null_corpus") / "sf")
    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "src0", 50),
            (2, None, "en", "src1", 0),
            (3, "", "de", "src2", 0),
            (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "src3", 50),
            (5, "one two three four five six seven eight nine ten", "fr", "src4", 40),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


@pytest.fixture(scope="module")
def null_duck(null_sf):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{null_sf}/documents.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", _doc_only_queries())
def test_query_parity_on_null_corpus(spark, null_sf, null_duck, name):
    q = plans.REGISTRY[name]
    assert_parity(q.build(spark, null_sf), null_duck.sql(q.oracle), name)


_EVENT_OTHER = ("documents", "embeddings", "orders", "lineitem", "customer",
                "supplier", "nation", "region", "part")


def _event_only_queries():
    return [
        name
        for name, q in plans.REGISTRY.items()
        if q.oracle is not None
        and "events" in q.oracle
        and not any(t in q.oracle for t in _EVENT_OTHER)
    ]


@pytest.fixture(scope="module")
def null_events_sf(spark, tmp_path_factory):
    from datetime import datetime

    sf = str(tmp_path_factory.mktemp("null_events") / "sf")
    rows = []
    for i in range(40):
        rows.append(
            (i, datetime(2024, 3, 1 + i % 5, 8 + i % 10, i % 60), i % 7,
             ["view", "click", "purchase"][i % 3], float(i % 13) + 0.25, '{"k":1}')
        )
    rows += [
        (100, datetime(2024, 3, 2, 9, 0), None, "view", 1.5, None),  # NULL user
        (101, datetime(2024, 3, 2, 9, 5), 3, None, 2.5, None),       # NULL type
        (102, datetime(2024, 3, 2, 9, 6), 3, "click", None, None),   # NULL value
        (103, None, 4, "view", 3.5, None),                           # NULL ts
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    return sf


@pytest.fixture(scope="module")
def null_events_duck(null_events_sf):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{null_events_sf}/events.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", _event_only_queries())
def test_event_query_parity_on_null_corpus(spark, null_events_sf, null_events_duck, name):
    """NULL ts/user/value/event_type rows: NULL ordering diverges
    across engines (Spark NULLS FIRST asc, DuckDB NULLS LAST) and NULL
    window groups differ between F.window and date_trunc — every
    event query states its event-time preconditions explicitly on both
    sides, pinned here."""
    q = plans.REGISTRY[name]
    assert_parity(q.build(spark, null_events_sf), null_events_duck.sql(q.oracle), name)
