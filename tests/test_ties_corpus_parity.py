"""Tie-saturation robustness: every single-family contract query must
stay engine-parity on a corpus where EVERY ranking measure collides.

CLAUDE.md pins "tiebreak every row_number/limit", but the driver corpus
has enough natural variance that an under-tiebroken rank can pass for
rounds before two rows actually collide. These corpora make every
metric tie by construction — identical texts, identical per-user
activity patterns, identical timestamps across users, identical
embedding vectors, constant measures across the relational star
schema — so any rank, top-k boundary, or limit whose sort key is not
a total order picks engine-dependent winners immediately.

Structure mirrors tests/test_null_corpus_parity.py: one synthesized
corpus per table family, swept over the registry slice so new queries
inherit the check automatically.
"""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.oracle import (
    assert_parity,
    family_queries as _family_queries,
    sql_mentions_table,
)
from tia_data_pipeline_spark import plans
from tia_data_pipeline_spark.catalog import TABLES as _ALL_TABLES


# ---------------------------------------------------------------------------
# documents: 25 identical texts across 3 sources — every per-doc score,
# per-source aggregate, shingle df, and quality metric ties, and the
# corpus is LARGER than every top-k cutoff so limits cut through ties.
# ---------------------------------------------------------------------------

# 110 distinct tokens, each appearing exactly twice, over 25 identical
# docs: larger than every document top-k cutoff (vocab-coverage 100,
# burstiness/collocations/BM25/group-sample 20), so LIMIT boundaries
# cut THROUGH fully tied rows — a missing tiebreak picks
# engine-dependent winners instead of returning the whole (sorted-
# equal) set.
_TIES_TEXT = " ".join(f"tok{i:03d}" for i in range(110)) + " " + " ".join(
    f"tok{i:03d}" for i in range(110)
)


@pytest.fixture(scope="module")
def ties_doc_sf(spark, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("ties_docs") / "sf")
    rows = [
        (i, _TIES_TEXT, "en", f"src{i % 3}", len(_TIES_TEXT)) for i in range(1, 26)
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


@pytest.fixture(scope="module")
def ties_doc_duck(ties_doc_sf):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{ties_doc_sf}/documents.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", _family_queries("documents"))
def test_doc_query_parity_on_ties_corpus(spark, ties_doc_sf, ties_doc_duck, name):
    q = plans.REGISTRY[name]
    assert_parity(q.build(spark, ties_doc_sf), ties_doc_duck.sql(q.oracle), name)


# ---------------------------------------------------------------------------
# events: 6 users with IDENTICAL activity — same timestamps (to the
# microsecond), same counts, same types, same values, same day grid.
# Every per-user metric, per-day aggregate, and "latest" pick ties.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ties_events_sf(spark, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("ties_events") / "sf")
    rows = []
    eid = 0
    # four identical daily slots per user: view/click plus signup and
    # purchase/error anchors (a corpus with only view/click leaves the
    # as-of, funnel-stage-3 and range-join tie-sensitive picks
    # vacuously unexercised); per-user activity stays IDENTICAL so
    # every tie is preserved
    for day in (1, 2, 3):
        for hour, etype in (
            (9, "view"),
            (15, "click"),
            (18, "signup"),
            (21, "purchase" if day % 2 == 1 else "error"),
        ):
            for user in range(6):
                rows.append(
                    (
                        eid,
                        datetime(2024, 3, day, hour, 30),
                        user,
                        etype,
                        2.5,
                        '{"k":1}',
                    )
                )
                eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    return sf


@pytest.fixture(scope="module")
def ties_events_duck(ties_events_sf):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{ties_events_sf}/events.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", _family_queries("events"))
def test_event_query_parity_on_ties_corpus(
    spark, ties_events_sf, ties_events_duck, name
):
    q = plans.REGISTRY[name]
    assert_parity(q.build(spark, ties_events_sf), ties_events_duck.sql(q.oracle), name)


# ---------------------------------------------------------------------------
# embeddings: 16 IDENTICAL vectors — every pairwise similarity is the
# same, so every kNN/ANN top-k boundary is pure tiebreak.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ties_emb_sf(spark, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("ties_emb") / "sf")
    vec = [(1.0 if i % 2 == 0 else -0.5) for i in range(64)]
    rows = [(i, vec, i % 2) for i in range(16)]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")
    return sf


@pytest.fixture(scope="module")
def ties_emb_duck(ties_emb_sf):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{ties_emb_sf}/embeddings.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", _family_queries("embeddings"))
def test_embedding_query_parity_on_ties_corpus(
    spark, ties_emb_sf, ties_emb_duck, name
):
    q = plans.REGISTRY[name]
    assert_parity(q.build(spark, ties_emb_sf), ties_emb_duck.sql(q.oracle), name)


# ---------------------------------------------------------------------------
# relational star schema: every measure, date, and status column is a
# CONSTANT — every order total, line price, account balance, and ship
# date collides, so any rank/top-k/limit over the star schema whose
# sort key is not key-tiebroken picks engine-dependent winners.
# Keys and FK structure stay intact (joins still resolve).
# ---------------------------------------------------------------------------

_REL_CONST = {
    "orders": {
        "o_orderstatus": "'O'",
        "o_totalprice": "100000.0",
        # INSIDE the 1996 windows every merge/incremental/flagship
        # query filters on (1995-06-15 sat outside them all, running
        # the whole family on zero rows — vacuous ties). A block of
        # keys retargets to 1997 below so the >=1997 queries also see
        # tied in-window rows.
        "o_orderdate": "TIMESTAMP '1996-01-20 00:00:00'",
        "o_orderpriority": "'3-MEDIUM'",
    },
    "lineitem": {
        "l_quantity": "25.0",
        "l_extendedprice": "30000.0",
        "l_discount": "0.05",
        "l_tax": "0.04",
        "l_returnflag": "'N'",
        "l_linestatus": "'O'",
        "l_shipdate": "TIMESTAMP '1995-07-01 00:00:00'",
    },
    "customer": {"c_acctbal": "5000.0", "c_mktsegment": "'BUILDING'"},
    "supplier": {"s_acctbal": "5000.0"},
    "part": {"p_size": "20", "p_retailprice": "1500.0"},
}


def _relational_queries():
    rel = tuple(
        t for t in _ALL_TABLES if t not in ("documents", "events", "embeddings")
    )
    return [
        name
        for name, q in plans.REGISTRY.items()
        if q.oracle is not None
        and any(sql_mentions_table(t, q.oracle) for t in rel)
    ]


@pytest.fixture(scope="module")
def ties_rel_sf(spark, tmp_path_factory):
    from tests.conftest import SMOKE_SF
    from tia_data_pipeline_spark.catalog import TABLES, load_table

    sf = str(tmp_path_factory.mktemp("ties_rel") / "sf")
    for t in TABLES:
        df = load_table(spark, SMOKE_SF, t)
        for col, const in _REL_CONST.get(t, {}).items():
            df = df.withColumn(col, F.expr(f"CAST({const} AS {df.schema[col].dataType.simpleString()})"))
        if t == "orders":
            df = df.withColumn(
                "o_orderdate",
                F.when(
                    F.col("o_orderkey") % 7 == 0,
                    F.expr("TIMESTAMP '1997-03-01 00:00:00'"),
                ).otherwise(F.col("o_orderdate")),
            )
        df.write.mode("overwrite").parquet(f"{sf}/{t}.parquet")
    return sf


@pytest.fixture(scope="module")
def ties_rel_duck(ties_rel_sf):
    from tia_data_pipeline_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{ties_rel_sf}/{t}.parquet/*.parquet')"
        )
    return con


@pytest.mark.parametrize("name", _relational_queries())
def test_relational_query_parity_on_ties_corpus(spark, ties_rel_sf, ties_rel_duck, name):
    """All-identical measures across the star schema: any rank/top-k
    whose ORDER BY is not a total order (key tiebreak) diverges here
    immediately — the q_topk_latest class CLAUDE.md pins."""
    q = plans.REGISTRY[name]
    assert_parity(q.build(spark, ties_rel_sf), ties_rel_duck.sql(q.oracle), name)
