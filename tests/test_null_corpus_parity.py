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

from tests.oracle import (
    assert_parity,
    family_queries as _family_queries,
    sql_mentions_table,
)
from tia_data_pipeline_spark import plans
from tia_data_pipeline_spark.catalog import TABLES as _ALL_TABLES


def _doc_only_queries():
    return _family_queries("documents")


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
            # src1 is deliberately MULTI-doc with doc 2's NULL text among
            # real docs: rank windows that fail to filter NULL measurements
            # shift every non-null rank (Spark NULLS FIRST vs DuckDB NULLS
            # LAST) — the q_gini divergence class (round-6 advice).
            (6, "six seven eight nine ten eleven twelve", "en", "src1", None),
            (7, "alpha beta gamma delta epsilon", "en", "src1", 30),
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


def _event_only_queries():
    return _family_queries("events")


@pytest.fixture(scope="module")
def null_events_sf(spark, tmp_path_factory):
    from datetime import datetime

    sf = str(tmp_path_factory.mktemp("null_events") / "sf")
    rows = []
    # 10 distinct days (q_anomaly's 7-day full-window gate needs >= 7
    # days or its output is vacuously empty on this corpus)
    for i in range(40):
        rows.append(
            (i, datetime(2024, 3, 1 + i % 10, 8 + i % 10, i % 60), i % 7,
             ["view", "click", "purchase", "signup", "error"][i % 5],
             float(i % 13) + 0.25, '{"k":1}')
        )
    rows += [
        # a NULL-ts SIGNUP and an out-of-order purchase: exercises the
        # as-of join's NULL-ts precondition non-vacuously (a corpus
        # with no signup anchor makes every asof check vacuous)
        (104, None, 5, "signup", 1.0, None),
        (105, datetime(2024, 3, 3, 10, 0), 5, "purchase", 9.5, None),
        # two timestamped signups BEFORE that purchase: the as-of
        # anchor must resolve to the LATER one (a first_value or
        # dropped tiebreak regression flips this row)
        (106, datetime(2024, 3, 1, 8, 0), 5, "signup", 1.0, None),
        (107, datetime(2024, 3, 2, 8, 0), 5, "signup", 1.0, None),
        # an error within 15 min of user 3's rows 101/102 plus a
        # NULL-ts neighbor: the range join's interval predicate must
        # drop the NULL-ts row identically on both engines
        (108, datetime(2024, 3, 2, 9, 10), 3, "error", 1.0, None),
        (109, None, 3, "view", 1.0, None),
        # in-window rows for q_gap_fill's hard-pinned 2024-01-02 spine,
        # plus boundary rows one µs before / exactly at the cutoffs
        (110, datetime(2024, 1, 2, 0, 30), 1, "view", 1.0, None),
        (111, datetime(2024, 1, 2, 13, 5), 2, "click", 2.0, None),
        (112, datetime(2024, 1, 2, 13, 45), 2, "view", 2.0, None),
        (113, datetime(2024, 1, 1, 23, 59, 59, 999999), 1, "view", 1.0, None),
        (114, datetime(2024, 1, 3, 0, 0), 1, "view", 1.0, None),
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


_REL_TABLES = tuple(
    t for t in _ALL_TABLES if t not in ("documents", "events", "embeddings")
)


def _relational_queries():
    return [
        name
        for name, q in plans.REGISTRY.items()
        if q.oracle is not None
        and any(sql_mentions_table(t, q.oracle) for t in _REL_TABLES)
    ]


@pytest.fixture(scope="module")
def null_rel_sf(spark, tmp_path_factory):
    """The sf0.001 star schema plus hostile rows: NULL order/line keys,
    a NULL order date, a NULL supplier FK, a NULL customer key."""
    from tests.conftest import SMOKE_SF
    from tia_data_pipeline_spark.catalog import TABLES, load_table

    sf = str(tmp_path_factory.mktemp("null_rel") / "sf")
    for t in TABLES:
        df = load_table(spark, SMOKE_SF, t)
        if t in ("orders", "lineitem", "customer"):
            r = df.limit(1).collect()[0].asDict()
            extras = []
            if t == "orders":
                from datetime import datetime

                r2 = dict(r); r2["o_orderkey"] = 99999901; r2["o_orderdate"] = None
                # NULL key INSIDE the q_scd2 snapshot windows: exercises
                # the eqNullSafe merge legs non-vacuously (a NULL-key row
                # outside the windows never reaches them)
                r3 = dict(r); r3["o_orderkey"] = None
                r3["o_orderdate"] = datetime(1996, 1, 20)
                # genuine FK violation: o_custkey with no parent — with a
                # NULL c_custkey also present, a NOT IN oracle collapses
                # to zero violations where the anti-join counts one
                r4 = dict(r); r4["o_orderkey"] = 99999904
                r4["o_custkey"] = 888888888
                extras = [r2, r3, r4]
            elif t == "lineitem":
                r2 = dict(r); r2["l_orderkey"] = 99999902; r2["l_suppkey"] = None
                r3 = dict(r); r3["l_orderkey"] = None; r3["l_linenumber"] = 1
                # JOINABLE hostile row: keeps the first order's key so it
                # actually enters join/star/rollup paths (the orphan rows
                # above never match), with a NULL supplier FK and NULL
                # line number probing those queries' NULL handling
                r4 = dict(r); r4["l_linenumber"] = 99
                r4["l_suppkey"] = None; r4["l_partkey"] = None
                r5 = dict(r); r5["l_linenumber"] = None
                extras = [r2, r3, r4, r5]
            else:
                r2 = dict(r); r2["c_custkey"] = None
                extras = [r2]
            df = df.unionByName(spark.createDataFrame(extras, df.schema))
        df.write.mode("overwrite").parquet(f"{sf}/{t}.parquet")
    return sf


@pytest.fixture(scope="module")
def null_rel_duck(null_rel_sf):
    from tia_data_pipeline_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{null_rel_sf}/{t}.parquet/*.parquet')"
        )
    return con


@pytest.mark.parametrize("name", _relational_queries())
def test_relational_query_parity_on_null_corpus(spark, null_rel_sf, null_rel_duck, name):
    """NULL keys in the star schema: NOT IN collapses to zero rows on
    one NULL (the q_antijoin_incr oracle bug this suite caught), while
    the engine's merge family is deliberately null-safe — oracles must
    state NOT EXISTS / IS NOT DISTINCT FROM semantics."""
    q = plans.REGISTRY[name]
    assert_parity(q.build(spark, null_rel_sf), null_rel_duck.sql(q.oracle), name)


def _embedding_queries():
    return _family_queries("embeddings")


@pytest.fixture(scope="module")
def null_emb_sf(spark, tmp_path_factory):
    """sf0.001 embeddings plus a NULL vector, an all-zeros vector, and
    a NULL label."""
    from tests.conftest import SMOKE_SF
    from tia_data_pipeline_spark.catalog import load_table

    sf = str(tmp_path_factory.mktemp("null_emb") / "sf")
    emb = load_table(spark, SMOKE_SF, "embeddings")
    dim = len(emb.limit(1).collect()[0]["embedding"])
    base = emb.limit(1).collect()[0].asDict()
    extras = [
        {"vec_id": 990001, "embedding": None, "label": 1},
        {"vec_id": 990002, "embedding": [0.0] * dim, "label": 2},
        {"vec_id": 990003, "embedding": base["embedding"], "label": None},
        # the valid_vector precondition's three hazard shapes: an EMPTY
        # vector (len division aborts ANSI), a NaN component (nano-unit
        # floor()::BIGINT aborts both engines), and a NULL element
        # (DuckDB list_dot_product RAISES where Spark's fold buckets 0)
        {"vec_id": 990004, "embedding": [], "label": 1},
        {"vec_id": 990005, "embedding": [float("nan")] + [0.5] * (dim - 1), "label": 2},
        {"vec_id": 990006, "embedding": [None] + [0.5] * (dim - 1), "label": 1},
    ]
    emb.unionByName(spark.createDataFrame(extras, emb.schema)).write.parquet(
        f"{sf}/embeddings.parquet"
    )
    return sf


@pytest.fixture(scope="module")
def null_emb_duck(null_emb_sf):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{null_emb_sf}/embeddings.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", _embedding_queries())
def test_embedding_query_parity_on_null_corpus(spark, null_emb_sf, null_emb_duck, name):
    """NULL / zero-norm vectors: DuckDB's list_dot_product RAISES on a
    NULL list (the bucket oracles), Spark's sign-bit fold silently
    lands NULL vectors in bucket 0, and bare list_cosine_similarity
    returns -1.0 for zero norm — the LSH paths exclude NULL vectors
    explicitly and cosine_sql guards zero norms."""
    q = plans.REGISTRY[name]
    assert_parity(q.build(spark, null_emb_sf), null_emb_duck.sql(q.oracle), name)


@pytest.fixture(scope="module")
def historic_events_sf(spark, tmp_path_factory):
    """Events with NEGATIVE epochs (pre-1970), the epoch-0 boundary,
    odd microseconds and far-future (within pandas-ns range) — the
    corpus that exposed // (truncate toward zero) vs floor window
    alignment and INT64 product overflow before a HUGEINT sum."""
    from datetime import datetime

    sf = str(tmp_path_factory.mktemp("hist_events") / "sf")
    times = [
        datetime(1969, 12, 31, 23, 59, 59, 999999),
        datetime(1969, 7, 20, 20, 17, 40, 500001),
        datetime(1970, 1, 1, 0, 0, 0),
        datetime(1970, 1, 1, 0, 0, 0, 1),
        datetime(2200, 6, 15, 23, 47, 16, 854775),
        datetime(1900, 1, 1, 12, 30, 15, 123456),
    ]
    rows = []
    i = 0
    for t in times:
        for k in range(5):
            # user decoupled from type ((i + k) % 3, not k % 3): with
            # type a function of user, no user ever crossed types and
            # the funnel/as-of strict-ordering comparisons were never
            # exercised over pre-1970 timestamps
            rows.append(
                (i, t.replace(minute=(t.minute + k) % 60), (i + k) % 3,
                 ["view", "click", "purchase", "signup", "error"][k % 5],
                 float(k) + 0.25, None)
            )
            i += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    return sf


@pytest.fixture(scope="module")
def historic_events_duck(historic_events_sf):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{historic_events_sf}/events.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", _event_only_queries())
def test_event_query_parity_on_historic_timestamps(
    spark, historic_events_sf, historic_events_duck, name
):
    """Negative epochs: DuckDB's // and Spark's div both truncate
    toward zero while F.window FLOORS, so window-bucket oracles must
    state floor division via exact modulus subtraction; century time
    spans overflow INT64 per-term products, so moment oracles promote
    to HUGEINT before multiplying (matching Spark's decimal path)."""
    q = plans.REGISTRY[name]
    assert_parity(
        q.build(spark, historic_events_sf), historic_events_duck.sql(q.oracle), name
    )


@pytest.fixture(scope="module")
def extreme_values_sf(spark, tmp_path_factory):
    """Events with NaN, ±Inf, signed zero, rounding-boundary and
    1e12-magnitude values — the corpus that exposed ANSI cast aborts
    on NaN cents and INT64 overflow in the zscore oracle's cents²."""
    from datetime import datetime

    sf = str(tmp_path_factory.mktemp("extreme_vals") / "sf")
    vals = [0.005, -0.005, 2.675, 1e12, -1e12, 0.0, -0.0, 1.005,
            1234567.891, float("nan"), float("inf"), float("-inf")]
    rows = []
    i = 0
    for v in vals:
        for k in range(3):
            rows.append(
                (i, datetime(2024, 3, 1 + k, 9 + k, k), k % 4,
                 ["view", "click", "purchase"][k % 3], v, None)
            )
            i += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    return sf


@pytest.fixture(scope="module")
def extreme_values_duck(extreme_values_sf):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{extreme_values_sf}/events.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", _event_only_queries())
def test_event_query_parity_on_extreme_values(
    spark, extreme_values_sf, extreme_values_duck, name
):
    """Non-finite doubles are corrupt MEASUREMENTS: the row survives
    (counts, windows) but the value nullifies (finite_value /
    finite_value_sql) instead of aborting the ANSI cents cast; order
    statistics drop the row; cents-squared sums promote to
    HUGEINT/decimal before multiplying."""
    q = plans.REGISTRY[name]
    assert_parity(
        q.build(spark, extreme_values_sf), extreme_values_duck.sql(q.oracle), name
    )


@pytest.fixture(scope="module")
def adversarial_text_sf(spark, tmp_path_factory):
    """Documents whose TEXT is adversarial (unicode line separators,
    CRLF, CJK, NBSP, ideographic space, ellipses, PII-shaped tokens)
    plus planted near-dups so pair queries fire — end-to-end
    composition coverage above the primitive-level string fuzz."""
    import random

    sf = str(tmp_path_factory.mktemp("advtext") / "sf")
    rng = random.Random(777)
    alphabet = (
        list("abcdefghij XYZ0123456789.,;:!?#…")
        + ["...", "\t", "\n", "\r\n", "\r", " ", " ", "　",
           " ", " ", " ", "",
           "der ", "die ", "the ", "el ", "le ", "und ", "日本語 ", "漢字 ",
           "a@b.co ", "+1-555-123-4567 ", "192.168.0.1 ", "-", "--", "'", '"']
    )
    rows = []
    for i in range(60):
        n = rng.randrange(0, 120)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        rows.append((i, text, ["en", "de", "fr", "es", "zh"][i % 5], f"src{i % 20}", len(text)))
    rows.append((100, "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu", "en", "src0", 60))
    rows.append((101, "alpha beta gamma delta epsilon zeta eta theta iota kappa lam nu", "en", "src1", 60))
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


@pytest.fixture(scope="module")
def adversarial_text_duck(adversarial_text_sf):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{adversarial_text_sf}/documents.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", _doc_only_queries())
def test_doc_query_parity_on_adversarial_text(
    spark, adversarial_text_sf, adversarial_text_duck, name
):
    q = plans.REGISTRY[name]
    assert_parity(
        q.build(spark, adversarial_text_sf), adversarial_text_duck.sql(q.oracle), name
    )


@pytest.fixture(scope="module")
def degenerate_sf(spark, tmp_path_factory):
    """Every document is the SAME single token — vocabulary collapses
    to one type, every rank/df/variance denominator hits its floor.
    Caught: q_zipf_fit's OLS denominator n·Σx²−(Σx)² = 0 at one rank
    (Spark portable_round floored NaN to 0.0 where DuckDB kept NaN)."""
    sf = str(tmp_path_factory.mktemp("degenerate") / "sf")
    spark.createDataFrame(
        [(i, "alpha", "en", f"src{i % 2}", 5) for i in range(1, 7)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


@pytest.fixture(scope="module")
def degenerate_duck(degenerate_sf):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{degenerate_sf}/documents.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", _doc_only_queries())
def test_doc_query_parity_on_degenerate_corpus(
    spark, degenerate_sf, degenerate_duck, name
):
    q = plans.REGISTRY[name]
    assert_parity(q.build(spark, degenerate_sf), degenerate_duck.sql(q.oracle), name)


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    """Every table present but EMPTY — the classic first-run /
    filtered-to-nothing edge. Caught: DuckDB synthesizes the rollup /
    cube grand-total row over empty input while Spark emits none."""
    from tests.conftest import SMOKE_SF
    from tia_data_pipeline_spark.catalog import TABLES, load_table

    sf = str(tmp_path_factory.mktemp("empty") / "sf")
    for t in TABLES:
        load_table(spark, SMOKE_SF, t).limit(0).write.mode("overwrite").parquet(
            f"{sf}/{t}.parquet"
        )
    return sf


@pytest.fixture(scope="module")
def empty_duck(empty_sf):
    from tia_data_pipeline_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{empty_sf}/{t}.parquet/*.parquet')"
        )
    return con


@pytest.mark.parametrize(
    "name", [n for n, q in plans.REGISTRY.items() if q.oracle is not None]
)
def test_query_parity_on_empty_tables(spark, empty_sf, empty_duck, name):
    q = plans.REGISTRY[name]
    assert_parity(q.build(spark, empty_sf), empty_duck.sql(q.oracle), name)


# ---------------------------------------------------------------------------
# Combined documents + embeddings hostile corpus (the multi-family
# composites — q_takedown — that every single-family sweep excludes by
# construction; round 10)
# ---------------------------------------------------------------------------


def _doc_embedding_queries():
    from tests.oracle import pair_family_queries

    return pair_family_queries("documents", "embeddings")


@pytest.fixture(scope="module")
def null_doc_emb_sf(null_sf, null_emb_sf, tmp_path_factory):
    """One sf dir carrying BOTH hostile tables: the null-document
    corpus (NULL/empty text, NULL n_chars) and the hostile embeddings
    (NULL / empty / NaN-component / NULL-element / zero vectors)."""
    import os

    sf = str(tmp_path_factory.mktemp("null_doc_emb") / "sf")
    os.makedirs(sf)
    os.symlink(f"{null_sf}/documents.parquet", f"{sf}/documents.parquet")
    os.symlink(f"{null_emb_sf}/embeddings.parquet", f"{sf}/embeddings.parquet")
    return sf


@pytest.fixture(scope="module")
def null_doc_emb_duck(null_doc_emb_sf):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{null_doc_emb_sf}/{t}.parquet/*.parquet')"
        )
    return con


@pytest.mark.parametrize("name", _doc_embedding_queries())
def test_doc_embedding_query_parity_on_null_corpus(
    spark, null_doc_emb_sf, null_doc_emb_duck, name
):
    """Both families' hazard rows at once: the document legs see
    NULL/empty text among real docs, the embedding legs see the
    valid_vector hazard shapes — every leg of a composite lifecycle
    query must state its preconditions on both engines."""
    q = plans.REGISTRY[name]
    assert_parity(q.build(spark, null_doc_emb_sf), null_doc_emb_duck.sql(q.oracle), name)
