"""Single-row robustness: every oracle-checked contract query must
stay engine-parity when EVERY table holds exactly ONE row.

The empty-tables sweep covers n=0 and the degenerate-vocabulary sweep
covers collapsed variance, but n=1 is its own hazard class: (n-1) and
(n-2) denominators hit zero (sample variance, OLS slope, Spearman,
autocorrelation need >=2 points), ECDFs have one step, changepoints
have no admissible split, Markov chains have no transition, windows
have one frame. Under Spark's ANSI mode an unguarded integer
denominator RAISES where DuckDB returns NULL/inf, so any query whose
degenerate-group precondition is implicit diverges or aborts here.

The star schema keeps FK coherence (the one lineitem's order, part,
supplier, the order's customer, the customer's nation and its region)
so join queries produce one row, not zero, and actually exercise
their arithmetic at n=1.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle import assert_parity
from tia_data_pipeline_spark import plans


@pytest.fixture(scope="module")
def single_sf(spark, tmp_path_factory):
    from tests.conftest import SMOKE_SF
    from tia_data_pipeline_spark.catalog import load_table

    sf = str(tmp_path_factory.mktemp("single") / "sf")

    li = (
        load_table(spark, SMOKE_SF, "lineitem")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(1)
    )
    row = li.collect()[0]
    ok, pk, sk = row["l_orderkey"], row["l_partkey"], row["l_suppkey"]
    li.write.parquet(f"{sf}/lineitem.parquet")

    orders = load_table(spark, SMOKE_SF, "orders").filter(f"o_orderkey = {ok}").limit(1)
    ck = orders.collect()[0]["o_custkey"]
    orders.write.parquet(f"{sf}/orders.parquet")

    cust = load_table(spark, SMOKE_SF, "customer").filter(f"c_custkey = {ck}").limit(1)
    nk = cust.collect()[0]["c_nationkey"]
    cust.write.parquet(f"{sf}/customer.parquet")

    nation = load_table(spark, SMOKE_SF, "nation").filter(f"n_nationkey = {nk}").limit(1)
    rk = nation.collect()[0]["n_regionkey"]
    nation.write.parquet(f"{sf}/nation.parquet")

    for t, pred in (
        ("region", f"r_regionkey = {rk}"),
        ("part", f"p_partkey = {pk}"),
        ("supplier", f"s_suppkey = {sk}"),
    ):
        load_table(spark, SMOKE_SF, t).filter(pred).limit(1).write.parquet(
            f"{sf}/{t}.parquet"
        )

    for t in ("documents", "events", "embeddings"):
        load_table(spark, SMOKE_SF, t).limit(1).write.parquet(f"{sf}/{t}.parquet")
    return sf


@pytest.fixture(scope="module")
def single_duck(single_sf):
    from tia_data_pipeline_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{single_sf}/{t}.parquet/*.parquet')"
        )
    return con


@pytest.mark.parametrize(
    "name", [n for n, q in plans.REGISTRY.items() if q.oracle is not None]
)
def test_query_parity_on_single_row_tables(spark, single_sf, single_duck, name):
    q = plans.REGISTRY[name]
    assert_parity(q.build(spark, single_sf), single_duck.sql(q.oracle), name)
