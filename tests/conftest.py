from __future__ import annotations

import duckdb
import pytest

from tia_data_pipeline_spark.catalog import TABLES, table_path
from tia_data_pipeline_spark.session import get_spark

SMOKE_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(SMOKE_SF, name)}')"
        )
    yield con
    con.close()
