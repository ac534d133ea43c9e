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
    from tests.oracle import create_duck_views

    con = duckdb.connect()
    create_duck_views(con, SMOKE_SF)
    yield con
    con.close()
