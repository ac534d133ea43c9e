from __future__ import annotations

import duckdb
import pytest

from tia_data_pipeline_spark.catalog import TABLES, table_path
from tia_data_pipeline_spark.session import get_spark

# Single source for the smoke-corpus location: the grading surface
# declares it (and must stay self-contained), so tests import it —
# entry() and the pytest suites can never silently validate against
# different corpora.
from __spark_entry__ import SMOKE_SF_DIR as SMOKE_SF  # noqa: E402


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
