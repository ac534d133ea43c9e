"""Feature ops: the pandas grouped-map z-score must agree with the
expression-form z-score (same integer-moment construction)."""

from __future__ import annotations

import math

from tests.conftest import SMOKE_SF
from tia_data_pipeline_spark.catalog import load_table
from tia_data_pipeline_spark.operators.features import zscore, zscore_pandas


def test_pandas_zscore_equals_expression_zscore(spark):
    events = load_table(spark, SMOKE_SF, "events")
    a = {
        r["event_id"]: r["zscore"]
        for r in zscore(events, "user_id", "value").collect()
    }
    b = {
        r["event_id"]: r["zscore"]
        for r in zscore_pandas(events, "user_id", "value").collect()
    }
    assert set(a) == set(b)
    for k in a:
        if a[k] is None:
            assert b[k] is None or math.isnan(b[k])
        else:
            assert a[k] == b[k], f"event {k}: {a[k]} vs {b[k]}"


def test_zscore_basic_properties(spark):
    df = spark.createDataFrame(
        [(1, 10, 1.0), (2, 10, 2.0), (3, 10, 3.0), (4, 20, 5.0)],
        "event_id bigint, user_id bigint, value double",
    )
    z = {r["event_id"]: r["zscore"] for r in zscore(df, "user_id", "value").collect()}
    assert z[2] == 0.0  # mean element
    assert z[1] == -z[3]  # symmetric
    assert z[4] is None  # singleton group
