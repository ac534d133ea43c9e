"""Data-quality expectations on planted-violation inputs — the corpus
is clean, so the contract query alone can't prove the rules fire."""

from __future__ import annotations

from tia_data_pipeline_spark.operators.validate import (
    accepted_values,
    fk_violations,
    in_range,
    matches,
    non_negative,
    not_null,
    unique_key_violations,
    validate,
)


def test_validate_counts_each_rule(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "O", "1-URGENT"),
            (None, -5.0, "X", "bad"),
            (3, 200.0, "F", "5-LOW"),
            (4, None, None, None),  # NULLs violate only not_null rules
        ],
        "k bigint, price double, status string, prio string",
    )
    rows = {
        r["rule"]: (r["n_violations"], r["n_rows"])
        for r in validate(
            df,
            [
                not_null("k"),
                non_negative("price"),
                in_range("price", 0.0, 100.0),
                accepted_values("status", ["O", "F"]),
                matches("prio", r"^[1-5]-"),
            ],
        ).collect()
    }
    assert rows == {
        "not_null_k": (1, 4),
        "non_negative_price": (1, 4),
        "range_price": (2, 4),  # -5 below, 200 above; NULL not counted
        "accepted_status": (1, 4),
        "matches_prio": (1, 4),
    }


def test_unique_and_fk_violations(spark):
    child = spark.createDataFrame(
        [(1, 100), (1, 100), (1, 200), (2, 999), (3, None)], "k bigint, fk bigint"
    )
    parent = spark.createDataFrame([(100,), (200,)], "pk bigint")
    dups = {(r["k"],): r["n_copies"] for r in unique_key_violations(child, ["k"]).collect()}
    assert dups == {(1,): 3}
    bad_fk = [r["k"] for r in fk_violations(child, "fk", parent, "pk").collect()]
    assert bad_fk == [2]  # NULL FK is not a violation (SQL semantics)


def test_validate_awkward_rule_names_and_duplicates(spark):
    """Review r5: names with spaces/quotes and two rules sharing a name
    must not break the stack unpivot (positional aliases); empty rule
    lists are rejected loudly."""
    import pytest
    from pyspark.sql import functions as F

    from tia_data_pipeline_spark.operators.validate import Rule, validate

    df = spark.createDataFrame([(1,), (-2,), (3,)], "v bigint")
    rules = [
        Rule("weird name's", F.col("v") < 0),
        Rule("range_v", F.col("v") < 0),
        Rule("range_v", F.col("v") > 2),  # duplicate name, different rule
    ]
    rows = validate(df, rules).collect()
    assert [r["rule"] for r in rows] == ["weird name's", "range_v", "range_v"]
    assert [r["n_violations"] for r in rows] == [1, 1, 1]
    assert all(r["n_rows"] == 3 for r in rows)
    with pytest.raises(ValueError):
        validate(df, [])
