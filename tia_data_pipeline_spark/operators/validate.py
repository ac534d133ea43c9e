"""Declarative data-quality expectations (dbt-test / Deequ shape).

The reference trusts Postgres constraints (PK uniqueness, NOT NULL in
the DDL — ``init_db_tables.sh``) to police data quality at insert
time. A lakehouse has no enforcing database, so the engine form is a
VALIDATION PASS: declare expectations, get back one row per rule with
its violation count — the gate a pipeline checks before publishing a
batch.

Every rule compiles to a conditional aggregate over ONE scan of the
table (a single grouped-less aggregate with N counters — not N
queries); the FK rule adds one anti-join per referenced dimension.
At 100 TB that is exactly the shape you want: one pass, map-side
partial aggregation, dimension keys broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    # predicate TRUE = row VIOLATES the rule
    violation: Column


def not_null(col: str) -> Rule:
    return Rule(f"not_null_{col}", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Rule:
    c = F.col(col)
    return Rule(f"range_{col}", c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))))


def non_negative(col: str) -> Rule:
    c = F.col(col)
    return Rule(f"non_negative_{col}", c.isNotNull() & (c < 0))


def accepted_values(col: str, values: list) -> Rule:
    c = F.col(col)
    return Rule(f"accepted_{col}", c.isNotNull() & ~c.isin(*values))


def matches(col: str, pattern: str) -> Rule:
    c = F.col(col)
    return Rule(f"matches_{col}", c.isNotNull() & ~c.rlike(pattern))


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """One row per rule: (rule, n_violations, n_rows). Single scan,
    single aggregate — every rule is a conditional counter.

    Rule names pass through literally (quote-escaped) and columns are
    positional ``_r{i}`` aliases, so names containing spaces/quotes and
    two rules sharing a name (two ``in_range`` checks on one column)
    are all fine; an empty rule list is rejected (``stack(0)`` would be
    a parse error, and a zero-rule report is almost always a bug in the
    caller's rule assembly)."""
    if not rules:
        raise ValueError("validate() requires at least one rule")
    aggs = [
        # coalesce: SUM over ZERO rows is NULL, but an empty batch has
        # exactly 0 violations — a publish gate on n_violations == 0
        # must pass it, not evaluate to NULL
        F.coalesce(
            F.sum(F.when(r.violation, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
        )
        .cast("bigint")
        .alias(f"_r{i}")
        for i, r in enumerate(rules)
    ]
    counted = df.agg(F.count(F.lit(1)).alias("_n"), *aggs)
    # escape backslashes BEFORE quotes: selectExpr parses string
    # literals with backslash-escape semantics, so an unescaped
    # "a\\tcheck" rule name would silently emit "a<TAB>check" and a
    # gate keyed on the declared name would never match the row
    stack_args = ", ".join(
        "'{name}', _r{i}".format(
            name=r.name.replace("\\", "\\\\").replace("'", "\\'"), i=i
        )
        for i, r in enumerate(rules)
    )
    return counted.selectExpr(
        f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)", "_n AS n_rows"
    ).select("rule", "n_violations", "n_rows")


def unique_key_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Rows-per-duplicated-key report: (key cols..., n_copies) for keys
    appearing more than once — the PK-uniqueness expectation. Shuffles
    only the key columns."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


def fk_violations(child: DataFrame, fk: str, parent: DataFrame, pk: str) -> DataFrame:
    """Child rows whose FK has no parent — referential-integrity check
    as an anti-join on pruned key columns (parent side broadcasts when
    small)."""
    return (
        child.filter(F.col(fk).isNotNull())
        .join(parent.select(F.col(pk).alias(fk)).distinct(), on=fk, how="left_anti")
    )
