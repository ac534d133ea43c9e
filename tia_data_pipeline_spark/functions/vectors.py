"""Vector (embedding) column functions.

Operate on ``array<float>`` / ``array<double>`` columns entirely with
Spark higher-order functions — JVM-side, no Python boundary. Elements
are cast to double before arithmetic so results agree bit-for-bit with
the DuckDB oracle's double-precision ``list_*`` functions (both engines
then do the same left-to-right summation).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns (double)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm of an array column."""
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def dot_sql(a: str, b: str) -> str:
    """DuckDB fragment matching :func:`dot` (same summation order)."""
    return f"list_dot_product(({a})::DOUBLE[], ({b})::DOUBLE[])"


def cosine_sql(a: str, b: str) -> str:
    """DuckDB fragment matching :func:`cosine_similarity` INCLUDING the
    zero-norm case: bare ``list_cosine_similarity`` returns -1.0 for a
    zero vector (verified on DuckDB 1.0.0) where the Spark form yields
    NULL, so the guard states Spark's ``denom > 0`` condition via
    self-dot-products (sum of squares > 0 ⟺ norm > 0, exactly)."""
    ad, bd = f"({a})::DOUBLE[]", f"({b})::DOUBLE[]"
    return (
        f"CASE WHEN list_dot_product({ad}, {ad}) > 0 "
        f"AND list_dot_product({bd}, {bd}) > 0 "
        f"THEN list_cosine_similarity({ad}, {bd}) END"
    )
