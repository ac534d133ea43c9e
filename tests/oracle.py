"""Mirror of the driver's oracle-differential check.

Runs a declared Spark query and its DuckDB oracle on the same parquet,
then compares row count + column names + type kinds + order-insensitive
RENDERED values. Comparison is *exact* (queries are designed to emit
hash-stable values: rounded doubles, µs timestamps, bigint counts) —
any drift the driver could flag should fail here first.

The comparison path is Arrow on BOTH sides (``DataFrame.toArrow()`` /
``rel.arrow()``) with canonical per-value rendering, because the old
``toPandas()``/``.df()`` path had four masking blind spots (found by
the round-6 harness review, each empirically reproduced):
- float64 coercion collapsed Spark NaN and oracle NULL into the same
  NaN, equating exactly the divergence class ``finite_value`` guards;
- int-vs-float type drift (``count(*)::DOUBLE`` in an oracle) passed
  because pandas ``eq`` equates 5 and 5.0 while the driver's
  schema/render hash does not;
- a nullable bigint column became float64 on both sides, so integers
  past 2^53 compared equal under small deltas;
- ``-0.0`` vs ``0.0`` passed ``isclose`` while rendering differently.
Arrow preserves null-vs-NaN, int-with-null, and signed zeros; the
renderer makes every one of those distinctions explicit.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal

import pyarrow as pa


def family_queries(family: str) -> list[str]:
    """Registry queries whose oracle touches ONLY the given table
    (single-family coverage) — ONE implementation shared by the
    hostile-corpus suites (null / ties / adversarial-text) so a
    hardening of the family-match logic can never land in one sweep
    and silently not another. The exclusion list derives from the one
    catalog table registry so a new corpus table can never be
    silently missed.

    Table names match on identifier boundaries, not raw substrings: a
    plain `t in sql` check silently drops true single-family queries
    whose SQL merely contains another table name inside a function or
    alias (`split_part` contains `part`; an `n_customers` alias
    contains `customer`), starving them of hostile coverage."""
    from tia_data_pipeline_spark import plans
    from tia_data_pipeline_spark.catalog import TABLES

    others = set(TABLES) - {family}
    return [
        name
        for name, q in plans.REGISTRY.items()
        if q.oracle is not None
        and sql_mentions_table(family, q.oracle)
        and not any(sql_mentions_table(t, q.oracle) for t in others)
    ]


def pair_family_queries(fam_a: str, fam_b: str) -> list[str]:
    """Registry queries whose oracle touches EXACTLY the two given
    tables — the multi-family composites (q_takedown spans documents +
    embeddings) that the single-family sweeps exclude by construction.
    Same identifier-boundary matching and same single-implementation
    rule as :func:`family_queries`: the guard in tests/test_plans.py
    and the combined hostile sweep both read THIS selection."""
    from tia_data_pipeline_spark import plans
    from tia_data_pipeline_spark.catalog import TABLES

    others = set(TABLES) - {fam_a, fam_b}
    return [
        name
        for name, q in plans.REGISTRY.items()
        if q.oracle is not None
        and sql_mentions_table(fam_a, q.oracle)
        and sql_mentions_table(fam_b, q.oracle)
        and not any(sql_mentions_table(t, q.oracle) for t in others)
    ]


def sql_mentions_table(table: str, sql: str) -> bool:
    """True when the SQL references the table name as a standalone
    identifier (shared by family_queries and the relational sweeps)."""
    import re

    return re.search(rf"(?<![A-Za-z0-9_]){table}(?![A-Za-z0-9_])", sql) is not None


def create_duck_views(con, sf_dir: str) -> None:
    """Register every corpus table as a DuckDB view over its parquet —
    ONE implementation shared by conftest and scripts/drive_entry so
    the harness and the test oracle can never bootstrap differently.
    Handles both single-file tables (the driver corpus) and directory
    tables (fixture writes)."""
    import os

    from tia_data_pipeline_spark.catalog import TABLES, table_path

    for name in TABLES:
        path = table_path(sf_dir, name)
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")


def _kind(t: pa.DataType) -> str:
    """Collapse an Arrow type to the comparison KIND: width differences
    are benign (int32 vs int64), category differences (int vs float vs
    decimal) are exactly what the driver's schema check flags."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_date(t):
        # DuckDB date_trunc('day', ts) yields DATE where Spark's yields
        # TIMESTAMP; driver rows for such queries were hash-green in
        # r1-r5, so the driver's render equates a DATE with the
        # midnight TIMESTAMP — mirror that (see _render).
        return "ts"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{_kind(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct"
    return str(t)


def _render(v) -> str:
    """Canonical total-order render; distinct values render distinctly
    (NULL vs NaN, -0.0 vs 0.0, 1 vs 1.0)."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        return f"f:{v!r}"  # repr: shortest round-trip; 'nan', '-0.0' distinct
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, _decimal.Decimal):
        return f"d:{v.normalize():f}" if v.is_finite() else f"d:{v}"
    if isinstance(v, str):
        return f"s:{v}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return f"t:{v.isoformat(timespec='microseconds')}"
    if isinstance(v, _dt.date):
        return f"t:{v.isoformat()}T00:00:00.000000"  # date ≡ midnight ts
    if isinstance(v, (list, tuple)):
        return "l:[" + ",".join(_render(x) for x in v) + "]"
    if isinstance(v, dict):
        return "m:{" + ",".join(f"{k}={_render(x)}" for k, x in sorted(v.items())) + "}"
    return f"?:{v!r}"


def _to_arrow(obj) -> pa.Table:
    if isinstance(obj, pa.Table):
        return obj
    if hasattr(obj, "toArrow"):  # Spark DataFrame
        return obj.toArrow()
    arr = obj.arrow()  # DuckDB relation (Table or RecordBatchReader)
    return arr.read_all() if isinstance(arr, pa.RecordBatchReader) else arr


def _canonical(obj) -> tuple[list[str], list[str], list[tuple[str, ...]]]:
    """(sorted column names, their kinds, sorted rendered rows)."""
    t = _to_arrow(obj)
    names = sorted(t.column_names)
    cols, kinds = [], []
    for n in names:
        arr = t.column(n)
        typ = arr.type
        if pa.types.is_timestamp(typ) and typ.tz is not None:
            # tz-aware (Spark session tz) → UTC-naive µs: arrow stores
            # epoch µs, so the naive cast is host-tz independent
            arr = arr.cast(pa.timestamp("us", tz="UTC")).cast(pa.timestamp("us"))
        kinds.append(_kind(typ))
        cols.append(arr.to_pylist())
    rows = sorted(tuple(_render(c[i]) for c in cols) for i in range(t.num_rows))
    return names, kinds, rows


def assert_parity(spark_df, duck_rel, name: str = "") -> None:
    ln, lk, lrows = _canonical(spark_df)
    rn, rk, rrows = _canonical(duck_rel)
    assert ln == rn, f"{name}: column mismatch {ln} vs {rn}"
    assert lk == rk, (
        f"{name}: type-kind mismatch "
        f"{dict(zip(ln, lk))} vs {dict(zip(rn, rk))}"
    )
    assert len(lrows) == len(rrows), f"{name}: row count {len(lrows)} vs {len(rrows)}"
    for i, (lr, rr) in enumerate(zip(lrows, rrows)):
        if lr != rr:
            diffs = [(c, a, b) for c, a, b in zip(ln, lr, rr) if a != b]
            raise AssertionError(
                f"{name}: sorted row {i} differs on {diffs} "
                f"(spark={lr} oracle={rr})"
            )
