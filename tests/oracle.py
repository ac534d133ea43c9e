"""Mirror of the driver's oracle-differential check.

Runs a declared Spark query and its DuckDB oracle on the same parquet,
then compares row count + column names + order-insensitive values.
Comparison is *exact* (queries are designed to emit hash-stable
values: rounded doubles, µs timestamps, bigint counts) — any drift the
driver could flag should fail here first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


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


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out.reindex(sorted(out.columns), axis=1)
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s)
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            out[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def assert_parity(spark_df, duck_rel, name: str = "") -> None:
    left = normalize(spark_df.toPandas())
    right = normalize(duck_rel.df())
    assert list(left.columns) == list(right.columns), (
        f"{name}: column mismatch {list(left.columns)} vs {list(right.columns)}"
    )
    assert len(left) == len(right), f"{name}: row count {len(left)} vs {len(right)}"
    for c in left.columns:
        lv, rv = left[c].to_numpy(), right[c].to_numpy()
        if np.issubdtype(lv.dtype, np.floating):
            mism = ~(np.isclose(lv, rv, rtol=0, atol=0, equal_nan=True))
            if mism.any():
                i = int(np.argmax(mism))
                raise AssertionError(
                    f"{name}: float col {c} differs at sorted row {i}: {lv[i]!r} vs {rv[i]!r} "
                    f"({int(mism.sum())} rows differ)"
                )
        else:
            eq = pd.Series(lv).eq(pd.Series(rv)) | (pd.Series(lv).isna() & pd.Series(rv).isna())
            if not eq.all():
                i = int(np.argmax(~eq.to_numpy()))
                raise AssertionError(
                    f"{name}: col {c} differs at sorted row {i}: {lv[i]!r} vs {rv[i]!r} "
                    f"({int((~eq).sum())} rows differ)"
                )
