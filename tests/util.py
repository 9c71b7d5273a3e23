"""Test helpers: order-insensitive comparison of a Ray Dataset / Arrow
table / pandas frame against a duckdb-oracle pandas frame."""

import numpy as np
import pandas as pd


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows by all values."""
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_extension_array_dtype(df[c].dtype):
            df[c] = df[c].astype(object).where(df[c].notna(), None)
        if df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
        if pd.api.types.is_integer_dtype(df[c].dtype):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    key = df.apply(lambda r: tuple(str(v) for v in r), axis=1) if len(df) else None
    if key is not None:
        df = df.iloc[np.argsort(key.values, kind="stable")]
    return df.reset_index(drop=True)


def assert_same(result, expected, check_dtype=False):
    got = canon(to_pandas(result))
    want = canon(to_pandas(expected))
    assert list(got.columns) == list(want.columns), (
        f"columns differ: {list(got.columns)} vs {list(want.columns)}")
    assert len(got) == len(want), f"row counts differ: {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=check_dtype,
                                  check_exact=False, rtol=1e-9, atol=1e-12)
