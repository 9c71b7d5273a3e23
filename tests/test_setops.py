"""SQL set operations vs DuckDB: DISTINCT / UNION / INTERSECT / EXCEPT
with multi-column keys, real nulls (SQL set ops treat null == null),
and values colliding with the null-fill sentinel (0 / empty string)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from bloomjoin_ray.pipelines.setops import (distinct_rows, except_distinct,
                                            intersect_distinct,
                                            union_distinct)


def _mk(seed: int, n: int, vocab) -> pa.Table:
    rng = np.random.default_rng(seed)
    a = rng.choice(vocab, n)
    b = rng.choice([0, 1, 2, 3, None], n).astype(object)
    return pa.table({"a": pa.array(a.tolist()),
                     "b": pa.array(b.tolist(), pa.int64())})


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (df.sort_index(axis=1)
            .sort_values(df.columns.sort_values().tolist())
            .reset_index(drop=True))


@pytest.fixture(scope="module")
def tables():
    # asymmetric vocabularies: EXCEPT non-empty in both directions
    ta = _mk(7, 4000, ["x", "y", "z", "", None, "only_a"])
    tb = _mk(8, 3000, ["x", "y", "", None, "only_b"])
    con = duckdb.connect()
    con.register("ta", ta)
    con.register("tb", tb)
    return ta, tb, con


def test_distinct_rows_matches_sql(ray_session, tables):
    ta, _tb, con = tables
    got = _norm(distinct_rows(
        rd.from_arrow(ta).repartition(6), ["a", "b"]).to_pandas())
    want = _norm(con.sql("SELECT DISTINCT a, b FROM ta").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # default = all columns; single string col spec
    got1 = distinct_rows(rd.from_arrow(ta).repartition(3), "a").to_pandas()
    assert sorted(got1["a"].dropna()) == sorted(
        con.sql("SELECT DISTINCT a FROM ta WHERE a IS NOT NULL").df()["a"])
    assert got1["a"].isna().sum() == 1  # nulls collapse to ONE row


def test_union_intersect_except_match_sql(ray_session, tables):
    ta, tb, con = tables
    da = rd.from_arrow(ta).repartition(5)
    db = rd.from_arrow(tb).repartition(4)

    got = _norm(union_distinct(da, db, ["a", "b"]).to_pandas())
    want = _norm(con.sql(
        "SELECT a, b FROM ta UNION SELECT a, b FROM tb").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    got = _norm(intersect_distinct(da, db, ["a", "b"]).to_pandas())
    want = _norm(con.sql(
        "SELECT a, b FROM ta INTERSECT SELECT a, b FROM tb").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    got = _norm(except_distinct(da, db, ["a", "b"]).to_pandas())
    want = _norm(con.sql(
        "SELECT a, b FROM ta EXCEPT SELECT a, b FROM tb").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_setops_null_equals_null(ray_session):
    """A null-keyed row in both inputs must survive INTERSECT and be
    dropped by EXCEPT — SQL set-op semantics, not join ON semantics."""
    ta = pa.table({"k": pa.array([None, "v", None])})
    tb = pa.table({"k": pa.array([None, "w"])})
    da, db = rd.from_arrow(ta), rd.from_arrow(tb)
    inter = intersect_distinct(da, db, "k").to_pandas()
    assert len(inter) == 1 and inter["k"].isna().all()
    exc = except_distinct(da, db, "k").to_pandas()
    assert list(exc["k"]) == ["v"]
    uni = union_distinct(da, db, "k").to_pandas()
    assert len(uni) == 3  # null, v, w
