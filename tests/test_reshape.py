"""explode_column (UNNEST) and unpivot (melt) vs DuckDB, including
null/empty lists, position ordinals, and multi-block invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from bloomjoin_ray.pipelines.reshape import explode_column, unpivot


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (df.sort_index(axis=1)
            .sort_values(df.columns.sort_values().tolist())
            .reset_index(drop=True))


def test_explode_column_matches_sql(ray_session):
    rng = np.random.default_rng(3)
    lists, ids = [], []
    for i in range(800):
        r = rng.integers(0, 10)
        if r == 0:
            lists.append(None)          # null list → no rows
        elif r == 1:
            lists.append([])            # empty list → no rows
        else:
            lists.append(rng.integers(0, 100, r).tolist())
        ids.append(i)
    t = pa.table({"id": pa.array(ids, pa.int64()),
                  "xs": pa.array(lists, pa.list_(pa.int64()))})
    con = duckdb.connect()
    con.register("t", t)

    got = _norm(explode_column(
        rd.from_arrow(t).repartition(5), "xs", out_col="x").to_pandas())
    want = _norm(con.sql("SELECT id, unnest(xs) AS x FROM t").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # with position ordinal: positions are per-parent 0..len-1
    gp = explode_column(rd.from_arrow(t), "xs", out_col="x",
                        pos_col="pos").to_pandas()
    df = t.to_pandas()
    for i, xs in zip(df["id"], df["xs"]):
        sub = gp[gp.id == i].sort_values("pos")
        exp = [] if xs is None else list(xs)
        assert list(sub["x"]) == exp and list(sub["pos"]) == list(
            range(len(exp)))


def test_unpivot_matches_sql(ray_session):
    rng = np.random.default_rng(4)
    t = pa.table({"id": pa.array(np.arange(1000), pa.int64()),
                  "a": pa.array(rng.integers(0, 50, 1000), pa.int64()),
                  "b": pa.array(rng.integers(0, 50, 1000), pa.int64())})
    con = duckdb.connect()
    con.register("t", t)
    got = _norm(unpivot(rd.from_arrow(t).repartition(4), ["id"],
                        ["a", "b"], var_col="name",
                        val_col="value").to_pandas())
    want = _norm(con.sql("""
        SELECT id, 'a' AS name, a AS value FROM t
        UNION ALL SELECT id, 'b', b FROM t
    """).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    with pytest.raises(ValueError):
        unpivot(rd.from_arrow(t), ["id"], [])
