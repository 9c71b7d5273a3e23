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


def test_split_to_rows_matches_sql(ray_session):
    """regex split + unnest vs DuckDB: empty pieces kept, null rows
    dropped, ordinality, drop_empty filter."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.reshape import split_to_rows

    rows = ["a,b,,c", "x", "", None, ",lead", "trail,"]
    t = pa.table({"id": pa.array(range(len(rows)), pa.int64()),
                  "s": pa.array(rows, pa.string())})
    got = (split_to_rows(rd.from_arrow(t).repartition(3), "s", ",",
                         out_col="piece", pos_col="ord")
           .to_pandas().sort_values(["id", "ord"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql("""
        SELECT id,
               unnest(string_split_regex(s, ',')) AS piece,
               unnest(range(len(string_split_regex(s, ',')))) AS ord
        FROM t ORDER BY id, ord
    """).df()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)

    got2 = (split_to_rows(rd.from_arrow(t), "s", ",", drop_empty=True)
            .to_pandas())
    assert got2["s"].tolist() == ["a", "b", "c", "x", "lead", "trail"]
