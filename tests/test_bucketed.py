"""Bucket-aligned storage: write once, join with zero exchange."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def layouts(ray_session, tmp_path_factory):
    import ray.data as rd

    from bloomjoin_ray.pipelines.bucketed import write_bucketed

    rng = np.random.default_rng(83)
    L = pa.table({"k": pa.array(rng.integers(0, 200, 3000), pa.int64()),
                  "lv": pa.array(rng.random(3000)),
                  "name": pa.array([f"l{i}" for i in range(3000)])})
    R = pa.table({"k": pa.array(rng.integers(100, 300, 800), pa.int64()),
                  "rv": pa.array(rng.random(800)),
                  "name": pa.array([f"r{i}" for i in range(800)])})
    root = tmp_path_factory.mktemp("buckets")
    da, db = str(root / "L"), str(root / "R")
    write_bucketed(rd.from_arrow(L).repartition(5), da, "k",
                   num_buckets=16)
    write_bucketed(rd.from_arrow(R).repartition(3), db, "k",
                   num_buckets=16)
    return L, R, da, db


def _oracle(L, R, how):
    con = duckdb.connect()
    con.register("L", L)
    con.register("R", R)
    sql = {
        "inner": "SELECT L.k, lv, L.name, rv, R.name AS name_right "
                 "FROM L JOIN R USING (k)",
        "left": "SELECT L.k, lv, L.name, rv, R.name AS name_right "
                "FROM L LEFT JOIN R USING (k)",
        "semi": "SELECT * FROM L SEMI JOIN R USING (k)",
        "anti": "SELECT * FROM L ANTI JOIN R USING (k)",
    }[how]
    return con.sql(sql).df()


def test_bucketed_join_vs_duckdb(layouts):
    from bloomjoin_ray.pipelines.bucketed import bucketed_join

    L, R, da, db = layouts
    for how in ("inner", "left", "semi", "anti"):
        got = bucketed_join(da, db, how=how).to_pandas()
        want = _oracle(L, R, how)
        assert len(got) == len(want), how
        gs = got.sort_values(sorted(got.columns)).reset_index(drop=True)
        ws = want[sorted(want.columns)].sort_values(
            sorted(want.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(gs[ws.columns.tolist()], ws,
                                      check_dtype=False, check_like=True)


def test_bucketed_layout_is_plain_hive(layouts):
    """The layout is ordinary hive parquet: DuckDB reads it back whole,
    and a single bucket dir prunes to just that bucket's keys."""
    import os

    from bloomjoin_ray.functions.keys import hash_keys64

    L, _R, da, _db = layouts
    con = duckdb.connect()
    n = con.sql(f"SELECT count(*) FROM read_parquet('{da}/*/*.parquet')"
                ).fetchone()[0]
    assert n == 3000
    # spot-check co-location: every key in bucket 3 hashes to 3
    sub = f"{da}/__kbucket=3"
    assert os.path.isdir(sub)
    t = con.sql(f"SELECT k FROM read_parquet('{sub}/*.parquet')").arrow()
    h = hash_keys64(pa.table({"k": t.column("k")}), ["k"])
    assert (h % np.uint64(16) == 3).all()


def test_bucketed_join_validation(layouts, tmp_path, ray_session):
    import ray.data as rd

    from bloomjoin_ray.pipelines.bucketed import (bucketed_join,
                                                  write_bucketed)

    L, _R, da, db = layouts
    with pytest.raises(FileNotFoundError, match="_BUCKETS"):
        bucketed_join(str(tmp_path / "nope"), db)
    other = str(tmp_path / "other")
    write_bucketed(rd.from_arrow(L), other, "k", num_buckets=8)
    with pytest.raises(ValueError, match="specs differ"):
        bucketed_join(da, other)
    with pytest.raises(ValueError, match="how"):
        bucketed_join(da, db, how="cross")
    f32 = str(tmp_path / "f32")
    write_bucketed(rd.from_arrow(pa.table(
        {"k": pa.array([1.0], pa.float64()), "x": [1]})), f32, "k",
        num_buckets=16)
    with pytest.raises(TypeError, match="types differ"):
        bucketed_join(da, f32)
    with pytest.raises(ValueError, match="key columns"):
        write_bucketed(rd.from_arrow(L), str(tmp_path / "x"), "missing")


def test_bucketed_map_groups_matches_groupby(layouts):
    """Zero-shuffle grouped reduce over the layout == DuckDB GROUP BY."""
    from bloomjoin_ray.pipelines.bucketed import bucketed_map_groups

    L, _R, da, _db = layouts

    def per_key(g: pa.Table) -> pa.Table:
        lv = g.column("lv").to_numpy()
        return pa.table({"k": g.column("k").slice(0, 1),
                         "n": pa.array([g.num_rows], pa.int64()),
                         "s": pa.array([float(lv.sum())])})

    got = (bucketed_map_groups(da, per_key, columns=["k", "lv"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = duckdb.sql(
        "SELECT k, count(*)::BIGINT n, sum(lv) s FROM L GROUP BY k "
        "ORDER BY k").df()
    pd.testing.assert_frame_equal(got[["k", "n"]], exp[["k", "n"]])
    assert np.allclose(got["s"], exp["s"])


def test_bucketed_map_groups_validates_columns(layouts):
    from bloomjoin_ray.pipelines.bucketed import bucketed_map_groups

    _L, _R, da, _db = layouts
    with pytest.raises(ValueError, match="key columns"):
        bucketed_map_groups(da, lambda g: g, columns=["lv"])
