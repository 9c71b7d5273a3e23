"""Key-distribution profiling vs DuckDB oracles and MG/HLL bounds."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def skewed(ray_session):
    """Zipf-ish key distribution with one dominant key."""
    import ray.data as rd

    rng = np.random.default_rng(71)
    keys = np.concatenate([
        np.full(4000, 0),                          # hot key: 4000 rows
        rng.integers(1, 400, size=6000),           # tail
    ])
    t = pa.table({"user_id": pa.array(keys, pa.int64()),
                  "v": pa.array(rng.random(len(keys)))})
    return t, rd.from_arrow(t).repartition(6)


def test_key_skew_summary_vs_duckdb(skewed):
    from bloomjoin_ray.pipelines.profile import key_skew_summary

    t, ds = skewed
    got = key_skew_summary(ds, "user_id").to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql("""
        WITH c AS (SELECT user_id, count(*) AS n FROM t GROUP BY user_id)
        SELECT CAST(sum(n) AS BIGINT) AS n_rows,
               count(*) AS n_keys,
               max(n) AS max_n,
               quantile_disc(n, 0.5) AS p50_n,
               quantile_disc(n, 0.9) AS p90_n,
               quantile_disc(n, 0.99) AS p99_n,
               CAST(sum(n) AS DOUBLE) / count(*) AS avg_n,
               CAST(max(n) AS DOUBLE) * count(*) / CAST(sum(n) AS DOUBLE)
                   AS skew
        FROM c
    """).df()
    assert len(got) == 1
    for c in want.columns:
        assert got[c].iloc[0] == want[c].iloc[0], c
    assert got["max_n"].iloc[0] == 4000 and got["skew"].iloc[0] > 50


def test_heavy_keys_vs_duckdb(skewed):
    from bloomjoin_ray.pipelines.profile import heavy_keys

    t, ds = skewed
    got = heavy_keys(ds, "user_id", k=7).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql("""
        SELECT user_id, count(*) AS n FROM t GROUP BY user_id
        ORDER BY n DESC, user_id LIMIT 7
    """).df()
    assert len(got) == 7
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["user_id"].iloc[0] == 0 and got["n"].iloc[0] == 4000


def test_heavy_keys_multicol_and_small_input(ray_session):
    import ray.data as rd

    from bloomjoin_ray.pipelines.profile import heavy_keys

    t = pa.table({"a": [1, 1, 2, 2, 2], "b": ["x", "x", "y", "y", "z"]})
    got = (heavy_keys(rd.from_arrow(t).repartition(3), ["a", "b"], k=10)
           .to_pandas())
    assert len(got) == 3                          # fewer keys than k
    # tie at n=2 breaks by key asc: (1,x) before (2,y)
    assert got.iloc[0].tolist() == [1, "x", 2]
    assert got.iloc[1].tolist() == [2, "y", 2]
    assert got["n"].tolist() == [2, 2, 1]


def test_key_skew_sketch_bounds(skewed):
    from bloomjoin_ray.pipelines.profile import key_skew_sketch

    t, ds = skewed
    prof = key_skew_sketch(ds, "user_id", topk=5, capacity=256)
    assert prof["n_rows"] == 10_000
    # HLL p=14: ~1% rel error at 400 keys
    assert abs(prof["distinct_est"] - 400) < 20
    heavy = prof["heavy"].to_pandas()
    # the dominant key must surface, count a valid lower bound within
    # the MG guarantee n/(capacity+1)
    top = heavy.iloc[0]
    assert top["user_id"] == 0
    assert 4000 - 10_000 / 257 <= top["est_count"] <= 4000
    assert top["share_lb"] <= 0.4
    assert top["share_lb"] >= 0.4 - (10_000 / 257) / 10_000


def test_key_skew_summary_validation(skewed):
    from bloomjoin_ray.pipelines.profile import heavy_keys, key_skew_summary

    _t, ds = skewed
    with pytest.raises(ValueError, match="qs"):
        key_skew_summary(ds, "user_id", qs=[1.5])
    with pytest.raises(ValueError, match="k"):
        heavy_keys(ds, "user_id", k=0)


def test_pipeline_stats_parses_operators(ray_session):
    import pyarrow.compute as pc
    import ray.data as rd

    from bloomjoin_ray.pipelines.profile import pipeline_stats

    ds = rd.read_parquet("/root/testdata/sf0.01/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])
    out = ds.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 1000.0)),
        batch_format="pyarrow").materialize()
    st = pipeline_stats(out).to_pandas()
    assert len(st) >= 2                      # read + map at minimum
    assert any("MapBatches" in o for o in st["operator"])
    assert (st["wall_s"] >= 0).all()
    assert st["rows_out"].iloc[-1] == out.count()
    assert st["tasks"].ge(1).all()
