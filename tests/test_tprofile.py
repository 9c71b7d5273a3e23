"""TableProfile / dataset_profile: one-pass whole-dataset profiling —
exact counters vs DuckDB, sketch bounds, merge associativity, serde."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from bloomjoin_ray.state.tprofile import TableProfile


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "documents"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"'/root/testdata/sf0.01/{t}.parquet'")
    return c


def test_dataset_profile_events(ray_session, con):
    import ray.data as rd

    from bloomjoin_ray.pipelines.profile import dataset_profile

    ds = rd.read_parquet("/root/testdata/sf0.01/events.parquet")
    prof = dataset_profile(ds).to_pandas().set_index("column")

    exact = con.sql("""
        SELECT count(value) n, count(*) - count(value) n_null,
               count(DISTINCT value) d, min(value) lo, max(value) hi,
               avg(value) mean, stddev_pop(value) std,
               quantile_disc(value, 0.5) p50
        FROM events""").df().iloc[0]
    row = prof.loc["value"]
    assert row["n"] == exact["n"] and row["nulls"] == exact["n_null"]
    assert float(row["min"]) == exact["lo"]
    assert float(row["max"]) == exact["hi"]
    assert np.isclose(row["mean"], exact["mean"])
    assert np.isclose(row["std"], exact["std"], rtol=1e-9)
    assert abs(row["distinct_est"] - exact["d"]) / exact["d"] < \
        4 * 1.04 / np.sqrt(2 ** 14)
    # KLL rank-error envelope: p50 value within a generous value band
    lo_q, hi_q = con.sql(
        "SELECT quantile_disc(value, 0.45), quantile_disc(value, 0.55) "
        "FROM events").fetchone()
    assert lo_q <= row["p50"] <= hi_q

    srow = prof.loc["event_type"]
    s_exact = con.sql("""
        SELECT count(DISTINCT event_type) d, min(event_type) lo,
               max(event_type) hi, avg(length(event_type)) ml
        FROM events""").df().iloc[0]
    assert srow["min"] == s_exact["lo"] and srow["max"] == s_exact["hi"]
    assert np.isclose(srow["mean_len"], s_exact["ml"])
    assert srow["distinct_est"] == pytest.approx(s_exact["d"], rel=0.05)
    assert srow["mean"] is None or np.isnan(srow["mean"])


def test_profile_merge_associative_and_serde():
    from bloomjoin_ray.state.base import sketch_from_bytes

    rng = np.random.default_rng(5)
    n = 30_000
    t = pa.table({
        "x": pa.array(np.where(rng.random(n) < 0.1, np.nan,
                               rng.normal(10, 3, n))),
        "s": pa.array([f"v{int(i)}" for i in
                       rng.integers(0, 1000, n)]),
    })
    cols = ["x", "s"]
    one = TableProfile(cols)
    one.update_table(t)
    acc = None
    for lo in range(0, n, 7000):
        p = TableProfile(cols)
        p.update_table(t.slice(lo, 7000))
        acc = p if acc is None else acc.merge(p)
    # int counters identical; float sums equal up to accumulation order;
    # HLL registers identical (max-merge is exact)
    for c in cols:
        for key, v in one.stats[c].items():
            w = acc.stats[c][key]
            if isinstance(v, float):
                assert np.isclose(v, w, rtol=1e-12), (c, key)
            else:
                assert v == w, (c, key)
    a, b = acc.finalize().to_pandas(), one.finalize().to_pandas()
    assert (a["distinct_est"] == b["distinct_est"]).all()
    r = sketch_from_bytes(acc.to_bytes())
    assert isinstance(r, TableProfile)
    assert r.finalize().to_pandas()["n"].tolist() == \
        a["n"].tolist()


def test_profile_validation(ray_session):
    import ray.data as rd

    from bloomjoin_ray.pipelines.profile import dataset_profile

    ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet")
    with pytest.raises(ValueError, match="not in schema"):
        dataset_profile(ds, columns=["nope"])
    with pytest.raises(ValueError):
        TableProfile(["a"]).merge(TableProfile(["b"]))
