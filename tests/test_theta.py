"""Theta/KMV sketch: estimate bounds, exact below capacity, merge laws,
set-operation estimates vs exact, distributed pipeline vs duckdb."""

import duckdb
import numpy as np
import pytest

from bloomjoin_ray.state.base import sketch_from_bytes
from bloomjoin_ray.state.theta import ThetaSketch


def _h(n, seed=0):
    return np.random.default_rng(seed).integers(0, 2**64, size=n, dtype=np.uint64)


def test_exact_below_capacity():
    s = ThetaSketch(k=1024)
    h = _h(500, 1)
    s.update_batch(h)
    assert s.estimate() == len(np.unique(h))
    assert s.theta == 1.0


@pytest.mark.parametrize("true_n", [10_000, 200_000])
def test_estimate_within_bound(true_n):
    s = ThetaSketch(k=4096)
    for chunk in np.array_split(_h(true_n, true_n), 8):
        s.update_batch(chunk)
    err = abs(s.estimate() - true_n) / true_n
    assert err < 4 * s.rel_error


def test_merge_equals_single_and_order_free():
    h = _h(100_000, 3)
    single = ThetaSketch(1024)
    single.update_batch(h)
    parts = []
    for c in np.array_split(h, 9):
        t = ThetaSketch(1024)
        t.update_batch(c)
        parts.append(t)
    order = np.random.default_rng(0).permutation(9)
    merged = sketch_from_bytes(parts[order[0]].to_bytes())
    for i in order[1:]:
        merged.merge(parts[i])
    np.testing.assert_array_equal(merged.hashes, single.hashes)


def test_set_operations_vs_exact():
    rng = np.random.default_rng(7)
    a_keys = rng.permutation(300_000)[:100_000]
    b_keys = rng.permutation(300_000)[:100_000] + 50_000  # partial overlap
    from bloomjoin_ray.functions.keys import splitmix64

    ha = splitmix64(a_keys.astype(np.uint64))
    hb = splitmix64(b_keys.astype(np.uint64))
    sa, sb = ThetaSketch(8192), ThetaSketch(8192)
    sa.update_batch(ha)
    sb.update_batch(hb)
    true_a = len(set(a_keys.tolist()))
    true_b = len(set(b_keys.tolist()))
    true_i = len(set(a_keys.tolist()) & set(b_keys.tolist()))
    true_u = len(set(a_keys.tolist()) | set(b_keys.tolist()))
    tol = 6 * sa.rel_error  # intersection error compounds; loose 6σ
    assert abs(sa.intersection_estimate(sb) - true_i) / max(true_i, 1) < tol
    assert abs(sa.union_estimate(sb) - true_u) / true_u < tol
    assert abs(sa.difference_estimate(sb) - (true_a - true_i)) / (true_a - true_i) < tol
    true_j = true_i / true_u
    assert abs(sa.jaccard_estimate(sb) - true_j) < 0.05


def test_distributed_vs_duckdb(ray_session):
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import theta_set_estimates

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    true_i = con.sql(f"""
        SELECT count(*) FROM (
          SELECT DISTINCT o_custkey FROM '{sf}/orders.parquet'
          INTERSECT SELECT DISTINCT c_custkey FROM '{sf}/customer.parquet')
    """).fetchone()[0]
    ests = theta_set_estimates(
        rd.read_parquet(f"{sf}/orders.parquet", columns=["o_custkey"])
          .map_batches(lambda t: t.rename_columns(["key"]), batch_format="pyarrow"),
        rd.read_parquet(f"{sf}/customer.parquet", columns=["c_custkey"])
          .map_batches(lambda t: t.rename_columns(["key"]), batch_format="pyarrow"),
        "key")
    # 1500 distinct keys << k=4096 → sketches are exact
    assert ests["intersection"] == true_i
    assert ests["jaccard"] == pytest.approx(
        true_i / (ests["distinct_a"] + ests["distinct_b"] - true_i))


def test_merge_k_mismatch():
    with pytest.raises(ValueError):
        ThetaSketch(64).merge(ThetaSketch(128))
