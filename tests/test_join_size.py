"""CMS inner-product join-size estimation: published bound
(true <= est <= true + eps*N_L*N_R w.p. 1-delta), merge-build
equivalence, cross-type keys, dict join specs."""

import duckdb
import numpy as np
import pytest


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "customer", "lineitem"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"'/root/testdata/sf0.01/{t}.parquet'")
    return c


def test_join_size_orders_customer(ray_session, con):
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import estimate_join_size

    orders = rd.read_parquet("/root/testdata/sf0.01/orders.parquet")
    cust = rd.read_parquet("/root/testdata/sf0.01/customer.parquet")
    true = con.sql("SELECT count(*) FROM orders JOIN customer "
                   "ON o_custkey = c_custkey").fetchone()[0]
    r = estimate_join_size(orders, cust, {"o_custkey": "c_custkey"})
    assert r["rows_estimate"] >= true          # never undercounts
    assert r["rows_estimate"] <= true + r["bound_slack"]
    # widening the sketch tightens it (deterministic on this input)
    wide = estimate_join_size(orders, cust, {"o_custkey": "c_custkey"},
                              width=131072)
    assert true <= wide["rows_estimate"] <= true * 1.02


def test_join_size_skewed_lineitem(ray_session, con):
    """Heavy-key side (lineitem has up to 7 rows per orderkey):
    the estimate tracks sum f_L(k)*f_R(k), not distinct-key overlap."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import estimate_join_size

    li = rd.read_parquet("/root/testdata/sf0.01/lineitem.parquet",
                         columns=["l_orderkey"])
    orders = rd.read_parquet("/root/testdata/sf0.01/orders.parquet",
                             columns=["o_orderkey"])
    true = con.sql("SELECT count(*) FROM lineitem JOIN orders "
                   "ON l_orderkey = o_orderkey").fetchone()[0]
    r = estimate_join_size(li, orders, {"l_orderkey": "o_orderkey"})
    assert true <= r["rows_estimate"] <= true + r["bound_slack"]


def test_inner_product_matches_merged_build(ray_session):
    """Sketch built from merged partials gives the SAME inner product
    as a single-pass build (CMS merge is cell-wise exact)."""
    from bloomjoin_ray.state.cms import CountMinSketch

    rng = np.random.default_rng(7)
    a = rng.integers(0, 500, size=20_000).astype(np.uint64)
    b = rng.integers(200, 900, size=30_000).astype(np.uint64)
    one = CountMinSketch(5, 2048)
    one.update_batch(a)
    parts = []
    for chunk in np.array_split(a, 7):
        s = CountMinSketch(5, 2048)
        s.update_batch(chunk)
        parts.append(s)
    merged = parts[0]
    for s in parts[1:]:
        merged.merge(s)
    sb = CountMinSketch(5, 2048)
    sb.update_batch(b)
    assert np.array_equal(merged.table, one.table)
    assert merged.inner_product(sb) == one.inner_product(sb)
    # exact inner product of the frequency vectors, for the bound check
    ka, ca = np.unique(a, return_counts=True)
    kb, cb = np.unique(b, return_counts=True)
    common, ia, ib = np.intersect1d(ka, kb, return_indices=True)
    true = int((ca[ia].astype(np.int64) * cb[ib]).sum())
    est = one.inner_product(sb)
    assert true <= est <= true + one.epsilon * len(a) * len(b)


def test_inner_product_shape_mismatch_raises():
    from bloomjoin_ray.state.cms import CountMinSketch

    with pytest.raises(ValueError, match="identical"):
        CountMinSketch(5, 2048).inner_product(CountMinSketch(5, 4096))


def test_join_size_cross_type_keys(ray_session):
    """Canonical key hashing: an int32 column joined to the same values
    as int64 estimates the same size as same-type keys."""
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import estimate_join_size

    rng = np.random.default_rng(3)
    k = rng.integers(0, 200, size=5000)
    left = rd.from_arrow(pa.table({"k": pa.array(k, type=pa.int32())}))
    right32 = rd.from_arrow(pa.table({"k": pa.array(k[:2500],
                                                    type=pa.int32())}))
    right64 = rd.from_arrow(pa.table({"k": pa.array(k[:2500],
                                                    type=pa.int64())}))
    r32 = estimate_join_size(left, right32, "k")
    r64 = estimate_join_size(left, right64, "k")
    assert r32["rows_estimate"] == r64["rows_estimate"]
