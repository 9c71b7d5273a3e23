"""Sketch property tests: estimates within published bounds, merge
associativity/commutativity under arbitrary partition orderings (the
north-rule requirement), serialization round-trips."""

import numpy as np
import pytest

from bloomjoin_ray.state.base import sketch_from_bytes
from bloomjoin_ray.state.cms import CountMinSketch
from bloomjoin_ray.state.hll import HllSketch
from bloomjoin_ray.state.kll import KllSketch
from bloomjoin_ray.state.tdigest import TDigest


def _hashes(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**64, size=n, dtype=np.uint64)


# ---------------------------------------------------------------- HLL ----

@pytest.mark.parametrize("true_n", [100, 10_000, 1_000_000])
def test_hll_within_bound(true_n):
    h = HllSketch(p=14)
    h.update_batch(_hashes(true_n, seed=true_n))
    est = h.estimate()
    assert abs(est - true_n) / true_n < 4 * h.rel_error  # 4σ of 1.04/√m


def test_hll_merge_equals_single_and_order_free():
    hashes = _hashes(200_000, 5)
    single = HllSketch(p=12)
    single.update_batch(hashes)
    parts = []
    for chunk in np.array_split(hashes, 9):
        s = HllSketch(p=12)
        s.update_batch(chunk)
        parts.append(s)
    rng = np.random.default_rng(0)
    order = rng.permutation(9)
    merged = HllSketch.from_bytes(parts[order[0]].to_bytes())
    for i in order[1:]:
        merged.merge(parts[i])
    np.testing.assert_array_equal(merged.registers, single.registers)


def test_hll_duplicates_dont_inflate():
    h = HllSketch(p=12)
    base = _hashes(1000, 1)
    for _ in range(5):
        h.update_batch(base)
    assert abs(h.estimate() - 1000) / 1000 < 4 * h.rel_error


def test_hll_roundtrip_and_errors():
    h = HllSketch(p=10)
    h.update_batch(_hashes(500, 2))
    g = sketch_from_bytes(h.to_bytes())
    np.testing.assert_array_equal(g.registers, h.registers)
    with pytest.raises(ValueError):
        HllSketch(3)
    with pytest.raises(ValueError):
        HllSketch(10).merge(HllSketch(11))


# ---------------------------------------------------------------- CMS ----

def test_cms_never_undercounts_and_bound():
    rng = np.random.default_rng(7)
    # zipf-ish counts over 2000 keys
    keys = _hashes(2000, 3)
    counts = (10000 / np.arange(1, 2001) ** 1.2).astype(np.int64) + 1
    c = CountMinSketch(depth=5, width=4096)
    c.update_batch(keys, counts)
    est = c.query_batch(keys)
    assert (est >= counts).all()  # never undercount
    overshoot = est - counts
    assert (overshoot <= c.epsilon * c.total).mean() > 0.99  # ε·N bound w.h.p.


def test_cms_merge_equals_single():
    keys = _hashes(5000, 4)
    single = CountMinSketch(4, 2048)
    single.update_batch(keys)
    parts = []
    for chunk in np.array_split(keys, 7):
        s = CountMinSketch(4, 2048)
        s.update_batch(chunk)
        parts.append(s)
    merged = parts[3]
    for i in (6, 0, 5, 1, 4, 2):
        merged = merged.merge(parts[i])
    np.testing.assert_array_equal(merged.table, single.table)
    assert merged.total == single.total


def test_cms_roundtrip():
    c = CountMinSketch(3, 512)
    c.update_batch(_hashes(100, 5))
    g = CountMinSketch.from_bytes(c.to_bytes())
    np.testing.assert_array_equal(g.table, c.table)
    assert g.total == c.total


# ------------------------------------------------------------ t-digest ----

def test_tdigest_quantile_accuracy():
    rng = np.random.default_rng(11)
    data = rng.normal(size=200_000)
    td = TDigest(delta=200)
    for chunk in np.array_split(data, 20):
        td.update_batch(chunk)
    exact = np.quantile(data, [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
    est = td.quantile(np.array([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]))
    # rank error: |cdf(est) - q| small, tighter at tails
    for q, e in zip([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99], est):
        r = (data <= e).mean()
        tol = 0.005 if q in (0.01, 0.99) else 0.02
        assert abs(r - q) < tol, (q, r)
    assert len(td.means) <= 2 * td.delta  # size bound


def test_tdigest_merge_shuffled_partitions_within_bound():
    rng = np.random.default_rng(13)
    data = rng.exponential(size=100_000)
    parts = []
    for chunk in np.array_split(data, 16):
        t = TDigest(delta=200)
        t.update_batch(chunk)
        parts.append(t)
    order = rng.permutation(16)
    merged = TDigest.from_bytes(parts[order[0]].to_bytes())
    for i in order[1:]:
        merged.merge(parts[i])
    for q in (0.05, 0.5, 0.95):
        est = merged.quantile(q)
        r = (data <= est).mean()
        assert abs(r - q) < 0.025, (q, r)
    assert merged.min == data.min() and merged.max == data.max()


def test_tdigest_min_max_and_empty():
    td = TDigest()
    assert np.isnan(td.quantile(0.5))
    td.update_batch(np.array([5.0]))
    assert td.quantile(0.0) == 5.0 and td.quantile(1.0) == 5.0


# ---------------------------------------------------------------- KLL ----

def test_kll_rank_error_bound():
    rng = np.random.default_rng(17)
    data = rng.uniform(size=100_000)
    k = KllSketch(k=200)
    for chunk in np.array_split(data, 10):
        k.update_batch(chunk)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = k.quantile(q)
        r = (data <= est).mean()
        assert abs(r - q) < 0.03, (q, r)  # ~1.65% @ k=200, conservative 3%
    assert k.n == 100_000


def test_kll_merge_shuffled_partitions():
    rng = np.random.default_rng(19)
    data = rng.normal(size=80_000)
    parts = []
    for chunk in np.array_split(data, 8):
        s = KllSketch(k=200)
        s.update_batch(chunk)
        parts.append(s)
    order = rng.permutation(8)
    merged = KllSketch.from_bytes(parts[order[0]].to_bytes())
    for i in order[1:]:
        merged.merge(parts[i])
    assert merged.n == 80_000
    for q in (0.1, 0.5, 0.9):
        r = (data <= merged.quantile(q)).mean()
        assert abs(r - q) < 0.04, (q, r)


def test_kll_deterministic():
    data = np.arange(50_000, dtype=np.float64)
    a, b = KllSketch(k=128), KllSketch(k=128)
    a.update_batch(data)
    b.update_batch(data)
    assert a.quantile(0.5) == b.quantile(0.5)
    g = KllSketch.from_bytes(a.to_bytes())
    assert g.quantile(0.25) == a.quantile(0.25)


def test_kll_space_bound():
    k = KllSketch(k=200)
    k.update_batch(np.random.default_rng(0).uniform(size=1_000_000))
    assert k._size() < 3000  # O(k log log n), far below n


def test_ams_f2_bound_merge_and_roundtrip():
    """AMS tug-of-war: |est − F2| ≤ ε·F2 across seeds/skews; merge of
    arbitrary stream partitions is BIT-identical to the single-pass
    build (linear sketch, int64 counters); blob roundtrip works via the
    worker registry."""
    import numpy as np

    from bloomjoin_ray.state.ams import AmsSketch
    from bloomjoin_ray.state.base import sketch_from_bytes

    rng = np.random.default_rng(77)
    for trial, alpha in enumerate([1.1, 1.5, 2.5]):
        for seed in range(4):
            n = 40_000
            keys = rng.zipf(alpha, size=n) % 5000
            h = np.frombuffer(
                np.ascontiguousarray(keys, dtype=np.int64).tobytes(),
                dtype=np.uint64).copy()
            # decorate so distinct keys get distinct 64-bit patterns
            from bloomjoin_ray.functions.keys import splitmix64
            h = splitmix64(h)
            _, counts = np.unique(h, return_counts=True)
            f2 = int((counts.astype(np.float64) ** 2).sum())

            s = AmsSketch(depth=7, width=2048)
            s.update_batch(h)
            est = s.estimate_f2()
            assert abs(est - f2) <= s.epsilon * f2, (alpha, seed, est, f2)

            # merge == single pass, bit-exact, under a random 5-way split
            parts = np.sort(rng.integers(0, len(h), 4))
            chunks = np.split(h, parts)
            rng.shuffle(chunks)
            merged = AmsSketch(depth=7, width=2048)
            for c in chunks:
                p = AmsSketch(depth=7, width=2048)
                p.update_batch(c)
                merged.merge(p)
            assert np.array_equal(merged.table, s.table)
            assert merged.total == s.total == n

    rt = sketch_from_bytes(s.to_bytes())
    assert isinstance(rt, AmsSketch) and np.array_equal(rt.table, s.table)
    import pytest
    with pytest.raises(ValueError, match="depth, width"):
        s.merge(AmsSketch(depth=5, width=2048))
    with pytest.raises(ValueError, match="depth must be"):
        AmsSketch(depth=0)


def test_ams_f2_pipeline_vs_exact(ray_session):
    """ams_f2 over the events table lands within its ε bound of the
    exact self-join size, and weighted counts match repetition."""
    import duckdb
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import ams_f2

    ds = rd.read_parquet("/root/testdata/sf0.01/events.parquet")
    got = ams_f2(ds, "user_id", depth=7, width=8192)
    exact = duckdb.sql("""
        SELECT CAST(sum(c * c) AS BIGINT) FROM (
            SELECT count(*) AS c
            FROM '/root/testdata/sf0.01/events.parquet'
            GROUP BY user_id)
    """).fetchone()[0]
    assert abs(got["f2_estimate"] - exact) <= got["epsilon"] * exact
    assert got["n_rows"] == ds.count()
    assert 0.0 < got["skew"] <= 1.0
    assert got["avg_multiplicity"] == got["f2_estimate"] / got["n_rows"]
