"""Property-based tests (hypothesis): the equality contract of the key
hash and merge laws of every sketch under arbitrary partitionings."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from bloomjoin_ray.functions.keys import hash_keys32, hash_keys64
from bloomjoin_ray.params import bloom_achieved_fpr, bloom_sizing
from bloomjoin_ray.state.cms import CountMinSketch
from bloomjoin_ray.state.hll import HllSketch, SparseHll
from bloomjoin_ray.state.kll import KllSketch
from bloomjoin_ray.state.tdigest import TDigest

ints = st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1),
                min_size=1, max_size=60)


@given(ints)
@settings(max_examples=50, deadline=None)
def test_int_float_hash_unification(vals):
    """Any int32-representable values hash identically as int64 / float64."""
    a = hash_keys32(pa.table({"k": pa.array(vals, type=pa.int64())}), ["k"])
    b = hash_keys32(pa.table({"k": pa.array([float(v) for v in vals],
                                            type=pa.float64())}), ["k"])
    np.testing.assert_array_equal(a, b)


@given(st.lists(st.text(max_size=30) | st.none(), min_size=1, max_size=40))
@settings(max_examples=50, deadline=None)
def test_string_dictionary_hash_unification(vals):
    plain = pa.table({"k": pa.array(vals, type=pa.string())})
    dic = pa.table({"k": pa.array(vals, type=pa.string()).dictionary_encode()})
    np.testing.assert_array_equal(hash_keys32(plain, ["k"]),
                                  hash_keys32(dic, ["k"]))


@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=500),
       st.integers(2, 6), st.randoms())
@settings(max_examples=30, deadline=None)
def test_hll_merge_partition_invariant(hashes, n_parts, rnd):
    """HLL registers after merging any partitioning, in any order, equal
    the single-pass build (exact merge law)."""
    h = np.array(hashes, dtype=np.uint64)
    single = HllSketch(p=8)
    single.update_batch(h)
    chunks = np.array_split(h, n_parts)
    rnd.shuffle(chunks)
    parts = []
    for c in chunks:
        s = HllSketch(p=8)
        s.update_batch(c)
        parts.append(s)
    merged = parts[0]
    for s in parts[1:]:
        merged = merged.merge(s)
    np.testing.assert_array_equal(merged.registers, single.registers)


@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=300),
       st.integers(2, 5))
@settings(max_examples=30, deadline=None)
def test_sparse_hll_estimate_exact_below_cap(hashes, n_parts):
    h = np.array(hashes, dtype=np.uint64)
    parts = []
    for c in np.array_split(h, n_parts):
        s = SparseHll(p=12, cap=4096)
        s.update_batch(c)
        parts.append(s)
    merged = parts[0]
    for s in parts[1:]:
        merged = merged.merge(s)
    assert merged.estimate() == len(np.unique(h))


@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=300),
       st.integers(2, 5))
@settings(max_examples=30, deadline=None)
def test_cms_merge_partition_invariant(hashes, n_parts):
    h = np.array(hashes, dtype=np.uint64)
    single = CountMinSketch(3, 64)
    single.update_batch(h)
    merged = None
    for c in np.array_split(h, n_parts):
        s = CountMinSketch(3, 64)
        s.update_batch(c)
        merged = s if merged is None else merged.merge(s)
    np.testing.assert_array_equal(merged.table, single.table)
    est = merged.query_batch(np.unique(h))
    _, true_counts = np.unique(h, return_counts=True)
    assert (est >= true_counts).all()  # CMS never undercounts, any split


@given(st.lists(st.floats(-1e6, 1e6), min_size=10, max_size=500),
       st.integers(2, 5))
@settings(max_examples=20, deadline=None)
def test_tdigest_quantiles_bounded_any_partitioning(vals, n_parts):
    v = np.array(vals, dtype=np.float64)
    merged = None
    for c in np.array_split(v, n_parts):
        t = TDigest(100)
        t.update_batch(c)
        merged = t if merged is None else merged.merge(t)
    for q in (0.0, 0.5, 1.0):
        est = merged.quantile(q)
        assert v.min() <= est <= v.max()
    assert merged.quantile(0.0) == v.min()
    assert merged.quantile(1.0) == v.max()


@given(st.lists(st.floats(-1e6, 1e6), min_size=20, max_size=400),
       st.integers(2, 4))
@settings(max_examples=20, deadline=None)
def test_kll_rank_bounded_any_partitioning(vals, n_parts):
    v = np.array(vals, dtype=np.float64)
    merged = None
    for c in np.array_split(v, n_parts):
        s = KllSketch(k=64)
        s.update_batch(c)
        merged = s if merged is None else merged.merge(s)
    assert merged.n == len(v)
    med = merged.quantile(0.5)
    # with ties the true rank of `med` is an interval [P(v<med), P(v<=med)]
    r_lo, r_hi = (v < med).mean(), (v <= med).mean()
    assert r_lo <= 0.5 + 0.35 and r_hi >= 0.5 - 0.35  # loose: tiny k, tiny n


@given(st.integers(1, 10**9), st.floats(1e-6, 0.9))
@settings(max_examples=100, deadline=None)
def test_sizing_always_meets_target(n, p):
    m, k = bloom_sizing(n, p)
    assert m & (m - 1) == 0
    assert 1 <= k <= 64
    if m < (1 << 40):  # below the cap the target must be met
        assert bloom_achieved_fpr(m, n, k) <= p


@given(st.lists(st.floats(-1e12, 1e12, allow_nan=False,
                          allow_infinity=False),
                min_size=1, max_size=400),
       st.integers(1, 6))
@settings(max_examples=40, deadline=None)
def test_ddsketch_alpha_bound_any_partitioning(vals, n_parts):
    """DDSketch: merged partials keep the alpha relative-VALUE bound at
    every quantile, for any split of the input."""
    from bloomjoin_ray.state.ddsketch import DDSketch

    alpha = 0.02
    acc = None
    arr = np.asarray(vals, dtype=np.float64)
    # size the store for hypothesis' full float range (1e-280..1e12 is
    # ~17k log-gamma buckets) so no collapse — the uncollapsed guarantee
    # is the property; collapse has its own dedicated test
    for chunk in np.array_split(arr, n_parts):
        p = DDSketch(alpha=alpha, max_buckets=25_000)
        p.update_batch(chunk)
        acc = p if acc is None else acc.merge(p)
    assert not acc.collapsed
    xs = np.sort(arr)
    qs = np.asarray([0.0, 0.25, 0.5, 0.75, 1.0])
    true = xs[np.floor(qs * (len(xs) - 1)).astype(int)]
    est = acc.quantile(qs)
    # zero bucket: values below the indexable floor report exactly 0
    tiny = np.abs(true) < 1e-280
    assert (np.abs(est[tiny]) <= 1e-280).all()
    nz = ~tiny
    rel = np.abs(est[nz] - true[nz]) / np.abs(true[nz])
    assert (rel <= alpha + 1e-9).all()


@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=300),
       st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=300),
       st.integers(1, 5))
@settings(max_examples=40, deadline=None)
def test_cms_inner_product_bound_any_partitioning(ha, hb, n_parts):
    """CMS inner product: never undercounts, over by <= eps*Na*Nb, and
    is invariant to how either side's build was partitioned."""
    a = np.asarray(ha, dtype=np.uint64)
    b = np.asarray(hb, dtype=np.uint64)
    one = CountMinSketch(4, 512)
    one.update_batch(a)
    acc = None
    for chunk in np.array_split(a, n_parts):
        p = CountMinSketch(4, 512)
        p.update_batch(chunk)
        acc = p if acc is None else acc.merge(p)
    sb = CountMinSketch(4, 512)
    sb.update_batch(b)
    est = one.inner_product(sb)
    assert acc.inner_product(sb) == est
    ka, ca = np.unique(a, return_counts=True)
    kb, cb = np.unique(b, return_counts=True)
    common, ia, ib = np.intersect1d(ka, kb, return_indices=True)
    true = int((ca[ia].astype(np.int64) * cb[ib]).sum())
    assert true <= est <= true + one.epsilon * len(a) * len(b) + 1e-9
