"""Xor filter (engine='fuse'): zero false negatives, ~2^-w FPR,
round-vectorized peeling construction, serialization."""

import numpy as np
import pytest

from bloomjoin_ray.state.xorfuse import XorFuseFilter, fingerprint_bits_for


def _keys(n, seed=1):
    return np.random.default_rng(seed).integers(
        0, 2**63, size=n, dtype=np.int64).astype(np.uint64)


@pytest.mark.parametrize("n", [1, 2, 10, 1000, 100_000])
def test_zero_false_negatives(n):
    keys = np.unique(_keys(n))
    f = XorFuseFilter.build(keys, fingerprint_bits=8)
    assert f.contains_batch(keys).all()


@pytest.mark.parametrize("bits,tol", [(8, 2.5), (16, 4.0)])
def test_fpr_near_nominal(bits, tol):
    keys = np.unique(_keys(50_000, seed=2))
    f = XorFuseFilter.build(keys, fingerprint_bits=bits)
    probe = np.unique(_keys(200_000, seed=3))
    probe = probe[~np.isin(probe, keys)]
    fpr = f.contains_batch(probe).mean()
    assert fpr <= tol * 2.0 ** -bits
    if bits == 8:                      # enough probes to see the floor
        assert fpr >= 2.0 ** -bits / tol


def test_duplicates_and_empty():
    keys = np.array([5, 5, 5, 9], dtype=np.uint64)
    f = XorFuseFilter.build(keys)
    assert f.n_keys == 2
    assert f.contains_batch(np.array([5, 9], dtype=np.uint64)).all()
    empty = XorFuseFilter.build(np.empty(0, dtype=np.uint64))
    assert not empty.contains_batch(np.array([1, 2], dtype=np.uint64)).any()


def test_serialization_roundtrip():
    keys = np.unique(_keys(5000, seed=4))
    f = XorFuseFilter.build(keys, fingerprint_bits=16)
    g = XorFuseFilter.from_bytes(f.to_bytes())
    probe = _keys(10_000, seed=5)
    assert (f.contains_batch(probe) == g.contains_batch(probe)).all()
    assert g.n_keys == f.n_keys and g.fingerprint_bits == 16


def test_size_beats_bloom_at_equal_fpr():
    """The point of the engine: ~9.84 bits/key at 2^-8 FPR vs Bloom's
    ~12.8 bits/key at the same target."""
    from bloomjoin_ray.params import bloom_sizing

    n = 100_000
    keys = np.unique(_keys(n, seed=6))
    f = XorFuseFilter.build(keys, fingerprint_bits=8)
    bloom_bits, _ = bloom_sizing(len(keys), 2.0 ** -8)
    assert f.size_bits < bloom_bits


def test_fingerprint_bits_for():
    assert fingerprint_bits_for(0.01) == 8
    assert fingerprint_bits_for(2.0 ** -8) == 8
    assert fingerprint_bits_for(1e-3) == 16
    assert fingerprint_bits_for(1e-9) == 32


def test_build_fuse_filter_actual_count_budget(ray_session):
    """The gather re-checks the ACTUAL distinct-key count against
    max_bits (the planner's estimate can undercount) — ADVICE r2."""
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.stages.bloom_stages import build_fuse_filter

    t = pa.table({"k": pa.array(np.arange(5000, dtype=np.int64))})
    ds = rd.from_arrow(t)
    # 5000 actual distinct keys; budget for only ~100 → must bail
    assert build_fuse_filter(ds, ["k"], 0.01, max_bits=100 * 64) is None
    # ample budget → real filter with zero false negatives
    f = build_fuse_filter(ds, ["k"], 0.01, max_bits=1 << 30)
    assert f is not None and f.n_keys == 5000
