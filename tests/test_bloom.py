"""Bloom filter battery — translation of the reference's
tests/testthat/test-fpr-target.R plus merge properties the distributed
engine adds (partials with one global layout OR together)."""

import numpy as np
import pytest

from bloomjoin_ray.params import bloom_sizing
from bloomjoin_ray.state.base import sketch_from_bytes
from bloomjoin_ray.state.bloom import BloomSketch


def _rand_keys(n, seed, lo=0):
    rng = np.random.default_rng(seed)
    return (lo + rng.permutation(n * 2)[:n]).astype(np.int64).astype(np.int32)


def test_zero_false_negatives():
    keys = np.arange(100_000, dtype=np.int32)
    for p in (1e-1, 1e-2, 1e-3):
        f = BloomSketch(len(keys), p)
        f.add_batch(keys)
        assert f.contains_batch(keys).all()


@pytest.mark.parametrize("p", [1e-1, 1e-2, 1e-3, 1e-4, 1e-5])
def test_fpr_at_or_under_target(p):
    n = 100_000
    build = np.arange(n, dtype=np.int32)
    probe = np.arange(n, 2 * n, dtype=np.int32)  # disjoint
    f = BloomSketch(n, p)
    f.add_batch(build)
    fpr = f.contains_batch(probe).mean()
    assert fpr <= p * 1.35 + 3.0 / n  # small slack for measurement noise


def test_fpr_monotone_in_p():
    n = 50_000
    build = np.arange(n, dtype=np.int32)
    probe = np.arange(n, 2 * n, dtype=np.int32)
    rates = []
    for p in (1e-1, 1e-2, 1e-3):
        f = BloomSketch(n, p)
        f.add_batch(build)
        rates.append(f.contains_batch(probe).mean())
    assert rates[0] >= rates[1] >= rates[2]


def test_merge_equals_single_build():
    """Partial filters built per block, OR-merged, must equal the filter
    built in one pass — the mergeability the distributed build relies on."""
    n = 60_000
    keys = _rand_keys(n, 7)
    single = BloomSketch(n, 1e-3)
    single.add_batch(keys)

    m, k = bloom_sizing(n, 1e-3)
    parts = []
    for chunk in np.array_split(keys, 7):
        f = BloomSketch(n, 1e-3, _m=m, _k=k)
        f.add_batch(chunk)
        parts.append(f)
    # merge in a shuffled order (associativity/commutativity)
    order = [3, 0, 6, 2, 5, 1, 4]
    merged = parts[order[0]]
    for i in order[1:]:
        merged = merged.merge(parts[i])
    np.testing.assert_array_equal(merged.words, single.words)


def test_merge_layout_mismatch_raises():
    a = BloomSketch(1000, 0.01)
    b = BloomSketch(10_000_000, 0.0001)
    with pytest.raises(ValueError):
        a.merge(b)


def test_serialization_roundtrip():
    keys = _rand_keys(10_000, 3)
    f = BloomSketch(10_000, 1e-2)
    f.add_batch(keys)
    f.add_na()
    g = BloomSketch.from_bytes(f.to_bytes())
    assert (g.m, g.k, g.has_na) == (f.m, f.k, True)
    np.testing.assert_array_equal(g.words, f.words)
    assert g.contains_batch(keys).all()
    h = sketch_from_bytes(f.to_bytes())
    np.testing.assert_array_equal(h.words, f.words)


def test_bits_set_and_na():
    f = BloomSketch(1000, 0.01)
    assert f.bits_set() == 0
    f.add_batch(np.array([1, 2, 3], dtype=np.int32))
    assert 0 < f.bits_set() <= 3 * f.k
    assert not f.contains_na()
    f.add_na()
    assert f.contains_na()


def test_empty_batch_noop():
    f = BloomSketch(100, 0.01)
    f.add_batch(np.array([], dtype=np.int32))
    assert f.bits_set() == 0
    assert f.contains_batch(np.array([], dtype=np.int32)).shape == (0,)


def test_estimate_cardinality_fill_ratio():
    """Swamidass–Baldi fill-ratio estimate: within 5% of the true
    distinct count at sane fills, identical after split-build + merge
    (same bit array), 0 when empty, clamped lower bound when saturated."""
    import numpy as np

    from bloomjoin_ray.state.bloom import BloomSketch

    rng = np.random.default_rng(5)
    for n in (200, 5_000, 30_000):
        s = BloomSketch(expected_elements=30_000, fpr=0.01)
        keys = rng.choice(2**31 - 1, size=n, replace=False).astype(np.int32)
        s.add_batch(keys)
        est = s.estimate_cardinality()
        assert abs(est - n) <= 0.05 * n, (n, est)
        # split-build + merge sets the same bits -> same estimate
        m = BloomSketch(expected_elements=30_000, fpr=0.01)
        for chunk in np.array_split(keys, 7):
            p = BloomSketch(expected_elements=30_000, fpr=0.01)
            p.add_batch(chunk)
            m.merge(p)
        assert m.estimate_cardinality() == est
        assert 0.0 < s.fill_ratio() < 1.0

    assert BloomSketch(1000, 0.01).estimate_cardinality() == 0
    sat = BloomSketch(16, 0.5, _m=64, _k=1)
    sat.words[:] = np.uint64(0xFFFFFFFFFFFFFFFF)
    assert sat.fill_ratio() == 1.0
    assert sat.estimate_cardinality() == round(-64 * np.log1p(-63 / 64))
