"""Merged-filter FPR at multiple partition counts (SURVEY §7.4 risk):
the reference builds one filter from all keys at once; the distributed
build merges per-partition partials sized from a global estimate. The
FPR target must hold for the MERGED filter regardless of how the build
side was partitioned — measured exactly like the reference's
tests/testthat/test-fpr-target.R, on disjoint key sets."""

import numpy as np
import pytest

from bloomjoin_ray.params import bloom_sizing
from bloomjoin_ray.state.bloom import BloomSketch


@pytest.mark.parametrize("n_partitions", [1, 4, 16, 64])
@pytest.mark.parametrize("p", [1e-1, 1e-2, 1e-3])
def test_merged_fpr_meets_target(n_partitions, p):
    n = 100_000
    build = np.arange(n, dtype=np.int32)
    probe = np.arange(n, 2 * n, dtype=np.int32)
    m, k = bloom_sizing(n, p)  # global sizing, as the planner decides it
    merged = None
    for chunk in np.array_split(build, n_partitions):
        f = BloomSketch(n, p, _m=m, _k=k)
        f.add_batch(chunk)
        merged = f if merged is None else merged.merge(f)
    assert merged.contains_batch(build).all()  # zero false negatives
    measured = merged.contains_batch(probe).mean()
    assert measured <= p * 1.35 + 3.0 / n


def test_overlapping_partitions_do_not_overshoot():
    """Duplicated keys across partitions (e.g. a retried block) must not
    change the merged filter at all — idempotent OR."""
    n = 50_000
    keys = np.arange(n, dtype=np.int32)
    m, k = bloom_sizing(n, 1e-2)
    a = BloomSketch(n, 1e-2, _m=m, _k=k)
    a.add_batch(keys)
    b = BloomSketch(n, 1e-2, _m=m, _k=k)
    b.add_batch(keys[: n // 2])  # retry of the first half
    merged = a.merge(b)
    single = BloomSketch(n, 1e-2, _m=m, _k=k)
    single.add_batch(keys)
    np.testing.assert_array_equal(merged.words, single.words)


def test_underestimated_sizing_degrades_gracefully():
    """If the distinct estimate was 4x too low, the merged filter's FPR
    exceeds the target but stays bounded by the closed form for the true
    load — the documented estimate-driven behavior, never a correctness
    issue (the exact join removes every false positive)."""
    from bloomjoin_ray.params import bloom_achieved_fpr

    true_n, est_n = 100_000, 25_000
    m, k = bloom_sizing(est_n, 1e-3)
    f = BloomSketch(est_n, 1e-3, _m=m, _k=k)
    f.add_batch(np.arange(true_n, dtype=np.int32))
    probe = np.arange(true_n, 2 * true_n, dtype=np.int32)
    measured = f.contains_batch(probe).mean()
    bound = bloom_achieved_fpr(m, true_n, k)
    assert measured <= bound * 1.3 + 1e-4
    assert f.contains_batch(np.arange(true_n, dtype=np.int32)).all()
