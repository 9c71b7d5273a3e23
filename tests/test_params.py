"""Sizing parity with the reference's closed forms
(/root/reference/src/BloomFilter.h:73-128, tests/testthat/test-params.R,
test-fpr-target.R:42-61)."""

import math

import pytest

from bloomjoin_ray.params import (
    MAX_BITS,
    bloom_achieved_fpr,
    bloom_params,
    bloom_sizing,
)

LN2 = math.log(2.0)


@pytest.mark.parametrize("n", [10_000, 100_000, 1_000_000])
@pytest.mark.parametrize("p", [1e-1, 1e-2, 1e-4])
def test_sizing_grid(n, p):
    m, k = bloom_sizing(n, p)
    assert m & (m - 1) == 0  # power of two
    assert m >= (-math.log(p) / (LN2 * LN2)) * n  # enough bits
    assert 1 <= k <= 64
    assert bloom_achieved_fpr(m, n, k) <= p  # achieved meets target


@pytest.mark.parametrize("p", [0.8, 0.5, 0.2])
def test_loose_targets_met(p):
    # integer-k overshoot fix: p=0.8 floors k to 1 → 0.85 without the
    # grow-until-met loop (src/BloomFilter.h:116-124)
    m, k = bloom_sizing(1_000_000, p)
    assert bloom_achieved_fpr(m, 1_000_000, k) <= p


def test_extreme_target():
    m, k = bloom_sizing(10, 1e-20)
    assert bloom_achieved_fpr(m, 10, k) <= 1e-20


def test_unsatisfiable_warns_and_caps():
    with pytest.warns(UserWarning):
        bp = bloom_params(1e12, 1e-9)
    assert bp.m_bits == MAX_BITS
    assert bp.fpr_est > bp.p_target


def test_params_report_matches_sizing():
    bp = bloom_params(1e6, 1e-2)
    m, k = bloom_sizing(10**6, 1e-2)
    assert bp.m_bits == m and bp.k == k
    assert bp.bytes == m / 8
    assert bp.bits_per_key == m / 1e6
    assert bp.fpr_est == bloom_achieved_fpr(m, 1e6, k)
    assert "achieved FPR" in repr(bp)


def test_params_validation():
    with pytest.raises(ValueError):
        bloom_params(-1, 0.01)
    with pytest.raises(ValueError):
        bloom_params(100, 0.0)
    with pytest.raises(ValueError):
        bloom_params(100, 1.0)
    with pytest.raises(ValueError):
        bloom_params(float("inf"), 0.5)
