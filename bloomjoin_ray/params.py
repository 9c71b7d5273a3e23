"""Bloom filter sizing — single source of truth.

Mirrors the reference's ``bloom_sizing`` exactly
(``/root/reference/src/BloomFilter.h:73-128``): the helper ``bloom_params``
reports the filter the engine actually builds, so report and implementation
cannot drift (the reference's hard-won invariant, ``R/params.R:8-22``).

Standard Broder–Mitzenmacher sizing: ``m_raw = n * (-ln p) / ln(2)^2`` bits,
rounded up to a power of two (the filter indexes with a bit mask), ``k``
recomputed from the rounded ``m`` and clamped to ``[1, 64]``; then, because
an integer ``k`` can overshoot loose targets (p=0.8 → optimal k=0.36 floors
to 1 and achieves 0.85), bits are doubled until the achieved rate
``(1 - e^{-kn/m})^k`` meets the request or the 2^40-bit cap is hit.
"""

from __future__ import annotations

import math
import warnings
from dataclasses import dataclass

LN2 = 0.6931471805599453
MAX_SHIFT = 40            # filter hard-capped at 2^40 bits = 128 GiB
MAX_BITS = 1 << MAX_SHIFT
MAX_K = 64
MAX_N = int(9e15)         # reference clamp (src/BloomFilter.cpp:171-175)


def bloom_achieved_fpr(m_bits: int, n: float, k: int) -> float:
    """FPR that (m, n, k) achieves: (1 - e^{-kn/m})^k."""
    return (1.0 - math.exp(-float(k) * float(n) / float(m_bits))) ** float(k)


def bloom_sizing(expected_elements: int, false_positive_rate: float) -> tuple[int, int]:
    """(m_bits, k) for a target FPR — exact reference algorithm
    (src/BloomFilter.h:81-128)."""
    n = int(expected_elements)
    if n <= 0:
        n = 1
    if not (0.0 < false_positive_rate < 1.0):
        false_positive_rate = 0.01
    nf = float(n)
    m_raw = (-math.log(false_positive_rate) / (LN2 * LN2)) * nf

    m = 1
    while float(m) < m_raw and m < MAX_BITS:
        m <<= 1

    def k_for(bits: int) -> int:
        kk = int((float(bits) / nf) * LN2 + 0.5)
        return max(1, min(MAX_K, kk))

    k = k_for(m)
    while bloom_achieved_fpr(m, nf, k) > false_positive_rate and m < MAX_BITS:
        m <<= 1
        k = k_for(m)
    return m, k


@dataclass
class BloomParams:
    """The report ``bloom_params`` returns (R/params.R:51-60)."""

    n: float
    p_target: float
    m_bits: int
    bytes: float
    bits_per_key: float
    k: int
    fpr_est: float

    def __repr__(self) -> str:  # print.bloom_params (R/params.R:79-90)
        return (
            "Bloom filter for a target false positive rate\n"
            f"  n (expected keys): {self.n:,.10g}\n"
            f"  target FPR:        {self.p_target:.3g}\n"
            f"  total bits (m):    {self.m_bits:,}\n"
            f"  total bytes:       {self.bytes:,.10g} ({self.bytes / 1024**2:.3g} MiB)\n"
            f"  bits per key:      {self.bits_per_key:.4g}\n"
            f"  hashes (k):        {self.k}\n"
            f"  achieved FPR:      {self.fpr_est:.4g}\n"
        )


def bloom_params(n: float, p: float = 1e-2) -> BloomParams:
    """Report the filter ``bloom_join`` would build for (n, p)
    (R/params.R:39-76). Warns when the 2^40-bit cap makes the target
    unsatisfiable rather than quietly missing it."""
    if not isinstance(n, (int, float)) or not math.isfinite(n) or n <= 0:
        raise ValueError("`n` must be a positive finite numeric scalar.")
    if not isinstance(p, (int, float)) or not math.isfinite(p) or not (0.0 < p < 1.0):
        raise ValueError("`p` must be a numeric scalar strictly between 0 and 1.")

    en = 1
    if n >= 1.0:
        en = MAX_N if n > MAX_N else int(math.ceil(n))
    m_bits, k = bloom_sizing(en, float(p))

    out = BloomParams(
        n=float(n),
        p_target=float(p),
        m_bits=m_bits,
        bytes=m_bits / 8.0,
        bits_per_key=m_bits / float(n),
        k=k,
        fpr_est=bloom_achieved_fpr(m_bits, float(n), k),
    )
    if out.fpr_est > out.p_target:
        warnings.warn(
            f"Cannot reach the requested false positive rate of {p:.3g} for "
            f"n = {n:.0f}: the filter is capped at {m_bits} bits, which "
            f"achieves {out.fpr_est:.3g}.",
            stacklevel=2,
        )
    return out
