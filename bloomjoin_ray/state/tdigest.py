"""t-digest quantile sketch (Dunning's merging variant, vectorized).

Centroids ``(mean, weight)`` kept sorted by mean; compression assigns each
centroid to a bin of the k1 scale function ``k(q) = (δ/2π)·asin(2q−1)``
and merges within bins — the fully-vectorized form of the merging t-digest
(no per-centroid Python loop), which preserves the t-digest size bound
(≤ ~δ centroids) and its characteristic accuracy profile: relative error
tightest at the tails. Exact min/max are tracked for tail interpolation.

Mergeable: concatenate centroid sets and re-compress. Merge order affects
the exact centroid layout (approximate-but-bounded, unlike Bloom-OR /
HLL-max / CMS-add); the property tests check quantile accuracy *after*
merging under shuffled partition orders.
"""

from __future__ import annotations

import numpy as np

from .base import pack_state, register_sketch, unpack_state


@register_sketch("tdigest")
class TDigest:
    def __init__(self, delta: int = 200):
        if delta < 20:
            raise ValueError("delta must be >= 20")
        self.delta = int(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.min = np.inf
        self.max = -np.inf

    @property
    def total_weight(self) -> float:
        return float(self.weights.sum())

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        if total == 0:
            self.means, self.weights = means[:0], weights[:0]
            return
        qmid = (np.cumsum(weights) - 0.5 * weights) / total
        k = (self.delta / (2.0 * np.pi)) * np.arcsin(np.clip(2.0 * qmid - 1.0, -1.0, 1.0))
        bins = np.floor(k).astype(np.int64)
        bounds = np.nonzero(np.diff(bins, prepend=bins[0] - 1))[0]
        w = np.add.reduceat(weights, bounds)
        m = np.add.reduceat(weights * means, bounds) / w
        self.means, self.weights = m, w

    def update_batch(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        w = np.ones(len(v)) if weights is None else np.asarray(weights, dtype=np.float64)
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self._compress(np.concatenate([self.means, v]),
                       np.concatenate([self.weights, w]))

    def merge(self, other: "TDigest") -> "TDigest":
        if self.delta != other.delta:
            raise ValueError("cannot merge t-digests with different delta")
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._compress(np.concatenate([self.means, other.means]),
                       np.concatenate([self.weights, other.weights]))
        return self

    def quantile(self, q) -> float | np.ndarray:
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.weights.size == 0:
            out = np.full(len(qs), np.nan)
            return out[0] if np.isscalar(q) else out
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - 0.5 * self.weights
        # interpolation anchors: min, centroid midpoints, max
        xs = np.concatenate([[0.0], cum, [total]])
        ys = np.concatenate([[self.min], self.means, [self.max]])
        out = np.interp(qs * total, xs, ys)
        return float(out[0]) if np.isscalar(q) else out

    def cdf(self, x) -> float | np.ndarray:
        xs_in = np.atleast_1d(np.asarray(x, dtype=np.float64))
        if self.weights.size == 0:
            out = np.full(len(xs_in), np.nan)
            return out[0] if np.isscalar(x) else out
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - 0.5 * self.weights
        xs = np.concatenate([[self.min], self.means, [self.max]])
        ys = np.concatenate([[0.0], cum / total, [1.0]])
        out = np.interp(xs_in, xs, ys)
        return float(out[0]) if np.isscalar(x) else out

    def to_bytes(self) -> bytes:
        return pack_state("tdigest",
                          {"delta": self.delta, "min": self.min, "max": self.max},
                          {"means": self.means, "weights": self.weights})

    @classmethod
    def _from_state(cls, meta, arrays) -> "TDigest":
        obj = cls(int(meta["delta"]))
        obj.min = float(meta["min"])
        obj.max = float(meta["max"])
        obj.means = arrays["means"]
        obj.weights = arrays["weights"]
        return obj

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        name, meta, arrays = unpack_state(blob)
        if name != "tdigest":
            raise ValueError(f"expected tdigest blob, got {name!r}")
        return cls._from_state(meta, arrays)
