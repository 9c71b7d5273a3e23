"""KMV / theta sketch: mergeable distinct counting WITH set operations.

Keeps the k minimum 64-bit hash values (bottom-k). With ``theta`` = the
k-th smallest hash scaled to (0,1], the distinct estimate is
``(k-1)/theta`` — standard error ~ 1/sqrt(k-2). Unlike HLL, theta
sketches compose under set algebra:

* union: merge bottom-k sets, keep k smallest (exact mergeability);
* intersection / difference: restrict both sketches to hashes below
  ``min(theta_a, theta_b)`` and count overlap — the classic theta-sketch
  estimator (Dasgupta et al., the DataSketches construction).

That makes "distinct conv_ids in A ∩ B" answerable from two independently
built sketches — the set-expression capability the HLL family lacks.
"""

from __future__ import annotations

import numpy as np

from .base import pack_state, register_sketch, unpack_state

_MAX = np.float64(2.0**64)


@register_sketch("theta")
class ThetaSketch:
    def __init__(self, k: int = 4096):
        if k < 16:
            raise ValueError("k must be >= 16")
        self.k = int(k)
        self.hashes = np.empty(0, dtype=np.uint64)  # sorted ascending, unique

    @property
    def theta(self) -> float:
        """Sampling threshold in (0, 1]."""
        if len(self.hashes) < self.k:
            return 1.0
        return float(self.hashes[self.k - 1]) / float(_MAX)

    @property
    def rel_error(self) -> float:
        return 1.0 / np.sqrt(self.k - 2)

    def update_batch(self, hashes: np.ndarray) -> None:
        h = np.unique(hashes.astype(np.uint64, copy=False))
        self.hashes = np.union1d(self.hashes, h)[: self.k]

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        if self.k != other.k:
            raise ValueError("cannot merge theta sketches with different k")
        self.hashes = np.union1d(self.hashes, other.hashes)[: self.k]
        return self

    def estimate(self) -> float:
        n = len(self.hashes)
        if n < self.k:
            return float(n)  # exact below capacity
        return float((self.k - 1) / self.theta)

    # -- set algebra -----------------------------------------------------
    def _common_sample(self, other: "ThetaSketch"):
        theta = min(self.theta, other.theta)
        if theta >= 1.0:  # both below capacity — samples are exact sets
            return 1.0, self.hashes, other.hashes
        cut = np.uint64(theta * float(_MAX))
        a = self.hashes[self.hashes <= cut]
        b = other.hashes[other.hashes <= cut]
        return theta, a, b

    def intersection_estimate(self, other: "ThetaSketch") -> float:
        theta, a, b = self._common_sample(other)
        return float(len(np.intersect1d(a, b)) / theta)

    def union_estimate(self, other: "ThetaSketch") -> float:
        # the union SAMPLE (all hashes below the common theta, from either
        # side) may hold up to 2k entries — never clamp it to k
        theta, a, b = self._common_sample(other)
        u = np.union1d(a, b)
        if theta >= 1.0:
            return float(len(u))
        return float(len(u) / theta)

    def difference_estimate(self, other: "ThetaSketch") -> float:
        """|self \\ other| estimate."""
        theta, a, b = self._common_sample(other)
        return float(len(np.setdiff1d(a, b)) / theta)

    def jaccard_estimate(self, other: "ThetaSketch") -> float:
        theta, a, b = self._common_sample(other)
        u = len(np.union1d(a, b))
        if u == 0:
            return 0.0
        return float(len(np.intersect1d(a, b)) / u)

    # -- serialization ---------------------------------------------------
    def to_bytes(self) -> bytes:
        return pack_state("theta", {"k": self.k}, {"hashes": self.hashes})

    @classmethod
    def _from_state(cls, meta, arrays) -> "ThetaSketch":
        obj = cls(int(meta["k"]))
        obj.hashes = arrays["hashes"]
        return obj

    @classmethod
    def from_bytes(cls, blob: bytes) -> "ThetaSketch":
        name, meta, arrays = unpack_state(blob)
        if name != "theta":
            raise ValueError(f"expected theta blob, got {name!r}")
        return cls._from_state(meta, arrays)
