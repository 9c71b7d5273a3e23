"""Count–min sketch: frequency estimation / heavy hitters.

Standard Cormode–Muthukrishnan CMS: ``depth`` rows × ``width`` int64
counters; each update adds its count at one cell per row, a point query
takes the min across rows. Published bound: the estimate overshoots the
true count by at most ``ε·N`` (N = total count) with probability
``1 − δ``, where ``ε = e/width`` and ``δ = e^−depth``. Never undercounts.

Mergeable by cell-wise addition — per-block partials from ``map_batches``
tasks sum in any order. Updates consume 64-bit key hashes
(``hash_keys64``); the d row positions derive from one splitmix64 re-mix
per row (independent enough and cheap, same construction as the key
hasher's finalizer).
"""

from __future__ import annotations

import numpy as np

from ..functions.keys import splitmix64
from .base import pack_state, register_sketch, unpack_state

U64 = np.uint64


@register_sketch("cms")
class CountMinSketch:
    def __init__(self, depth: int = 5, width: int = 4096):
        if depth < 1 or width < 8:
            raise ValueError("depth must be >= 1 and width >= 8")
        self.depth = depth
        self.width = width
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.total = 0

    @property
    def epsilon(self) -> float:
        """Over-count factor: est ≤ true + ε·N w.p. 1−δ."""
        return float(np.e) / self.width

    @property
    def delta(self) -> float:
        return float(np.exp(-self.depth))

    def _positions(self, hashes: np.ndarray, row: int) -> np.ndarray:
        h = splitmix64(hashes.astype(np.uint64, copy=False) ^ U64(0x5851F42D4C957F2D * (row + 1) & 0xFFFFFFFFFFFFFFFF))
        return (h % U64(self.width)).astype(np.int64)

    def update_batch(self, hashes: np.ndarray, counts: np.ndarray | None = None) -> None:
        if hashes.size == 0:
            return
        h = hashes.astype(np.uint64, copy=False)
        if counts is None:
            counts = np.ones(len(h), dtype=np.int64)
        else:
            counts = counts.astype(np.int64, copy=False)
        # pre-aggregate duplicate keys so the scatter is ∝ block distincts
        uh, inv = np.unique(h, return_inverse=True)
        ucounts = np.bincount(inv, weights=counts).astype(np.int64)
        for r in range(self.depth):
            pos = self._positions(uh, r)
            np.add.at(self.table[r], pos, ucounts)
        self.total += int(counts.sum())

    def query_batch(self, hashes: np.ndarray) -> np.ndarray:
        if hashes.size == 0:
            return np.zeros(0, dtype=np.int64)
        h = hashes.astype(np.uint64, copy=False)
        est = self.table[0][self._positions(h, 0)].copy()
        for r in range(1, self.depth):
            np.minimum(est, self.table[r][self._positions(h, r)], out=est)
        return est

    def inner_product(self, other: "CountMinSketch") -> int:
        """Estimate the inner product of the two sketched frequency
        vectors ``Σ_k f_self(k)·f_other(k)`` — the size of the equi-join
        between the two sketched key streams (Cormode–Muthukrishnan
        2005 §4.2): per row, the dot product of the two counter rows
        overcounts the true inner product by hash collisions only, so
        the min across rows satisfies
        ``true ≤ est ≤ true + ε·N_self·N_other`` w.p. ``1 − δ``.
        Requires identical (depth, width) — the row-salted hash
        positions then agree by construction. Accumulates in float64:
        per-cell products at 10^12-turn counts overflow int64, and the
        ≤2^-53 relative rounding is noise next to the ε·N bound."""
        if (self.depth, self.width) != (other.depth, other.width):
            raise ValueError(
                "inner_product requires identical (depth, width)")
        per_row = np.einsum("rw,rw->r", self.table.astype(np.float64),
                            other.table.astype(np.float64))
        return int(per_row.min())

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.depth, self.width) != (other.depth, other.width):
            raise ValueError("cannot merge CMS with different (depth, width)")
        self.table += other.table
        self.total += other.total
        return self

    def to_bytes(self) -> bytes:
        return pack_state("cms", {"depth": self.depth, "width": self.width,
                                  "total": self.total}, {"table": self.table})

    @classmethod
    def _from_state(cls, meta, arrays) -> "CountMinSketch":
        obj = cls(int(meta["depth"]), int(meta["width"]))
        obj.table = arrays["table"]
        obj.total = int(meta["total"])
        return obj

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountMinSketch":
        name, meta, arrays = unpack_state(blob)
        if name != "cms":
            raise ValueError(f"expected cms blob, got {name!r}")
        return cls._from_state(meta, arrays)
