"""AMS / tug-of-war sketch: second frequency moment (self-join size).

Estimates ``F2 = Σ_k f_k²`` of a key stream — the size of the stream's
self-equi-join and the canonical skew statistic (``F2 / n²`` is the
collision probability; a uniform stream has ``F2 ≈ n²/d``, a one-key
stream ``F2 = n²``). The fast-AMS / count-sketch formulation (Alon–
Matias–Szegedy 1996; Charikar–Chen–Farach-Colton 2002; Thorup–Zhang
2004): ``depth`` independent rows × ``width`` int64 counters; each
update adds ``sign_r(x)·count`` at bucket ``h_r(x)`` of every row r.
A row's estimate is the sum of its squared counters — unbiased for F2
with ``Var ≤ 2·F2²/width`` — and the median across rows amplifies the
constant-probability guarantee to ``1 − δ`` with ``depth = O(log 1/δ)``.
Published bound used in tests: ``|est − F2| ≤ ε·F2`` w.p. ``1 − δ`` for
``width ≥ c/ε²`` (we pin ``ε = 4·sqrt(2/width)``, i.e. four standard
deviations of one row, far inside the median-amplified tail).

A LINEAR sketch: merge is counter-wise addition, so partial sketches
built over any partitioning of the stream sum to the exact single-pass
counters — merge is bit-identical, not just bound-preserving (int64
counters; callers own overflow past ±2^63 total signed count per cell,
unreachable below ~10^18 updates). Updates consume 64-bit key hashes
(``hash_keys64``); bucket and sign per row derive from one splitmix64
re-mix each, the same construction as the CMS row hashing
(cf. reference ``src/bloom_filter.cpp``'s double-hash probes — one base
hash re-mixed per use, never per-row independent hash tables).
"""

from __future__ import annotations

import numpy as np

from ..functions.keys import splitmix64
from .base import pack_state, register_sketch, unpack_state

U64 = np.uint64


@register_sketch("ams")
class AmsSketch:
    def __init__(self, depth: int = 7, width: int = 4096):
        if depth < 1 or width < 8:
            raise ValueError("depth must be >= 1 and width >= 8")
        self.depth = depth
        self.width = width
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.total = 0

    @property
    def epsilon(self) -> float:
        """Relative-error bound pinned by the tests: four one-row
        standard deviations, ``4·sqrt(2/width)``."""
        return 4.0 * float(np.sqrt(2.0 / self.width))

    def _mix(self, hashes: np.ndarray, row: int, salt: int) -> np.ndarray:
        with np.errstate(over="ignore"):
            return splitmix64(
                hashes ^ U64((0x9E3779B97F4A7C15 * (2 * row + salt + 1))
                             & 0xFFFFFFFFFFFFFFFF))

    def update_batch(self, hashes: np.ndarray,
                     counts: np.ndarray | None = None) -> None:
        if hashes.size == 0:
            return
        h = hashes.astype(np.uint64, copy=False)
        if counts is None:
            counts = np.ones(len(h), dtype=np.int64)
        else:
            counts = counts.astype(np.int64, copy=False)
        # pre-aggregate duplicates: the scatter is ∝ block distincts
        uh, inv = np.unique(h, return_inverse=True)
        uc = np.bincount(inv, weights=counts).astype(np.int64)
        for r in range(self.depth):
            pos = (self._mix(uh, r, 0) % U64(self.width)).astype(np.int64)
            sign = np.where(self._mix(uh, r, 1) >> U64(63), 1, -1
                            ).astype(np.int64)
            np.add.at(self.table[r], pos, sign * uc)
        self.total += int(counts.sum())

    def estimate_f2(self) -> int:
        """Median over rows of the per-row sum of squared counters.
        Squares accumulate in float64: a single int64 counter squared
        overflows int64 well below the sketch's own validity range,
        and the ≤2^-53 relative rounding is noise next to ε."""
        per_row = np.einsum("rw,rw->r", self.table.astype(np.float64),
                            self.table.astype(np.float64))
        return int(np.median(per_row))

    def merge(self, other: "AmsSketch") -> "AmsSketch":
        if (self.depth, self.width) != (other.depth, other.width):
            raise ValueError("cannot merge AMS with different (depth, width)")
        self.table += other.table
        self.total += other.total
        return self

    def to_bytes(self) -> bytes:
        return pack_state("ams", {"depth": self.depth, "width": self.width,
                                  "total": self.total}, {"table": self.table})

    @classmethod
    def _from_state(cls, meta, arrays) -> "AmsSketch":
        obj = cls(int(meta["depth"]), int(meta["width"]))
        obj.table = arrays["table"]
        obj.total = int(meta["total"])
        return obj

    @classmethod
    def from_bytes(cls, blob: bytes) -> "AmsSketch":
        name, meta, arrays = unpack_state(blob)
        if name != "ams":
            raise ValueError(f"expected ams blob, got {name!r}")
        return cls._from_state(meta, arrays)
