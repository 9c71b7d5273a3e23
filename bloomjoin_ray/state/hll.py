"""HyperLogLog distinct-count sketch (dense, 2^p uint8 registers).

Standard Flajolet et al. HLL with linear-counting small-range correction;
no large-range correction needed because updates consume full 64-bit key
hashes (``hash_keys64``) — a 32-bit hash would saturate near 2^32
distincts, useless at the 10^12-turn scale this engine targets.

Mergeable: register-wise max — associative, commutative, idempotent, so
per-block partials built by ``map_batches`` tasks combine in any order.
Published relative-error bound: ~1.04/sqrt(m) (m = 2^p registers).

This generalizes the reference's sampled distinct-count estimator
(``/root/reference/R/bloomjoin.R:223-238``) into a mergeable UDAF; the
planner can consume it as a hint provider.
"""

from __future__ import annotations

import numpy as np

from .base import pack_state, register_sketch, unpack_state

U64 = np.uint64

# bias-correction constants (Flajolet et al. 2007)
def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _floor_log2_u64(x: np.ndarray) -> np.ndarray:
    """Exact floor(log2(x)) for uint64 x>0, vectorized: float log2 gives a
    candidate within ±1; two integer-shift checks fix boundary rounding."""
    e = np.log2(x.astype(np.float64)).astype(np.int64)
    shift = np.clip(e, 0, 63).astype(np.uint64)
    e = np.where((x >> shift) == 0, e - 1, e)          # 2^e must be <= x
    e1 = np.clip(e + 1, 0, 63).astype(np.uint64)
    e = np.where(((x >> e1) != 0) & (e + 1 <= 63), e + 1, e)  # 2^(e+1) > x
    return e


@register_sketch("hll")
class HllSketch:
    """create → update_batch(uint64 hashes) → merge → estimate."""

    def __init__(self, p: int = 14):
        if not (4 <= p <= 18):
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @property
    def rel_error(self) -> float:
        """Published standard-error bound 1.04/sqrt(m)."""
        return 1.04 / float(np.sqrt(self.m))

    def update_batch(self, hashes: np.ndarray) -> None:
        if hashes.size == 0:
            return
        h = hashes.astype(np.uint64, copy=False)
        idx = (h >> U64(64 - self.p)).astype(np.int64)
        rest = h & ((U64(1) << U64(64 - self.p)) - U64(1))
        width = 64 - self.p
        rho = np.full(len(h), width + 1, dtype=np.int64)
        nz = rest > 0
        if nz.any():
            rho[nz] = width - _floor_log2_u64(rest[nz])
        rho = rho.astype(np.uint8)
        # register-wise max via sort + reduceat (np.maximum.at is slow)
        order = np.argsort(idx, kind="stable")
        si, sr = idx[order], rho[order]
        bounds = np.nonzero(np.diff(si, prepend=si[0] - 1))[0]
        maxes = np.maximum.reduceat(sr, bounds)
        regs = si[bounds]
        self.registers[regs] = np.maximum(self.registers[regs], maxes)

    def merge(self, other: "HllSketch") -> "HllSketch":
        if self.p != other.p:
            raise ValueError(f"cannot merge HLL p={self.p} with p={other.p}")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        est = _alpha(self.m) * m * m / np.sum(np.ldexp(1.0, -self.registers.astype(np.int64)))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return float(m * np.log(m / zeros))
        return float(est)

    def to_bytes(self) -> bytes:
        return pack_state("hll", {"p": self.p}, {"registers": self.registers})

    @classmethod
    def _from_state(cls, meta, arrays) -> "HllSketch":
        obj = cls(int(meta["p"]))
        obj.registers = arrays["registers"]
        return obj

    @classmethod
    def from_bytes(cls, blob: bytes) -> "HllSketch":
        name, meta, arrays = unpack_state(blob)
        if name != "hll":
            raise ValueError(f"expected hll blob, got {name!r}")
        return cls._from_state(meta, arrays)


@register_sketch("hllsp")
class SparseHll:
    """HLL++-style sparse mode: keep the raw unique 64-bit hashes until
    they outgrow ``cap``, then densify to a ``HllSketch``. Low-cardinality
    groups (the common case in per-key aggregation) get EXACT counts and
    tiny partials (8 bytes/distinct instead of 2^p registers); hot groups
    transparently fall back to the dense sketch and its 1.04/√m bound."""

    def __init__(self, p: int = 14, cap: int = 4096):
        self.p = p
        self.cap = cap
        self.hashes = np.empty(0, dtype=np.uint64)
        self.dense: HllSketch | None = None

    def _densify(self) -> None:
        if self.dense is None:
            self.dense = HllSketch(self.p)
        if self.hashes.size:
            self.dense.update_batch(self.hashes)
            self.hashes = np.empty(0, dtype=np.uint64)

    def update_batch(self, hashes: np.ndarray) -> None:
        if self.dense is not None:
            self.dense.update_batch(hashes)
            return
        self.hashes = np.union1d(self.hashes, hashes.astype(np.uint64, copy=False))
        if self.hashes.size > self.cap:
            self._densify()

    def merge(self, other) -> "SparseHll":
        if isinstance(other, HllSketch):
            self._densify()
            self.dense.merge(other)
            return self
        if self.dense is not None or other.dense is not None:
            self._densify()
            o = other
            if o.dense is not None:
                self.dense.merge(o.dense)
            if o.hashes.size:
                self.dense.update_batch(o.hashes)
            return self
        self.hashes = np.union1d(self.hashes, other.hashes)
        if self.hashes.size > self.cap:
            self._densify()
        return self

    def estimate(self) -> float:
        if self.dense is not None:
            return self.dense.estimate()
        return float(self.hashes.size)  # sparse mode is exact

    def to_bytes(self) -> bytes:
        if self.dense is not None:
            return pack_state("hllsp", {"p": self.p, "cap": self.cap, "mode": "dense"},
                              {"registers": self.dense.registers})
        return pack_state("hllsp", {"p": self.p, "cap": self.cap, "mode": "sparse"},
                          {"hashes": self.hashes})

    @classmethod
    def _from_state(cls, meta, arrays) -> "SparseHll":
        obj = cls(int(meta["p"]), int(meta["cap"]))
        if meta["mode"] == "dense":
            obj.dense = HllSketch(obj.p)
            obj.dense.registers = arrays["registers"]
        else:
            obj.hashes = arrays["hashes"]
        return obj

    @classmethod
    def from_hashes(cls, hashes: np.ndarray, p: int = 14,
                    cap: int = 4096) -> "SparseHll":
        obj = cls(p, cap)
        obj.update_batch(hashes)
        return obj
