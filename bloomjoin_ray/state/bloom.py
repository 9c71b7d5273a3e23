"""Mergeable Bloom filter over 32-bit key hashes.

Re-expresses the reference's ``BloomFilter`` (``/root/reference/src/
BloomFilter.h:130-157``, ``src/BloomFilter.cpp:9-82``) as vectorized NumPy:

* 64-bit-word bit array (same layout as the reference's ``BitArray``);
* Kirsch–Mitzenmacher double hashing — probe positions
  ``(h1 + i*h2) & (m-1)`` for ``i in 0..k-1`` with the reference's
  ``hash_int32`` / ``hash_int32_secondary`` splitmix-style mixers and fixed
  seeds ``0x9e3779b9`` / ``0x85ebca6b``, so FPR behavior matches;
* ``merge`` (the one genuinely new operation vs the single-threaded
  reference) ORs the word arrays — legal only because every partial in a
  job is built with the same globally-decided ``(m, k, seeds)``;
* NA tracked out-of-band (``has_na``), as in the reference.

Bit scatter avoids the slow ``np.bitwise_or.at`` path: unique sorted bit
positions → group by word via ``np.bitwise_or.reduceat``.
"""

from __future__ import annotations

import numpy as np

from ..params import bloom_sizing
from .base import pack_state, register_sketch, unpack_state

U64 = np.uint64
U32 = np.uint32

PRIMARY_SEED = U64(0x9E3779B9)
SECONDARY_SEED = U64(0x85EBCA6B)

_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


def _hash_int32(keys_u64: np.ndarray, seed: np.uint64) -> np.ndarray:
    """Primary probe hash (src/BloomFilter.h:54-61), vectorized; returns u64
    holding the low-32-bit result."""
    with np.errstate(over="ignore"):
        x = keys_u64 ^ seed
        x = x + U64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> U64(30))) * U64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> U64(27))) * U64(0x94D049BB133111EB)
        x = x ^ (x >> U64(31))
    return x & U64(0xFFFFFFFF)


def _hash_int32_secondary(keys_u64: np.ndarray, seed: np.uint64) -> np.ndarray:
    """Second hash, forced odd for double hashing (src/BloomFilter.h:64-71)."""
    with np.errstate(over="ignore"):
        x = keys_u64 ^ seed
        x = x + U64(0x85EBCA6B27D4EB4F)
        x = (x ^ (x >> U64(30))) * U64(0x94D049BB133111EB)
        x = (x ^ (x >> U64(27))) * U64(0xBF58476D1CE4E5B9)
        x = x ^ (x >> U64(31))
    return (x & U64(0xFFFFFFFF)) | U64(1)


def _keys_to_u64(keys: np.ndarray) -> np.ndarray:
    """int32 keys → uint64 via the C cast chain (int32 → uint32 → uint64)."""
    return keys.astype(np.int32).view(np.uint32).astype(np.uint64)


@register_sketch("bloom")
class BloomSketch:
    """Fixed-layout mergeable Bloom filter keyed by int32 key hashes."""

    def __init__(self, expected_elements: int, fpr: float = 0.01,
                 _m: int | None = None, _k: int | None = None):
        if _m is None or _k is None:
            _m, _k = bloom_sizing(expected_elements, fpr)
        self.m = int(_m)
        self.k = int(_k)
        self.fpr = float(fpr)
        self.expected_elements = int(expected_elements)
        self.words = np.zeros((self.m + 63) >> 6, dtype=np.uint64)
        self.has_na = False

    # -- updates ---------------------------------------------------------
    def add_batch(self, keys: np.ndarray) -> None:
        """Insert int32 key hashes (dedupes first — per-partial build cost is
        ∝ block distincts, mirroring src/BloomFilter.cpp:104-117)."""
        if keys.size == 0:
            return
        uk = np.unique(keys)
        ku = _keys_to_u64(uk)
        h1 = _hash_int32(ku, PRIMARY_SEED)
        h2 = _hash_int32_secondary(ku, SECONDARY_SEED)
        mask = U64(self.m - 1)
        pos_list = [(h1 + U64(i) * h2) & mask for i in range(self.k)]
        pos = np.unique(np.concatenate(pos_list))
        widx = (pos >> U64(6)).astype(np.int64)
        bits = U64(1) << (pos & U64(63))
        # group consecutive equal word indices and OR their bit masks
        boundaries = np.nonzero(np.diff(widx, prepend=widx[0] - 1))[0]
        ored = np.bitwise_or.reduceat(bits, boundaries)
        self.words[widx[boundaries]] |= ored

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        """Probe int32 key hashes → bool mask (True = may be present)."""
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        ku = _keys_to_u64(np.asarray(keys))
        h1 = _hash_int32(ku, PRIMARY_SEED)
        h2 = _hash_int32_secondary(ku, SECONDARY_SEED)
        mask = U64(self.m - 1)
        out = np.ones(len(ku), dtype=bool)
        for i in range(self.k):
            pos = (h1 + U64(i) * h2) & mask
            w = self.words[(pos >> U64(6)).astype(np.int64)]
            out &= (w >> (pos & U64(63))) & U64(1) != 0
            if not out.any():
                break
        return out

    def add_na(self) -> None:
        self.has_na = True

    def contains_na(self) -> bool:
        return self.has_na

    # -- merge / stats ---------------------------------------------------
    def merge(self, other: "BloomSketch") -> "BloomSketch":
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError(
                f"cannot merge Bloom filters with different layouts: "
                f"(m={self.m},k={self.k}) vs (m={other.m},k={other.k})"
            )
        self.words |= other.words
        self.has_na |= other.has_na
        return self

    def bits_set(self) -> int:
        total = 0
        u8 = self.words.view(np.uint8)
        for i in range(0, u8.size, 1 << 24):
            total += int(_POPCOUNT8[u8[i : i + (1 << 24)]].sum(dtype=np.int64))
        return total

    def fill_ratio(self) -> float:
        return self.bits_set() / self.m

    def estimate_cardinality(self) -> int:
        """Distinct-key estimate from the fill ratio (Swamidass–Baldi
        2007): ``n̂ = −(m/k)·ln(1 − X/m)`` where X = set bits — a free
        byproduct of a filter that already exists (e.g. the merged
        prefilter of a bloom_join), no extra pass over the data. The
        double-hashed probe positions are exactly k distinct slots per
        key (odd-forced h2, power-of-two m), matching the formula's
        k-draws model closely; accuracy degrades as the filter
        saturates — at X == m the estimate is clamped to the value at
        X = m − 1 and is a lower bound only."""
        x = self.bits_set()
        if x == 0:
            return 0
        x = min(x, self.m - 1)
        return int(round(-(self.m / self.k) * float(np.log1p(-x / self.m))))

    @property
    def size_bytes(self) -> int:
        return self.words.nbytes

    # -- serialization ---------------------------------------------------
    def to_bytes(self) -> bytes:
        return pack_state(
            "bloom",
            {"m": self.m, "k": self.k, "fpr": self.fpr,
             "expected_elements": self.expected_elements,
             "has_na": bool(self.has_na)},
            {"words": self.words},
        )

    @classmethod
    def _from_state(cls, meta, arrays) -> "BloomSketch":
        obj = cls.__new__(cls)
        obj.m = int(meta["m"])
        obj.k = int(meta["k"])
        obj.fpr = float(meta["fpr"])
        obj.expected_elements = int(meta["expected_elements"])
        obj.has_na = bool(meta["has_na"])
        obj.words = arrays["words"]
        return obj

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomSketch":
        name, meta, arrays = unpack_state(blob)
        if name != "bloom":
            raise ValueError(f"expected bloom blob, got {name!r}")
        return cls._from_state(meta, arrays)
