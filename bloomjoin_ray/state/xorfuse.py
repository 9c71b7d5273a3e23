"""Xor filter — the ``engine="fuse"`` prefilter.

The reference reserves ``engine = "fuse"`` as an explicit plugin slot and
leaves it unimplemented (``R/bloomjoin.R:40-42,261-264``); this engine
fills the slot with the standard 3-wise xor filter (Graf & Lemire,
"Xor Filters: Faster and Smaller Than Bloom and Cuckoo Filters", 2020 —
public algorithm): ~1.23 slots/key at a fixed ``2^-w`` false-positive
rate for *w*-bit fingerprints, ~20-40% smaller than a Bloom filter at
equal FPR, with branch-free 3-probe membership.

Construction is the hypergraph peeling algorithm, fully vectorized in
rounds: slot degrees via ``np.bincount``, the xor-trick (each slot keeps
the XOR of its keys' indices, so a degree-1 slot *is* its key), peeled
keys removed with ``np.bitwise_xor.at``/``np.subtract.at``. Reverse
assignment processes whole peel-rounds at once — safe because a key's
singleton slot can never be a slot of any key still unpeeled at that
round (else its degree were ≥ 2).

Unlike Bloom filters, xor filters are NOT mergeable: construction needs
every distinct key in one place. The join planner therefore gathers the
build side's distinct 64-bit key hashes (8 bytes/key) and builds in the
driver — right for small-to-medium build sides, which is exactly when a
prefilter pays; huge build sides stay on ``engine="bloom"``.
"""

from __future__ import annotations

import struct

import numpy as np

from ..functions.keys import splitmix64

U64 = np.uint64


def _mix(h: np.ndarray, seed: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return splitmix64(h ^ U64(seed & 0xFFFFFFFFFFFFFFFF))


class XorFuseFilter:
    """Static-set membership filter with fixed ``2^-fingerprint_bits`` FPR.

    ``slots`` is the fingerprint table (uint8/16/32); a key ``h`` is
    "present" when ``slots[s0]^slots[s1]^slots[s2] == fingerprint(h)``
    with the three probes drawn from three equal segments.
    """

    def __init__(self, slots: np.ndarray, seed: int, fingerprint_bits: int,
                 n_keys: int):
        self.slots = slots
        self.seed = seed
        self.fingerprint_bits = fingerprint_bits
        self.n_keys = n_keys

    # -------------------------------------------------------- building ----

    @classmethod
    def build(cls, hashes: np.ndarray, *, fingerprint_bits: int = 16,
              max_attempts: int = 64) -> "XorFuseFilter":
        """Build from 64-bit key hashes (duplicates fine — deduped here)."""
        if fingerprint_bits not in (8, 16, 32):
            raise ValueError("fingerprint_bits must be 8, 16 or 32")
        keys = np.unique(np.asarray(hashes, dtype=np.uint64))
        n = len(keys)
        dtype = {8: np.uint8, 16: np.uint16, 32: np.uint32}[fingerprint_bits]
        if n == 0:
            return cls(np.zeros(3, dtype=dtype), 0, fingerprint_bits, 0)
        seg = max(int(np.ceil(1.23 * n / 3)) + 11, 2)
        cap = 3 * seg
        for attempt in range(max_attempts):
            seed = 0xF0E1 + attempt * 0x9E3779B9
            slots3 = cls._slots_of(keys, seed, seg)          # (n, 3)
            order = cls._peel(slots3, cap, n)
            if order is not None:
                table = cls._assign(keys, slots3, order, cap, seed,
                                    fingerprint_bits, dtype)
                return cls(table, seed, fingerprint_bits, n)
        raise RuntimeError("xor filter construction failed; retry budget "
                           "exhausted (astronomically unlikely)")

    @staticmethod
    def _slots_of(keys: np.ndarray, seed: int, seg: int) -> np.ndarray:
        h0 = _mix(keys, seed)
        h1 = _mix(keys, seed + 1)
        h2 = _mix(keys, seed + 2)
        return np.stack([
            (h0 % U64(seg)).astype(np.int64),
            (h1 % U64(seg)).astype(np.int64) + seg,
            (h2 % U64(seg)).astype(np.int64) + 2 * seg,
        ], axis=1)

    @staticmethod
    def _peel(slots3: np.ndarray, cap: int, n: int):
        """Vectorized-round peeling. Returns a list of (key_idx, slot)
        arrays per round, or None if the hypergraph has a 2-core."""
        flat = slots3.reshape(-1)
        cnt = np.bincount(flat, minlength=cap)
        sxor = np.zeros(cap, dtype=np.int64)
        np.bitwise_xor.at(sxor, flat, np.repeat(np.arange(n), 3))
        peeled = np.zeros(n, dtype=bool)
        rounds = []
        remaining = n
        while remaining:
            singles = np.nonzero(cnt == 1)[0]
            if singles.size == 0:
                return None
            kidx = sxor[singles]
            # a key singleton in several slots appears multiple times;
            # keep its first occurrence (that slot becomes its home)
            kidx, first = np.unique(kidx, return_index=True)
            home = singles[first]
            fresh = ~peeled[kidx]
            kidx, home = kidx[fresh], home[fresh]
            if kidx.size == 0:
                return None
            peeled[kidx] = True
            rounds.append((kidx, home))
            rem_slots = slots3[kidx].reshape(-1)
            np.subtract.at(cnt, rem_slots, 1)
            np.bitwise_xor.at(sxor, rem_slots, np.repeat(kidx, 3))
            remaining -= kidx.size
        return rounds

    @classmethod
    def _assign(cls, keys, slots3, rounds, cap, seed, bits, dtype):
        table = np.zeros(cap, dtype=np.uint64)
        mask = U64((1 << bits) - 1)
        fps = _mix(keys, seed + 3) & mask
        for kidx, home in reversed(rounds):
            s = slots3[kidx]                       # (m, 3)
            tri = table[s[:, 0]] ^ table[s[:, 1]] ^ table[s[:, 2]]
            table[home] = fps[kidx] ^ tri ^ table[home]
        return table.astype(dtype)

    # -------------------------------------------------------- querying ----

    def contains_batch(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: no false negatives; false positives at
        ~2^-fingerprint_bits."""
        h = np.asarray(hashes, dtype=np.uint64)
        if self.n_keys == 0:
            return np.zeros(len(h), dtype=bool)
        seg = len(self.slots) // 3
        s = self._slots_of(h, self.seed, seg)
        t = self.slots.astype(np.uint64)
        tri = t[s[:, 0]] ^ t[s[:, 1]] ^ t[s[:, 2]]
        mask = U64((1 << self.fingerprint_bits) - 1)
        return tri == (_mix(h, self.seed + 3) & mask)

    # ---------------------------------------------------- serialization ----

    def to_bytes(self) -> bytes:
        head = struct.pack("<4sQIQQ", b"XFF1", self.seed,
                           self.fingerprint_bits, self.n_keys,
                           len(self.slots))
        return head + self.slots.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "XorFuseFilter":
        magic, seed, bits, n_keys, cap = struct.unpack_from("<4sQIQQ", blob)
        if magic != b"XFF1":
            raise ValueError("not an XorFuseFilter blob")
        dtype = {8: np.uint8, 16: np.uint16, 32: np.uint32}[bits]
        slots = np.frombuffer(blob, dtype=dtype,
                              offset=struct.calcsize("<4sQIQQ"), count=cap)
        return cls(slots.copy(), seed, bits, n_keys)

    @property
    def size_bits(self) -> int:
        return len(self.slots) * self.fingerprint_bits

    def __repr__(self) -> str:
        return (f"XorFuseFilter(n_keys={self.n_keys}, "
                f"slots={len(self.slots)}, "
                f"fp_bits={self.fingerprint_bits}, "
                f"fpr~2^-{self.fingerprint_bits})")


def fingerprint_bits_for(fpr: float) -> int:
    """Smallest supported fingerprint width meeting the target FPR."""
    import math

    need = math.ceil(math.log2(1.0 / fpr)) if fpr < 1.0 else 1
    for w in (8, 16, 32):
        if need <= w:
            return w
    return 32
