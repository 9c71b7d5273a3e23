"""Mergeable uniform reservoir sample (distributed, deterministic).

Generalizes the reference's evenly-spaced index sampling
(``/root/reference/R/bloomjoin.R:234,244-253``) — which presumes one
in-memory vector — into a UDAF that composes under partitioning: each item
gets a priority ``u = splitmix64(item_hash ^ seed)`` and the sample is the
``k`` items with the smallest priorities (the bottom-k / priority-sampling
construction). Merge = union + keep bottom-k, which is associative,
commutative and idempotent, so any partitioning/merge order yields the
SAME sample — deterministic given (seed, data), no RNG state.

Carries opaque payload rows (serialized Arrow IPC) so the sample keeps
whole records, not just keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.keys import splitmix64
from .base import pack_state, register_sketch, unpack_state


@register_sketch("reservoir")
class ReservoirSample:
    def __init__(self, k: int = 100, seed: int = 0x5A5A):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.seed = int(seed)
        self.priorities = np.empty(0, dtype=np.uint64)
        self.rows: list[bytes] = []   # one serialized IPC row-batch per item
        self.n_seen = 0

    def _trim(self) -> None:
        if len(self.priorities) > self.k:
            order = np.argsort(self.priorities, kind="stable")[: self.k]
            self.priorities = self.priorities[order]
            self.rows = [self.rows[i] for i in order]

    def update_batch(self, item_hashes: np.ndarray, payload: pa.Table) -> None:
        """item_hashes: uint64 per row (e.g. hash_keys64 of a unique id);
        payload: the rows themselves."""
        n = len(item_hashes)
        if n != payload.num_rows:
            raise ValueError("hashes and payload row counts differ")
        self.n_seen += n
        if n == 0:
            return
        with np.errstate(over="ignore"):
            prio = splitmix64(item_hashes.astype(np.uint64) ^ np.uint64(self.seed))
        # only candidates that could enter the bottom-k matter
        if len(self.priorities) >= self.k:
            cut = self.priorities.max()
            keep = prio < cut
        else:
            keep = np.ones(n, dtype=bool)
        idx = np.nonzero(keep)[0]
        if idx.size:
            order = np.argsort(prio[idx], kind="stable")[: self.k]
            idx = idx[order]
            sub = payload.take(pa.array(idx))
            for i, row_i in enumerate(idx):
                sink = pa.BufferOutputStream()
                with pa.ipc.new_stream(sink, payload.schema) as w:
                    w.write_table(sub.slice(i, 1))
                self.rows.append(sink.getvalue().to_pybytes())
            self.priorities = np.concatenate([self.priorities, prio[idx]])
            self._trim()

    def merge(self, other: "ReservoirSample") -> "ReservoirSample":
        if self.k != other.k or self.seed != other.seed:
            raise ValueError("cannot merge reservoirs with different (k, seed)")
        self.priorities = np.concatenate([self.priorities, other.priorities])
        self.rows = self.rows + other.rows
        self.n_seen += other.n_seen
        self._trim()
        return self

    def sample_table(self) -> pa.Table | None:
        if not self.rows:
            return None
        tables = [pa.ipc.open_stream(pa.BufferReader(b)).read_all()
                  for b in self.rows]
        return pa.concat_tables(tables)

    def to_bytes(self) -> bytes:
        blob = b"".join(
            np.uint64(len(r)).tobytes() + r for r in self.rows)
        return pack_state(
            "reservoir",
            {"k": self.k, "seed": self.seed, "n_seen": self.n_seen,
             "n_rows": len(self.rows)},
            {"priorities": self.priorities,
             "rows": np.frombuffer(blob, dtype=np.uint8)})

    @classmethod
    def _from_state(cls, meta, arrays) -> "ReservoirSample":
        obj = cls(int(meta["k"]), int(meta["seed"]))
        obj.n_seen = int(meta["n_seen"])
        obj.priorities = arrays["priorities"]
        blob = arrays["rows"].tobytes()
        rows = []
        off = 0
        for _ in range(int(meta["n_rows"])):
            ln = int(np.frombuffer(blob, dtype=np.uint64, count=1, offset=off)[0])
            off += 8
            rows.append(blob[off : off + ln])
            off += ln
        obj.rows = rows
        return obj

    @classmethod
    def from_bytes(cls, blob: bytes) -> "ReservoirSample":
        name, meta, arrays = unpack_state(blob)
        if name != "reservoir":
            raise ValueError(f"expected reservoir blob, got {name!r}")
        return cls._from_state(meta, arrays)
