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


@register_sketch("wreservoir")
class WeightedReservoirSample(ReservoirSample):
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES, deterministic): each item draws ``u = uniform(splitmix64(
    item_hash ^ seed))`` and gets priority ``-ln(u) / w`` — an
    Exponential(w) variate — and the sample is the k items with the
    SMALLEST priorities. P(item first) = w_i / Σw, the weighted
    analogue of the uniform bottom-k; merge = union + keep bottom-k,
    associative/commutative/idempotent, so the sample is identical
    under any partitioning. Items with null / zero / negative weight
    never enter (standard A-ES domain). Priorities are float64, so
    exact determinism holds per (seed, data, weights)."""

    def update_batch(self, item_hashes: np.ndarray, payload: pa.Table,
                     weights: np.ndarray | None = None) -> None:
        if weights is None:
            raise ValueError("WeightedReservoirSample needs weights")
        n = len(item_hashes)
        if n != payload.num_rows or n != len(weights):
            raise ValueError("hashes/weights/payload lengths differ")
        w = np.asarray(weights, dtype=np.float64)
        ok = np.isfinite(w) & (w > 0)
        self.n_seen += n
        if not ok.any():
            return
        with np.errstate(over="ignore"):
            h = splitmix64(item_hashes.astype(np.uint64)
                           ^ np.uint64(self.seed))
        # map to open (0,1): (h + 1) / 2^64 never hits 0 or 1
        u = (h[ok].astype(np.float64) + 1.0) / 18446744073709551616.0
        prio = -np.log(u) / w[ok]
        payload = payload.filter(pa.array(ok))
        if len(self._fprio) >= self.k:
            cut = self._fprio.max()
            keep = prio < cut
        else:
            keep = np.ones(len(prio), dtype=bool)
        idx = np.nonzero(keep)[0]
        if idx.size:
            order = np.argsort(prio[idx], kind="stable")[: self.k]
            idx = idx[order]
            sub = payload.take(pa.array(idx))
            for i in range(len(idx)):
                sink = pa.BufferOutputStream()
                with pa.ipc.new_stream(sink, payload.schema) as w_:
                    w_.write_table(sub.slice(i, 1))
                self.rows.append(sink.getvalue().to_pybytes())
            self._fprio = np.concatenate([self._fprio, prio[idx]])
            self._trim_f()

    # float-priority storage lives in the uint64 slot bit-cast, so
    # to_bytes/_from_state/merge inherit unchanged: float64 bit
    # patterns of positive finite values sort the same as uint64.
    @property
    def _fprio(self) -> np.ndarray:
        return self.priorities.view(np.float64)

    @_fprio.setter
    def _fprio(self, v: np.ndarray) -> None:
        self.priorities = np.ascontiguousarray(v, dtype=np.float64).view(
            np.uint64)

    def _trim_f(self) -> None:
        if len(self._fprio) > self.k:
            order = np.argsort(self._fprio, kind="stable")[: self.k]
            self._fprio = self._fprio[order]
            self.rows = [self.rows[i] for i in order]

    def merge(self, other: "WeightedReservoirSample"):
        if self.k != other.k or self.seed != other.seed:
            raise ValueError("cannot merge reservoirs with different "
                             "(k, seed)")
        self._fprio = np.concatenate([self._fprio, other._fprio])
        self.rows = self.rows + other.rows
        self.n_seen += other.n_seen
        self._trim_f()
        return self

    def to_bytes(self) -> bytes:
        blob = b"".join(
            np.uint64(len(r)).tobytes() + r for r in self.rows)
        return pack_state(
            "wreservoir",
            {"k": self.k, "seed": self.seed, "n_seen": self.n_seen,
             "n_rows": len(self.rows)},
            {"priorities": self.priorities,
             "rows": np.frombuffer(blob, dtype=np.uint8)})

    @classmethod
    def from_bytes(cls, blob: bytes) -> "WeightedReservoirSample":
        name, meta, arrays = unpack_state(blob)
        if name != "wreservoir":
            raise ValueError(f"expected wreservoir blob, got {name!r}")
        return cls._from_state(meta, arrays)
