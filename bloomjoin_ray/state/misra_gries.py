"""Misra–Gries (space-saving family) heavy-hitter summary.

The deterministic counterpart to the count–min sketch: keeps at most ``k``
(item, count) entries; when capacity overflows, every counter is decreased
by the (k+1)-th largest weight and non-positive entries are dropped.
Guarantees (no randomness at all):

* estimates UNDER-count: ``true − N/(k+1) ≤ est ≤ true`` (CMS over-counts
  — running both brackets the truth);
* every item with frequency > N/(k+1) is retained;
* merge = combine entries + the same trim, and the bound still holds for
  the union stream (Agarwal et al., "Mergeable Summaries", PODS 2012) —
  which is what makes it a per-block ``map_batches`` partial here.

Entries carry an opaque payload row (Arrow IPC) so the summary can
surface original values, not just hashes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import pack_state, register_sketch, unpack_state


def _ipc_row(table: pa.Table, i: int) -> bytes:
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table.slice(i, 1))
    return sink.getvalue().to_pybytes()


@register_sketch("misra_gries")
class MisraGries:
    def __init__(self, k: int = 64):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.hashes = np.empty(0, dtype=np.uint64)
        self.counts = np.empty(0, dtype=np.int64)
        self.payloads: list[bytes] = []
        self.n = 0              # total stream weight
        self.decremented = 0    # cumulative decrement (error bound witness)

    def _combine(self, hashes, counts, payloads) -> None:
        h = np.concatenate([self.hashes, hashes])
        c = np.concatenate([self.counts, counts])
        p = self.payloads + payloads
        uh, inv = np.unique(h, return_inverse=True)
        uc = np.bincount(inv, weights=c).astype(np.int64)
        first = np.full(len(uh), -1, dtype=np.int64)
        first[inv[::-1]] = np.arange(len(h) - 1, -1, -1)
        up = [p[i] for i in first]
        if len(uh) > self.k:
            # decrement by the (k+1)-th largest count, drop the non-positive
            kth = np.partition(uc, len(uc) - self.k - 1)[len(uc) - self.k - 1]
            self.decremented += int(kth)
            uc = uc - kth
            keep = uc > 0
            uh, uc = uh[keep], uc[keep]
            up = [up[i] for i in np.nonzero(keep)[0]]
        self.hashes, self.counts, self.payloads = uh, uc, up

    def update_batch(self, hashes: np.ndarray, payload: pa.Table,
                     weights: np.ndarray | None = None) -> None:
        n = len(hashes)
        if n != payload.num_rows:
            raise ValueError("hashes and payload row counts differ")
        if n == 0:
            return
        h = hashes.astype(np.uint64, copy=False)
        w = (np.ones(n, dtype=np.int64) if weights is None
             else weights.astype(np.int64, copy=False))
        self.n += int(w.sum())
        uh, inv = np.unique(h, return_inverse=True)
        uc = np.bincount(inv, weights=w).astype(np.int64)
        first = np.full(len(uh), -1, dtype=np.int64)
        first[inv[::-1]] = np.arange(n - 1, -1, -1)
        payloads = [_ipc_row(payload, int(i)) for i in first]
        self._combine(uh, uc, payloads)

    def merge(self, other: "MisraGries") -> "MisraGries":
        if self.k != other.k:
            raise ValueError("cannot merge Misra-Gries with different k")
        self.n += other.n
        self.decremented += other.decremented
        self._combine(other.hashes, other.counts, list(other.payloads))
        return self

    @property
    def max_error(self) -> int:
        """Every estimate under-counts by at most this much."""
        return self.decremented

    def items_table(self, count_col: str = "est_count") -> pa.Table | None:
        """Kept items as a table: payload columns + lower-bound counts,
        sorted by count desc."""
        if not self.payloads:
            return None
        tables = [pa.ipc.open_stream(pa.BufferReader(b)).read_all()
                  for b in self.payloads]
        t = pa.concat_tables(tables).append_column(
            count_col, pa.array(self.counts))
        order = np.argsort(self.counts, kind="stable")[::-1]
        return t.take(pa.array(order))

    def to_bytes(self) -> bytes:
        blob = b"".join(np.uint64(len(r)).tobytes() + r for r in self.payloads)
        return pack_state(
            "misra_gries",
            {"k": self.k, "n": self.n, "decremented": self.decremented,
             "n_rows": len(self.payloads)},
            {"hashes": self.hashes, "counts": self.counts,
             "payloads": np.frombuffer(blob, dtype=np.uint8)})

    @classmethod
    def _from_state(cls, meta, arrays) -> "MisraGries":
        obj = cls(int(meta["k"]))
        obj.n = int(meta["n"])
        obj.decremented = int(meta["decremented"])
        obj.hashes = arrays["hashes"]
        obj.counts = arrays["counts"]
        blob = arrays["payloads"].tobytes()
        rows, off = [], 0
        for _ in range(int(meta["n_rows"])):
            ln = int(np.frombuffer(blob, dtype=np.uint64, count=1, offset=off)[0])
            off += 8
            rows.append(blob[off: off + ln])
            off += ln
        obj.payloads = rows
        return obj

    @classmethod
    def from_bytes(cls, blob: bytes) -> "MisraGries":
        name, meta, arrays = unpack_state(blob)
        if name != "misra_gries":
            raise ValueError(f"expected misra_gries blob, got {name!r}")
        return cls._from_state(meta, arrays)
