"""map_batches stages for mergeable-sketch aggregation.

Pattern (the "Aggregation at scale" idiom): each block reduces to ONE tiny
partial row (a serialized sketch, plus per-key partials for grouped
aggregations); only partials move, never the raw rows. Stages are callable
classes so ``map_batches(Cls, concurrency=N)`` runs them as an actor pool
when the caller wants state reuse (the extractor/factory are bound once per
actor in ``__init__``, not per batch).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

from ..functions.keys import hash_keys64, hash_keys64_pair
from ..state.base import merge_all, sketch_from_bytes


def _group_order_bounds(batch: pa.Table, key_cols: list[str]):
    """(order, group-start bounds) over the (SEED, ALT_SEED) hash pair —
    the same collision guard the reduces use: distinct keys end up in one
    partial only if BOTH 64-bit hashes collide (~2^-128 per pair)."""
    h1, h2 = hash_keys64_pair(batch, key_cols)
    order = np.lexsort((h2, h1))
    hs1, hs2 = h1[order], h2[order]
    d = (hs1[1:] != hs1[:-1]) | (hs2[1:] != hs2[:-1])
    bounds = np.concatenate([[0], np.nonzero(d)[0] + 1])
    return order, bounds


class GlobalSketchPartial:
    """block → one row {"state": bytes}."""

    def __init__(self, make: Callable, update: Callable[[object, pa.Table], None]):
        self.make = make
        self.update = update

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = self.make()
        self.update(s, batch)
        return pa.table({"state": pa.array([s.to_bytes()], type=pa.large_binary())})


class GroupedSketchPartial:
    """block → one row per in-block key: {key cols..., "state": bytes}.

    Groups within the block by the 64-bit composite key hash (vectorized
    ``np.unique`` + slice-by-argsort; representative key values taken from
    each group's first row).
    """

    def __init__(self, key_cols: list[str], make: Callable,
                 update: Callable[[object, pa.Table], None]):
        self.key_cols = list(key_cols)
        self.make = make
        self.update = update

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {c: batch.column(c) for c in self.key_cols}
                | {"state": pa.array([], type=pa.large_binary())}
            )
        order, bounds = _group_order_bounds(batch, self.key_cols)
        first_rows = order[bounds]
        states = []
        for gi, start in enumerate(bounds):
            end = bounds[gi + 1] if gi + 1 < len(bounds) else n
            idx = order[start:end]
            s = self.make()
            self.update(s, batch.take(pa.array(idx)))
            states.append(s.to_bytes())
        out = batch.take(pa.array(first_rows)).select(self.key_cols)
        return out.append_column("state", pa.array(states, type=pa.large_binary()))


def merge_states_to_sketch(states) -> object | None:
    return merge_all(sketch_from_bytes(bytes(b)) for b in states)


class GroupedHllPartial:
    """Fully-vectorized grouped distinct-count partials.

    One pass per block: hash group keys and value keys once, lexsort by
    (group, value), dedupe (group, value) pairs with a single diff mask,
    then slice per-group unique value hashes into SparseHll partials
    (raw hashes while small, dense registers for hot groups). Python
    touches each *group* once for serialization only — never each row.

    With ``pack_buckets=B`` the block's per-key partial rows are packed
    into ONE Arrow-IPC blob per hash bucket — the shuffle then moves at
    most ``blocks × B`` rows instead of one row per (key, block). Ray's
    sort shuffle costs ~10µs PER ROW regardless of size (measured: a
    shuffle of 320k tiny rows cost the same with and without any reduce
    work), so packing collapses the exchange cost.
    """

    def __init__(self, key_cols: list[str], val_cols: list[str],
                 p: int = 14, cap: int = 4096,
                 pack_buckets: int | None = None):
        self.key_cols = list(key_cols)
        self.val_cols = list(val_cols)
        self.p = p
        self.cap = cap
        self.pack_buckets = pack_buckets

    def _group_unique_values(self, batch: pa.Table):
        """(first_rows, dv, bounds): unique value hashes per key group,
        fully vectorized (one 3-key lexsort + diff masks)."""
        n = batch.num_rows
        g, g2 = hash_keys64_pair(batch, self.key_cols)  # collision guard pair
        v = hash_keys64(batch, self.val_cols)
        order = np.lexsort((v, g2, g))
        gs, g2s, vs = g[order], g2[order], v[order]
        new_group = np.empty(n, dtype=bool)
        new_group[0] = True
        new_group[1:] = (gs[1:] != gs[:-1]) | (g2s[1:] != g2s[:-1])
        new_pair = new_group | np.concatenate([[True], vs[1:] != vs[:-1]])
        first_rows = order[new_group]
        dv = vs[new_pair]                       # unique value hashes, grouped
        # boundaries of each group within the deduped array:
        group_of_pair = np.cumsum(new_group)[new_pair] - 1
        bounds = np.concatenate([[0], np.nonzero(np.diff(group_of_pair))[0] + 1,
                                 [len(dv)]])
        return first_rows, dv, bounds

    def _partial_rows(self, batch: pa.Table) -> pa.Table:
        from ..state.hll import SparseHll

        first_rows, dv, bounds = self._group_unique_values(batch)
        states = []
        for i in range(len(bounds) - 1):
            states.append(SparseHll.from_hashes(dv[bounds[i]:bounds[i + 1]],
                                                self.p, self.cap).to_bytes())
        out = batch.take(pa.array(first_rows)).select(self.key_cols)
        return out.append_column("state", pa.array(states, type=pa.large_binary()))

    def _partial_rows_raw(self, batch: pa.Table) -> pa.Table:
        """Packed-path partials with ZERO per-group Python: each key's
        unique value hashes become one slot of a LargeListArray (pure
        offset construction). Only groups whose in-block distinct count
        exceeds ``cap`` fall back to a dense per-group HLL blob (rare;
        bounds the pack size for pathological hot keys)."""
        from ..state.hll import HllSketch

        first_rows, dv, bounds = self._group_unique_values(batch)
        seg = np.diff(bounds)
        hot = np.nonzero(seg > self.cap)[0]
        states = [None] * len(seg)
        if hot.size:
            dv = dv.copy()
            for i in hot:
                sk = HllSketch(self.p)
                sk.update_batch(dv[bounds[i]:bounds[i + 1]])
                states[i] = sk.to_bytes()
            # zero out hot groups' list slots (state carries them instead)
            keep = np.ones(len(dv), dtype=bool)
            for i in hot:
                keep[bounds[i]:bounds[i + 1]] = False
            dv = dv[keep]
            new_bounds = np.concatenate(
                [[0], np.cumsum(np.where(seg > self.cap, 0, seg))])
        else:
            new_bounds = bounds
        lists = pa.LargeListArray.from_arrays(
            pa.array(new_bounds, type=pa.int64()),
            pa.array(dv, type=pa.uint64()))
        out = batch.take(pa.array(first_rows)).select(self.key_cols)
        out = out.append_column("hashes", lists)
        return out.append_column("state",
                                 pa.array(states, type=pa.large_binary()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            if self.pack_buckets:
                return pa.table({"__gbucket": pa.array([], type=pa.int32()),
                                 "pack": pa.array([], type=pa.large_binary())})
            return pa.table(
                {c: batch.column(c) for c in self.key_cols}
                | {"state": pa.array([], type=pa.large_binary())}
            )
        rows = self._partial_rows_raw(batch) if self.pack_buckets \
            else self._partial_rows(batch)
        if not self.pack_buckets:
            return rows
        B = int(self.pack_buckets)
        kb = (hash_keys64(rows, self.key_cols) % np.uint64(B)).astype(np.int32)
        buckets, packs = [], []
        for b in np.unique(kb):
            sub = rows.filter(pa.array(kb == b))
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, sub.schema) as w:
                w.write_table(sub)
            buckets.append(int(b))
            packs.append(sink.getvalue().to_pybytes())
        return pa.table({"__gbucket": pa.array(buckets, type=pa.int32()),
                         "pack": pa.array(packs, type=pa.large_binary())})
