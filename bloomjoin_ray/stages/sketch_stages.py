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

from ..functions.keys import hash_keys64
from ..state.base import merge_all, sketch_from_bytes


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
        h = hash_keys64(batch, self.key_cols)
        order = np.argsort(h, kind="stable")
        hs = h[order]
        # NB: uint64 + python int promotes to float64 and can round away a
        # prepend sentinel — build boundaries explicitly instead
        bounds = np.concatenate([[0], np.nonzero(np.diff(hs))[0] + 1])
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
