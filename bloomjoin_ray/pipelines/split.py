"""Deterministic dataset splitting (train/val/test) by content hash.

The split of a row depends only on its key's canonical 64-bit hash —
never on partitioning, block order, or a random seed — so re-running on
a reshuffled or incrementally-grown corpus keeps every existing row in
its original split (the property a training pipeline actually needs;
``Dataset.split_proportionately`` is positional and loses it). Each
output is a lazy filtered view: no shuffle, no materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.keys import hash_keys64


def split_by_hash(ds, key_cols, fractions: dict[str, float],
                  *, seed_salt: str = ""):
    """Partition ``ds`` into named splits by hash of ``key_cols``.

    ``fractions`` maps split name → fraction; must sum to ≤ 1 (any
    remainder is dropped — useful for subsampling). Returns
    ``{name: Dataset}``. Rows with equal keys always land in the same
    split (dedup-safe). ``seed_salt`` derives an independent split
    assignment from the same keys (e.g. per-epoch holdouts).
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    names = list(fractions)
    edges = np.cumsum([fractions[n] for n in names])
    # exact integer comparison on the hash's top 53 bits: float64 edges
    # at 2^64 would round and could drop/duplicate boundary rows; 53-bit
    # cuts are exactly representable, and a 1.0 edge (2^53) strictly
    # exceeds every 53-bit hash prefix, so nothing is ever lost
    cuts = [int(round(float(e) * (1 << 53))) for e in edges]

    if seed_salt:
        from ..functions.keys import fnv1a64_strings, splitmix64

        # the salt hash is a per-call constant — compute it once, not
        # per row per batch
        salt_h = np.uint64(splitmix64(fnv1a64_strings(
            pa.array([seed_salt], type=pa.string())))[0])
    else:
        salt_h = None

    def make_filter(lo: int, hi: int):
        def fn(batch: pa.Table) -> pa.Table:
            h = hash_keys64(batch, key_cols)
            if salt_h is not None:
                from ..functions.keys import mix_in, splitmix64

                h = splitmix64(mix_in(
                    h, np.full(len(h), salt_h, dtype=np.uint64)))
            h53 = (h >> np.uint64(11)).astype(np.int64)
            return batch.filter(pa.array((h53 >= lo) & (h53 < hi)))

        return fn

    out = {}
    lo = 0
    for name, hi in zip(names, cuts):
        out[name] = ds.map_batches(make_filter(lo, hi),
                                   batch_format="pyarrow")
        lo = hi
    return out
