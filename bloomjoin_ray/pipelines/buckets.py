"""Shared bucketed-reduce machinery for pair/bucket pipelines.

Ray's ``groupby(key).map_groups(fn)`` pays one Python dispatch per
distinct key — fine for 64 buckets, fatal for millions of LSH buckets,
shingles, or candidate pairs. Every bucket-shaped operator here follows
the same scale-safe shape instead:

1. map_batches adds ``__gbucket = hash(key) % num_buckets``;
2. ``groupby("__gbucket").map_groups`` runs ONE task per bucket;
3. inside the bucket, rows are lexsorted by the real key columns and
   split into equal-key segments with boundary masks — vectorized, with
   Python touching only the (rare) multi-member segments that actually
   produce output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.keys import SEED, fnv1a64_strings, mix_in, splitmix64


def hash_raw64(table: pa.Table, cols: list[str]) -> np.ndarray:
    """Raw (non-canonical) 64-bit hash of the given columns — for INTERNAL
    bucketing only. Unlike ``hash_keys64`` it never routes numerics
    through float64 canonicalization (which rejects full-range int64
    like LSH band hashes); cross-type key equality semantics don't
    apply to internal bucket keys, only per-value consistency."""
    import pyarrow.compute as pc

    n = table.num_rows
    acc = np.full(n, SEED, dtype=np.uint64)
    for name in cols:
        col = table.column(name)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if pa.types.is_dictionary(col.type):
            col = col.cast(col.type.value_type)
        t = col.type
        if (pa.types.is_string(t) or pa.types.is_large_string(t)
                or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
            comp = splitmix64(fnv1a64_strings(col))
        elif pa.types.is_timestamp(t):
            comp = splitmix64(np.asarray(
                pc.fill_null(col.cast(pa.int64()), 0)).view(np.uint64))
        elif pa.types.is_floating(t):
            comp = splitmix64(np.asarray(
                pc.fill_null(col.cast(pa.float64()), 0.0)).view(np.uint64))
        elif pa.types.is_integer(t) or pa.types.is_boolean(t):
            v = np.asarray(pc.fill_null(col, 0))
            comp = splitmix64(v.astype(np.int64, copy=False).view(np.uint64)
                              if v.dtype != np.uint64 else v)
        else:
            raise TypeError(f"unsupported internal bucket key type: {t}")
        acc = mix_in(acc, comp)
    return splitmix64(acc)


def with_hash_bucket(ds, key_cols: list[str], num_buckets: int = 64,
                     col: str = "__gbucket"):
    """Append a hash-bucket column over ``key_cols`` (any types)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = hash_raw64(batch, key_cols)
        b = (h % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column(col, pa.array(b))

    return ds.map_batches(add_bucket, batch_format="pyarrow")


def numeric_segments(arrays: list[np.ndarray]):
    """(order, bounds) splitting rows into equal-key segments for numeric
    key arrays: lexsort + boundary mask. ``bounds`` has one extra
    trailing entry (= n)."""
    n = len(arrays[0])
    order = np.lexsort(tuple(reversed(arrays)))
    d = np.zeros(n - 1, dtype=bool) if n else np.zeros(0, dtype=bool)
    for a in arrays:
        s = a[order]
        d |= s[1:] != s[:-1]
    bounds = np.concatenate([[0], np.nonzero(d)[0] + 1, [n]])
    return order, bounds


def dedupe_pairs(pairs, value_cols: dict[str, str] | None = None, *,
                 id_cols: tuple[str, str] = ("id_a", "id_b"),
                 num_buckets: int = 64):
    """One row per (id_a, id_b): hash-bucket the pair key, then ONE
    pyarrow hash-aggregate per bucket (C++ group-by, handles string ids).
    ``value_cols`` maps carried column → pyarrow aggregate fn ("min",
    "max"); duplicate pair rows carry identical values in every caller,
    so "min" preserves them exactly."""
    value_cols = value_cols or {}
    keys = list(id_cols)

    def reduce_bucket(group: pa.Table) -> pa.Table:
        sub = group.drop_columns(["__gbucket"])
        if sub.num_rows == 0:
            return sub
        aggs = [(c, fn) for c, fn in value_cols.items()]
        out = sub.group_by(keys).aggregate(aggs)
        renames = {f"{c}_{fn}": c for c, fn in value_cols.items()}
        out = out.rename_columns([renames.get(n, n) for n in out.column_names])
        return out.select(keys + list(value_cols))

    return (with_hash_bucket(pairs, keys, num_buckets)
            .groupby("__gbucket")
            .map_groups(reduce_bucket, batch_format="pyarrow"))


def triangle_indices(bounds: np.ndarray, sizes_ok: np.ndarray):
    """Row-index pairs (ai, bi) for every i<j combination inside each
    segment whose ``sizes_ok`` flag is set. Python loops only over the
    flagged multi-member segments; each segment's pairs come from one
    ``np.triu_indices`` call."""
    a_idx, b_idx = [], []
    for s in np.nonzero(sizes_ok)[0]:
        lo, hi = bounds[s], bounds[s + 1]
        iu, ju = np.triu_indices(hi - lo, 1)
        a_idx.append(iu + lo)
        b_idx.append(ju + lo)
    if not a_idx:
        z = np.empty(0, dtype=np.int64)
        return z, z
    return np.concatenate(a_idx), np.concatenate(b_idx)
