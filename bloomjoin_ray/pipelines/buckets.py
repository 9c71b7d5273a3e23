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


def group_agg(t: pa.Table, keys: list[str], specs) -> pa.Table:
    """``t.group_by(keys).aggregate(specs)`` with EXACT null-key grouping
    and a pinned output layout: key columns first (in ``keys`` order),
    then one column per spec named pyarrow-style (``{col}_{fn}``,
    ``count_all``). ``specs=[]`` returns the distinct key rows.

    pyarrow 16.1's hash grouper OVER-GROUPS when any key column
    contains nulls: identical null-keyed rows can land in several
    output groups (repro pinned in
    tests/test_aggregate.py::test_group_agg_null_keys). Null-free key
    sets take the C++ fast path untouched; nullable keys are re-encoded
    as (value with nulls filled, is-null flag) — a null-free key set
    the grouper handles exactly — and the nulls are restored on the
    way out. Value-column null semantics are pyarrow's own in both
    paths (the re-encoding touches only key columns)."""
    import pyarrow.compute as pc

    keys = list(keys)
    specs = list(specs)
    spec_names = [("count_all" if not c else f"{c}_{fn}")
                  for c, fn in specs]
    if all(t.column(k).null_count == 0 for k in keys):
        out = t.group_by(keys).aggregate(specs)
        return out.select(keys + spec_names)

    t2 = t
    filled: list[str] = []    # nullable keys kept (with nulls filled)
    all_null: list[str] = []  # keys dropped from grouping entirely
    gkeys: list[str] = []
    for k in keys:
        col = t2.column(k)
        if col.null_count == 0:
            gkeys.append(k)
            continue
        flag = f"__nn_{k}"
        valid = pc.drop_null(col.combine_chunks()
                             if isinstance(col, pa.ChunkedArray) else col)
        if len(valid):
            idx = t2.schema.get_field_index(k)
            t2 = t2.set_column(idx, k, pc.fill_null(col, valid[0]))
            gkeys.append(k)
            filled.append(k)
        else:
            all_null.append(k)
        t2 = t2.append_column(flag, pc.is_null(col))
        gkeys.append(flag)
    out = t2.group_by(gkeys).aggregate(specs)
    cols: dict[str, pa.ChunkedArray | pa.Array] = {}
    for k in keys:
        if k in all_null:
            cols[k] = pa.nulls(out.num_rows, t.schema.field(k).type)
        elif k in filled:
            cols[k] = pc.if_else(out.column(f"__nn_{k}"),
                                 pa.scalar(None, t.schema.field(k).type),
                                 out.column(k))
        else:
            cols[k] = out.column(k)
    for nm in spec_names:
        cols[nm] = out.column(nm)
    return pa.table(cols)


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
            if col.null_count:
                # null slots carry arbitrary buffer bytes (group_by
                # outputs don't normalize them) — pin to a constant so
                # a null key routes to the SAME bucket from every block
                comp[np.asarray(pc.is_null(col))] = splitmix64(
                    np.uint64(SEED))
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


def packed_bucket_map_groups(ds, key_cols: list[str] | None, fn, *,
                             num_buckets: int = 64,
                             num_tasks: int | None = None,
                             bucket_col: str = "__gbucket",
                             pre_bucketed: bool = False):
    """Drop-in for ``with_hash_bucket(ds, key_cols, num_buckets)
    .groupby('__gbucket').map_groups(fn, batch_format='pyarrow')``
    without Ray's sort-shuffle operator, whose launch cost (~2-3 s
    measured on this host, independent of row count) every bucketed
    pipeline would otherwise pay.

    The map stage packs each block's rows into one Arrow-IPC blob per
    bucket; the reduce wave (inside Ray Data, per the packed-exchange
    rules) gathers each task's bucket set and runs ``fn`` ONCE on the
    concatenated rows. ``fn`` must therefore be BUCKET-UNION-INVARIANT:
    it may see several buckets' rows in one call — all rows of any one
    key still arrive together, which is the only property the bucketed
    reduces rely on (they re-segment by the real key columns inside).

    ``pre_bucketed=True`` skips hashing: ``ds`` already carries an
    int32 ``bucket_col`` in ``[0, num_buckets)`` (e.g. the as-of/range
    join prep stages, which must hash with canonical key semantics).
    The packed exchange splits per reducer on a cluster
    (``split_refs_by_group``) so per-link volume matches a true
    shuffle's."""

    def pack_stage(batch: pa.Table) -> pa.Table:
        if not pre_bucketed:
            h = hash_raw64(batch, key_cols)
            b32 = (h % np.uint64(num_buckets)).astype(np.int32)
            batch = batch.append_column(bucket_col, pa.array(b32))
        out_b: list[int] = []
        packs: list[bytes] = []
        if batch.num_rows:
            b = np.asarray(batch.column(bucket_col), dtype=np.int64)
            order = np.argsort(b, kind="stable")
            sb = b[order]
            bounds = np.concatenate(
                [[0], np.nonzero(sb[1:] != sb[:-1])[0] + 1, [len(sb)]])
            sorted_batch = batch.take(pa.array(order))
            for s in range(len(bounds) - 1):
                lo, hi = int(bounds[s]), int(bounds[s + 1])
                sl = sorted_batch.slice(lo, hi - lo)
                sink = pa.BufferOutputStream()
                with pa.ipc.new_stream(sink, sl.schema) as w:
                    w.write_table(sl)
                out_b.append(int(sb[lo]))
                packs.append(sink.getvalue().to_pybytes())
        return pa.table({
            "__gbucket": pa.array(np.asarray(out_b, dtype=np.int32)),
            "pack": pa.array(packs, type=pa.large_binary()),
        })

    def reducer(group: int, num_groups: int, refs):
        from .aggregate import _gather_bucket_packs

        t = _gather_bucket_packs(group, num_groups, refs)
        if t is None:
            return 0, None
        out = fn(t)
        return out.num_rows, out

    def empty_schema():
        from .asof import _schema_of

        in_schema = _schema_of(ds)
        if not pre_bucketed:
            in_schema = in_schema.append(pa.field(bucket_col, pa.int32()))
        try:
            return fn(in_schema.empty_table()).schema
        except Exception:
            # some group fns assume ≥1 row; an all-empty input then
            # degrades to a schema-less empty Dataset — the same thing
            # Ray's sort-shuffle groupby produced here
            return pa.schema([])

    from .aggregate import _packed_group_reduce

    packed = ds.map_batches(pack_stage, batch_format="pyarrow")
    return _packed_group_reduce(packed, None, None, num_buckets=num_buckets,
                                num_tasks=num_tasks,
                                empty_schema=empty_schema, reducer=reducer)


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
        out = group_agg(sub, keys, aggs)
        renames = {f"{c}_{fn}": c for c, fn in value_cols.items()}
        out = out.rename_columns([renames.get(n, n) for n in out.column_names])
        return out.select(keys + list(value_cols))

    return packed_bucket_map_groups(pairs, keys, reduce_bucket,
                                    num_buckets=num_buckets)


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
