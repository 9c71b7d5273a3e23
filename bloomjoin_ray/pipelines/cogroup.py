"""cogroup: the general two-dataset per-key transform.

``cogroup(ds_a, ds_b, key, fn)`` gathers BOTH datasets' rows for each
key into one task and applies ``fn(ta, tb) -> pa.Table`` — the
primitive underneath full-outer aggregate comparisons, per-key
reconciliation/diffing, ratio-of-aggregates, and any join whose output
isn't row-aligned. Spark/Flink ship it as ``cogroup``; Ray Data has no
native equivalent, so this builds it from the engine's packed exchange:

- both sides are column-pruned, null-padded to one unified schema and
  tagged ``__cside`` (null columns cost buffer-less validity bitmaps —
  rows of side A never materialize side B's values),
- ONE packed bucketed exchange co-locates each key's rows from both
  sides (`buckets.packed_bucket_map_groups` — no sort-shuffle floor),
- inside each task, rows re-segment by the REAL key (128-bit hash
  pair), split by side, and ``fn`` gets each side's own schema back.

Contract: ``key`` columns must exist with IDENTICAL names and types on
both sides (rename/cast upstream); non-key column-name collisions are
fine (rows are disjoint) unless the TYPES differ, which raises. ``fn``
receives ``(ta, tb)`` where either may be empty (key present on one
side only — full-outer semantics) and must return tables of one
consistent schema. A key's rows must fit one task; ``fn`` must be
bucket-union-invariant only in the sense every packed reduce is —
re-segmentation by real key happens here, not in ``fn``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa


def cogroup(ds_a, ds_b, key: str | Sequence[str], fn, *,
            columns_a: Sequence[str] | None = None,
            columns_b: Sequence[str] | None = None):
    """Apply ``fn(ta, tb) -> pa.Table | None`` to each key's rows from
    both datasets. ``columns_a``/``columns_b`` prune the exchange
    (key columns are always kept)."""
    from .aggregate import _key_group_bounds
    from .asof import _schema_of
    from .buckets import packed_bucket_map_groups

    key_cols = [key] if isinstance(key, str) else list(key)
    sa, sb = _schema_of(ds_a), _schema_of(ds_b)
    for k in key_cols:
        if k not in sa.names or k not in sb.names:
            raise ValueError(f"key column {k!r} must exist on both sides")
        ta, tb = sa.field(k).type, sb.field(k).type
        if ta != tb:
            raise TypeError(f"key column {k!r} types differ ({ta} vs {tb})"
                            " — cast before cogroup")

    def prune(schema: pa.Schema, cols) -> list[str]:
        if cols is None:
            return [n for n in schema.names]
        cols = list(cols)
        missing = [c for c in cols if c not in schema.names]
        if missing:
            raise ValueError(f"columns {missing} not in schema "
                             f"{schema.names}")
        return key_cols + [c for c in cols if c not in key_cols]

    cols_a, cols_b = prune(sa, columns_a), prune(sb, columns_b)
    schema_a = pa.schema([(c, sa.field(c).type) for c in cols_a])
    schema_b = pa.schema([(c, sb.field(c).type) for c in cols_b])

    # unified wire schema: key cols, then A-only, then B-extras
    fields: dict[str, pa.DataType] = {c: sa.field(c).type for c in cols_a}
    for c in cols_b:
        t = sb.field(c).type
        if c in fields and fields[c] != t and c not in key_cols:
            raise TypeError(
                f"column {c!r} exists on both sides with different types "
                f"({fields[c]} vs {t}) — rename or cast one side")
        fields.setdefault(c, t)
    wire = pa.schema(list(fields.items()) + [("__cside", pa.int8())])

    def pad(side: int):
        def fn_pad(b: pa.Table) -> pa.Table:
            arrays = []
            for f in wire:
                if f.name == "__cside":
                    arrays.append(pa.array(
                        np.full(b.num_rows, side, dtype=np.int8)))
                elif f.name in b.schema.names:
                    arrays.append(b.column(f.name))
                else:
                    arrays.append(pa.nulls(b.num_rows, f.type))
            return pa.Table.from_arrays(arrays, schema=wire)

        return fn_pad

    tagged = (ds_a.select_columns(cols_a)
              .map_batches(pad(0), batch_format="pyarrow")
              .union(ds_b.select_columns(cols_b)
                     .map_batches(pad(1), batch_format="pyarrow")))

    def reduce_group(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gbucket"]) \
            if "__gbucket" in group.schema.names else group
        if group.num_rows == 0:
            # schema probe / all-empty input: fn's schema on empty sides
            r = fn(schema_a.empty_table(), schema_b.empty_table())
            return r if r is not None else pa.table({})
        order, bounds = _key_group_bounds(group, key_cols)
        group = group.take(pa.array(order))
        sides = np.asarray(group.column("__cside"))
        outs = []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            seg = group.slice(lo, hi - lo)
            m = sides[lo:hi] == 0
            ta = (seg.filter(pa.array(m)).select(cols_a)
                  .cast(schema_a))
            tb = (seg.filter(pa.array(~m)).select(cols_b)
                  .cast(schema_b))
            r = fn(ta, tb)
            if r is not None and r.num_rows:
                outs.append(r)
        if not outs:
            return pa.table({})
        return pa.concat_tables(outs, promote_options="default")

    return packed_bucket_map_groups(tagged, key_cols, reduce_group)


def dataset_diff(ds_a, ds_b, key: str | Sequence[str], *,
                 columns: Sequence[str] | None = None,
                 emit_equal: bool = False):
    """Per-key reconciliation of two datasets — "did the migration /
    rerun / backfill change anything?" without materializing either
    side. For each key: row counts and an order-independent multiset
    fingerprint (uint64 wrap-around SUM of per-row raw hashes over the
    compared columns — duplicate-sensitive, where XOR would cancel
    repeated rows pairwise). Emits ``key…, n_a, n_b, status`` with
    status ∈ {only_a, only_b, count_differs, content_differs, equal};
    equal keys are suppressed unless ``emit_equal`` (at 100 TB the diff
    is the small output, the agreement is the bulk).

    ``columns=None`` compares all SHARED non-key columns (must agree in
    type). One packed exchange total (cogroup); fingerprints are
    vectorized per side. Collision envelope: a differing key escapes
    detection only if 64-bit row-hash sums collide (~2^-64 per key).
    """
    from .asof import _schema_of
    from .buckets import hash_raw64

    key_cols = [key] if isinstance(key, str) else list(key)
    sa, sb = _schema_of(ds_a), _schema_of(ds_b)
    if columns is None:
        shared = [n for n in sa.names
                  if n in set(sb.names) and n not in key_cols]
    else:
        shared = [c for c in columns if c not in key_cols]
        missing = [c for c in shared
                   if c not in sa.names or c not in sb.names]
        if missing:
            raise ValueError(f"compared columns {missing} must exist on "
                             "both sides")
    for c in shared:
        if sa.field(c).type != sb.field(c).type:
            raise TypeError(f"compared column {c!r} types differ "
                            f"({sa.field(c).type} vs {sb.field(c).type})")

    cmp_cols = key_cols + shared

    def fingerprint(t: pa.Table) -> int:
        if t.num_rows == 0:
            return 0
        h = hash_raw64(t, cmp_cols)
        return int(np.sum(h, dtype=np.uint64))

    def per_key(ta: pa.Table, tb: pa.Table) -> pa.Table | None:
        na, nb = ta.num_rows, tb.num_rows
        if na and not nb:
            status = "only_a"
        elif nb and not na:
            status = "only_b"
        elif na != nb:
            status = "count_differs"
        elif fingerprint(ta) != fingerprint(tb):
            status = "content_differs"
        else:
            status = "equal"
            if not emit_equal:
                return None
        src = ta if na else tb
        out = {k: src.column(k).slice(0, 1) for k in key_cols}
        out["n_a"] = pa.array([na], pa.int64())
        out["n_b"] = pa.array([nb], pa.int64())
        out["status"] = pa.array([status], pa.string())
        return pa.table(out)

    return cogroup(ds_a, ds_b, key_cols, per_key,
                   columns_a=cmp_cols, columns_b=cmp_cols)
