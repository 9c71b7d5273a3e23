"""As-of (temporal) join — an operator the Dataset API lacks, expressed as
the guide's composition: co-bucket both sides on the equality key, sort
within buckets, ``pd.merge_asof`` per bucket inside ``map_groups``.

Semantics (DuckDB ``ASOF LEFT JOIN`` parity, oracle-testable): for each
left row, attach the right row with the same ``by`` key and the greatest
``on`` value ≤ the left row's ``on`` value (direction="backward").

Partitioning assumption: the equality key distributes uniformly across
hash buckets; all rows of one key land in one bucket, so the within-bucket
merge_asof sees the key's full history. Without an equality key (pure
range join) there is nothing to bucket by — the right side must broadcast
(enforced via ``require_by=False`` + a broadcast-size guard).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.keys import hash_keys32


def asof_join(ds_left, ds_right, on: str, by: str | list[str] | None = None, *,
              num_buckets: int = 64, suffixes=("", "_right"),
              direction: str = "backward"):
    """Left as-of join of two Datasets. ``on`` must be an orderable column
    present on both sides (timestamp/numeric); ``by`` the equality key(s).
    Returns a Dataset with all left rows + matched right columns (nulls
    when no match)."""
    by_cols = [by] if isinstance(by, str) else list(by or [])
    if not by_cols:
        return _broadcast_asof(ds_left, ds_right, on, suffixes, direction)

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            h = hash_keys32(batch, by_cols).view(np.uint32)
            bucket = (h % np.uint32(num_buckets)).astype(np.int32)
            t = batch.append_column("__bucket", pa.array(bucket))
            return t.append_column("__side", pa.array(
                np.full(batch.num_rows, side, dtype=np.int8)))

        return fn

    left_schema = _schema_of(ds_left)
    right_schema = _schema_of(ds_right)
    right_keep = [c for c in right_schema.names if c not in by_cols and c != on]
    rename_right = {c: c + suffixes[1] if c in set(left_schema.names) else c
                    for c in right_keep}

    unified = pa.schema(
        [left_schema.field(c) for c in left_schema.names]
        + [pa.field(rename_right[c], right_schema.field(c).type) for c in right_keep]
        + [pa.field("__bucket", pa.int32()), pa.field("__side", pa.int8())]
    )

    def pad(batch: pa.Table, names_map=None) -> pa.Table:
        arrays = []
        for f in unified:
            src = f.name
            if names_map:
                inv = {v: k for k, v in names_map.items()}
                src = inv.get(f.name, f.name)
            if src in batch.schema.names and (names_map is None or src in batch.schema.names):
                col = batch.column(src)
                col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                arrays.append(col.cast(f.type))
            else:
                arrays.append(pa.nulls(batch.num_rows, f.type))
        return pa.Table.from_arrays(arrays, schema=unified)

    def prep_left(batch: pa.Table) -> pa.Table:
        return pad(tag(0)(batch))

    def prep_right(batch: pa.Table) -> pa.Table:
        return pad(tag(1)(batch), rename_right)

    tagged = ds_left.map_batches(prep_left, batch_format="pyarrow").union(
        ds_right.map_batches(prep_right, batch_format="pyarrow"))

    out_names = list(left_schema.names) + [rename_right[c] for c in right_keep]
    right_out = [rename_right[c] for c in right_keep]
    out_schema = pa.schema(
        [left_schema.field(c) for c in left_schema.names]
        + [pa.field(rename_right[c], right_schema.field(c).type) for c in right_keep])

    def join_bucket(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        left = df[df["__side"] == 0][list(left_schema.names)]
        right = df[df["__side"] == 1]
        # reconstruct right side's own columns: by keys + on + payload
        right = right[by_cols + [on] + right_out] if len(right) else right
        if len(left) == 0:
            return out_schema.empty_table()
        if len(right) == 0:
            merged = left.copy()
            for c in right_out:
                merged[c] = None
        else:
            left_sorted = left.sort_values(on, kind="stable")
            right_sorted = right.sort_values(on, kind="stable")
            merged = pd.merge_asof(left_sorted, right_sorted, on=on, by=by_cols,
                                   direction=direction, suffixes=suffixes)
        out = pa.Table.from_pandas(merged[out_names], preserve_index=False)
        # pandas promotes int-with-null to float; restore declared types
        return out.cast(out_schema)

    return tagged.groupby("__bucket").map_groups(join_bucket,
                                                 batch_format="pyarrow")


def _broadcast_asof(ds_left, ds_right, on, suffixes, direction):
    import ray

    right_tbl = pa.concat_tables(
        [t for t in ray.get(ds_right.materialize().to_arrow_refs())])
    if right_tbl.num_rows > 5_000_000:
        raise ValueError("as-of join without 'by' requires a broadcastable "
                         "right side (≤ 5M rows)")
    ref = ray.put(right_tbl.to_pandas().sort_values(on, kind="stable"))

    def fn(batch: pa.Table) -> pa.Table:
        right = ray.get(ref)
        left = batch.to_pandas().sort_values(on, kind="stable")
        merged = pd.merge_asof(left, right, on=on, direction=direction,
                               suffixes=suffixes)
        return pa.Table.from_pandas(merged, preserve_index=False)

    return ds_left.map_batches(fn, batch_format="pyarrow")


def _schema_of(ds) -> pa.Schema:
    schema = ds.schema()
    base = getattr(schema, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema([pa.field(n, t) for n, t in zip(schema.names, schema.types)])
