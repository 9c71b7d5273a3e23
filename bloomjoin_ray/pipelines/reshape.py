"""Row-shape operators: explode (SQL UNNEST) and unpivot (SQL UNPIVOT /
pandas melt).

Both are embarrassingly parallel per-batch transforms — no shuffle, no
state — expressed as vectorized Arrow kernels inside ``map_batches``:
explode flattens the list child array zero-copy and ``take``s the
parent rows by repeat-index; unpivot concatenates one column-slice per
value column. At 100 TB each stage only changes block row counts, which
Ray Data's streaming executor re-blocks automatically.

No counterpart in the reference (R data frames unnest via tidyr);
included because every training-data pipeline reshapes between
list-of-tokens/embedding-vector layout and one-row-per-element layout.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa


def explode_column(ds, list_col: str, *,
                   keep_cols: Sequence[str] | None = None,
                   out_col: str | None = None,
                   pos_col: str | None = None):
    """SQL ``UNNEST``: one output row per element of ``list_col``,
    parent columns (``keep_cols``, default: all others) repeated.
    Rows whose list is null or empty produce no output (SQL UNNEST
    semantics). ``pos_col`` adds the 0-based element ordinal
    (``WITH ORDINALITY`` minus one). ``out_col`` names the element
    column (default: the list column's name)."""
    out_col = out_col or list_col

    def explode(batch: pa.Table) -> pa.Table:
        col = batch.column(list_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        keep = (list(keep_cols) if keep_cols is not None
                else [c for c in batch.column_names if c != list_col])
        if pa.types.is_fixed_size_list(col.type):
            col = col.cast(pa.list_(col.type.value_type))
        offs = np.asarray(col.offsets, dtype=np.int64)
        # null list slots keep their offset span in some layouts — zero
        # them out of the repeat counts explicitly
        counts = offs[1:] - offs[:-1]
        if col.null_count:
            counts = np.where(np.asarray(col.is_null()), 0, counts)
        parent = np.repeat(np.arange(len(counts)), counts)
        # gather the flattened child values per-parent-slot (flatten()
        # drops null slots' spans, so index via list offsets + arange)
        starts = np.repeat(offs[:-1], counts)
        within = (np.arange(len(parent), dtype=np.int64)
                  - np.repeat(np.cumsum(np.concatenate([[0], counts[:-1]])),
                              counts))
        values = col.values.take(pa.array(starts + within))
        cols = {c: batch.column(c).take(pa.array(parent)) for c in keep}
        cols[out_col] = values
        if pos_col:
            cols[pos_col] = pa.array(within)
        return pa.table(cols)

    return ds.map_batches(explode, batch_format="pyarrow")


def unpivot(ds, id_cols: Sequence[str], value_cols: Sequence[str], *,
            var_col: str = "name", val_col: str = "value"):
    """SQL ``UNPIVOT`` / pandas ``melt``: one output row per
    (input row, value column), with ``var_col`` holding the column
    name and ``val_col`` its value. Value columns must share a common
    Arrow type (cast upstream if they don't)."""
    id_cols = list(id_cols)
    value_cols = list(value_cols)
    if not value_cols:
        raise ValueError("unpivot needs at least one value column")

    def melt(batch: pa.Table) -> pa.Table:
        parts = []
        for vc in value_cols:
            cols = {c: batch.column(c) for c in id_cols}
            cols[var_col] = pa.array(
                np.full(batch.num_rows, vc, dtype=object), pa.string())
            cols[val_col] = batch.column(vc)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")


def split_to_rows(ds, col: str, pattern: str, *,
                  keep_cols: Sequence[str] | None = None,
                  out_col: str | None = None,
                  pos_col: str | None = None,
                  drop_empty: bool = False):
    """Split a string column on an RE2 ``pattern`` and emit one row per
    piece — SQL ``unnest(regexp_split_to_array(col, pattern))`` (with
    ``WITH ORDINALITY`` via ``pos_col``), the tokenize/explode step of
    log and text pipelines. Null strings produce no rows; empty pieces
    (adjacent separators, leading/trailing) are kept to match SQL
    unless ``drop_empty=True``. The split column itself is REPLACED by
    the pieces (name them elsewhere with ``out_col``). One vectorized
    ``split_pattern_regex`` per batch feeding the UNNEST gather — no
    per-row Python, no shuffle."""
    import pyarrow.compute as pc

    out = out_col or col

    def split(batch: pa.Table) -> pa.Table:
        s = batch.column(col)
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        parts = pc.split_pattern_regex(s, pattern)
        batch = batch.drop_columns([col])
        return batch.append_column(out, parts)

    exploded = explode_column(
        ds.map_batches(split, batch_format="pyarrow"), out,
        keep_cols=keep_cols, pos_col=pos_col)
    if drop_empty:
        def non_empty(b: pa.Table) -> pa.Table:
            return b.filter(pc.not_equal(b.column(out), ""))

        exploded = exploded.map_batches(non_empty, batch_format="pyarrow")
    return exploded
