"""Windowed aggregates over an event stream table.

Ray Data is a batch engine with no event-time/watermark machinery; the
stream-shaped semantics are expressed per the guide's pattern: treat the
input as a keyed, ts-ordered log — tumbling windows become a vectorized
``floor(ts / size)`` bucket column + grouped aggregation (pre-aggregated
per block), sliding windows replicate each row into the windows it
overlaps, and session windows (gap-based) sort each key's rows inside
``map_groups`` and split on gaps (the gaps-and-islands construction, so a
SQL oracle can check it exactly).

Ordering assumption: session/sliding results depend only on the set of
rows per key — each key's full history is co-located by the groupby, and
sorting happens inside the group, so input order never matters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .aggregate import grouped_sums


def _floor_ts(ts: pa.ChunkedArray | pa.Array, size_s: int) -> pa.Array:
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    unit = ts.type.unit
    scale = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
    step = size_s * scale
    vals = np.asarray(ts.cast(pa.int64()))
    return pa.array((vals // step) * step).cast(pa.int64()).cast(ts.type)


def tumbling_window(ds, ts_col: str, size_s: int, *, key=None,
                    sum_cols: dict[str, str] | None = None,
                    count_col: str = "n", out_col: str = "window_start"):
    """COUNT/SUM per fixed window (and optional key). Pre-aggregates per
    block, then shuffles only partials."""
    keys = ([key] if isinstance(key, str) else list(key or []))

    def add_window(batch: pa.Table) -> pa.Table:
        return batch.append_column(out_col, _floor_ts(batch.column(ts_col), size_s))

    cols = keys + [out_col] + list(sum_cols or {})
    windowed = ds.map_batches(add_window, batch_format="pyarrow")
    return grouped_sums(windowed.select_columns(cols), keys + [out_col],
                        sum_cols or {}, count_col=count_col)


def sliding_window(ds, ts_col: str, size_s: int, slide_s: int, *, key=None,
                   count_col: str = "n", out_col: str = "window_start"):
    """COUNT per sliding window: each row replicates into the
    ``size/slide`` windows containing it (flat-map expansion), then the
    tumbling machinery aggregates. size must be a multiple of slide."""
    if size_s % slide_s:
        raise ValueError("size_s must be a multiple of slide_s")
    k = size_s // slide_s
    keys = ([key] if isinstance(key, str) else list(key or []))

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        ts = ts.combine_chunks() if isinstance(ts, pa.ChunkedArray) else ts
        unit = ts.type.unit
        scale = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
        vals = np.asarray(ts.cast(pa.int64()))
        slide = slide_s * scale
        base = (vals // slide) * slide
        idx = np.repeat(np.arange(len(vals)), k)
        starts = np.tile(np.arange(k), len(vals)) * slide
        win = np.repeat(base, k) - starts
        keep = vals[idx] < win + size_s * scale  # row inside the window
        out = batch.take(pa.array(idx[keep]))
        warr = pa.array(win[keep]).cast(pa.int64()).cast(ts.type)
        return out.append_column(out_col, warr)

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    return grouped_sums(exploded.select_columns(keys + [out_col]),
                        keys + [out_col], {}, count_col=count_col)


def sessionize(ds, key, ts_col: str, gap_s: int, *,
               session_col: str = "session_start",
               count_col: str = "n_events",
               end_col: str = "session_end"):
    """Gap-based session windows per key: a new session starts whenever
    the gap to the previous event of the same key exceeds ``gap_s``.
    Returns Dataset[key…, session_start, session_end, n_events].

    Exactly the SQL gaps-and-islands construction, so DuckDB window
    functions serve as the correctness oracle.
    """
    keys = [key] if isinstance(key, str) else list(key)

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(ts_col, kind="stable")
        ts = g[ts_col]
        gap = ts.diff().dt.total_seconds() if str(ts.dtype).startswith("datetime") \
            else ts.diff()
        new_session = (gap.isna()) | (gap > gap_s)
        sid = new_session.cumsum()
        agg = g.groupby(sid).agg(
            **{session_col: (ts_col, "min"),
               end_col: (ts_col, "max"),
               count_col: (ts_col, "size")})
        for i, c in enumerate(keys):
            agg.insert(i, c, g[c].iloc[0])
        return agg.reset_index(drop=True)

    return (ds.select_columns(keys + [ts_col])
              .groupby(keys)
              .map_groups(per_key, batch_format="pandas"))
