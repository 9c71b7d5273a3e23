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
                   sum_cols: dict[str, str] | None = None,
                   count_col: str = "n", out_col: str = "window_start"):
    """COUNT (and optional SUMs, as in ``tumbling_window``) per sliding
    window: each row replicates into the ``size/slide`` windows
    containing it (flat-map expansion), then the tumbling machinery
    aggregates. size must be a multiple of slide."""
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
    cols = keys + [out_col] + list(sum_cols or {})
    return grouped_sums(exploded.select_columns(cols),
                        keys + [out_col], sum_cols or {},
                        count_col=count_col)


def sessionize(ds, key, ts_col: str, gap_s: int, *,
               session_col: str = "session_start",
               count_col: str = "n_events",
               end_col: str = "session_end",
               num_buckets: int = 64):
    """Gap-based session windows per key: a new session starts whenever
    the gap to the previous event of the same key exceeds ``gap_s``.
    Returns Dataset[key…, session_start, session_end, n_events].

    Exactly the SQL gaps-and-islands construction, so DuckDB window
    functions serve as the correctness oracle.

    Scale shape: keys hash into ``num_buckets`` buckets, ONE vectorized
    reduce per bucket — inside it, every key's rows are sessionized at
    once via a single lexsort by (key-hash pair, ts) + boundary masks;
    Python never touches individual keys or rows. (The earlier
    ``groupby(keys).map_groups`` formulation paid one pandas call per
    distinct key — millions of Python dispatches at scale.)
    """
    from ..functions.keys import hash_keys64, hash_keys64_pair

    keys = [key] if isinstance(key, str) else list(key)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (hash_keys64(batch, keys) % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("__gbucket", pa.array(b))

    def per_bucket(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return group.drop_columns(["__gbucket"])
        ts = group.column(ts_col)
        ts = ts.combine_chunks() if isinstance(ts, pa.ChunkedArray) else ts
        if pa.types.is_timestamp(ts.type):
            scale = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts.type.unit]
            tv = np.asarray(ts.cast(pa.int64()))
            gap_units = gap_s * scale
        else:
            tv = np.asarray(ts.cast(pa.float64()))
            gap_units = float(gap_s)
        # distinct keys split on the 128-bit hash pair (collision guard)
        h1, h2 = hash_keys64_pair(group, keys)
        order = np.lexsort((tv, h2, h1))
        hs1, hs2, tvs = h1[order], h2[order], tv[order]
        new_session = np.empty(n, dtype=bool)
        new_session[0] = True
        new_session[1:] = ((hs1[1:] != hs1[:-1]) | (hs2[1:] != hs2[:-1])
                           | (tvs[1:] - tvs[:-1] > gap_units))
        starts = np.nonzero(new_session)[0]
        bounds = np.concatenate([starts, [n]])
        out = group.take(pa.array(order[starts])).select(keys)
        start_vals, end_vals = tvs[starts], tvs[bounds[1:] - 1]
        if pa.types.is_timestamp(ts.type):
            s_arr = pa.array(start_vals).cast(pa.int64()).cast(ts.type)
            e_arr = pa.array(end_vals).cast(pa.int64()).cast(ts.type)
        else:
            s_arr = pa.array(start_vals).cast(ts.type)
            e_arr = pa.array(end_vals).cast(ts.type)
        out = out.append_column(session_col, s_arr)
        out = out.append_column(end_col, e_arr)
        return out.append_column(count_col,
                                 pa.array(np.diff(bounds).astype(np.int64)))

    from .buckets import packed_bucket_map_groups

    # packed exchange (no sort-shuffle launch floor); per_bucket
    # re-segments by the key-hash pair, so bucket unions are equivalent
    return packed_bucket_map_groups(
        ds.select_columns(keys + [ts_col])
          .map_batches(add_bucket, batch_format="pyarrow"),
        None, per_bucket, num_buckets=num_buckets, pre_bucketed=True)


def shift_per_key(ds, key, order_by, cols, *, offset: int = 1,
                  suffix: str | None = None):
    """Per-key LAG/LEAD — the SQL ``lag(col, offset) OVER (PARTITION BY
    key ORDER BY ...)`` family (``offset`` > 0 = lag, < 0 = lead). For
    each column in ``cols`` a ``{col}{suffix}`` column is appended with
    the value ``offset`` rows earlier in the key's ``order_by`` order
    (null when the window falls outside the key's rows). Pure
    reordering, no arithmetic — results are bit-exact vs the SQL window
    for any column type.

    Scale shape: one packed bucketed exchange on ``key`` (every row of
    a key must meet its neighbors), then per-bucket lexsort + one
    vectorized take per shifted column. The reduce is
    bucket-union-invariant (re-segments by the real key hash).
    ``order_by`` must be a total order within each key for
    deterministic output."""
    from ..functions.keys import hash_keys64_pair
    from .buckets import packed_bucket_map_groups

    key = [key] if isinstance(key, str) else list(key)
    cols = [cols] if isinstance(cols, str) else list(cols)
    order_by = list(order_by)
    for _c, d in order_by:
        if d not in ("ascending", "descending"):
            raise ValueError(f"order_by direction must be ascending/"
                             f"descending, got {d!r}")
    if offset == 0:
        raise ValueError("offset must be nonzero (positive=lag, "
                         "negative=lead)")
    if suffix is None:
        suffix = "_lag" if offset > 0 else "_lead"

    def reduce_group(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gbucket"])
        if group.num_rows == 0:
            for c in cols:
                group = group.append_column(
                    c + suffix, pa.array([], group.schema.field(c).type))
            return group
        sort_keys = [(c, "ascending") for c in key] + order_by
        idx = np.asarray(pc.sort_indices(group, sort_keys=sort_keys))
        g = group.take(pa.array(idx))
        h1, h2 = hash_keys64_pair(g, key)
        n = len(idx)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        starts = np.nonzero(new)[0]
        seg = np.cumsum(new) - 1
        pos = np.arange(n) - starts[seg]                  # rank within key
        seg_len = np.diff(np.append(starts, n))[seg]
        # take the clamped source index, then null out slots whose
        # window falls outside the key's rows
        valid = (pos - offset >= 0) & (pos - offset < seg_len)
        src = np.where(valid, np.arange(n) - offset, 0)
        for c in cols:
            col = g.column(c)
            col = (col.combine_chunks()
                   if isinstance(col, pa.ChunkedArray) else col)
            shifted = col.take(pa.array(src))
            shifted = pc.if_else(pa.array(valid), shifted,
                                 pa.nulls(n, col.type))
            g = g.append_column(c + suffix, shifted)
        return g

    return packed_bucket_map_groups(ds, key, reduce_group)


def _sorted_key_segments(group: pa.Table, key: list[str], order_by):
    """Lexsort a bucket's rows by ``key + order_by`` and segment on the
    real key (128-bit hash pair, so bucket unions re-segment correctly).
    Returns ``(g, starts, seg)``: the sorted table, segment-start row
    indices, and each row's segment id."""
    from ..functions.keys import hash_keys64_pair

    sort_keys = [(c, "ascending") for c in key] + list(order_by)
    idx = np.asarray(pc.sort_indices(group, sort_keys=sort_keys))
    g = group.take(pa.array(idx))
    h1, h2 = hash_keys64_pair(g, key)
    n = len(idx)
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
    starts = np.nonzero(new)[0]
    seg = np.cumsum(new) - 1
    return g, starts, seg


def window_agg_per_key(ds, key, order_by, col, *, agg: str = "sum",
                       rows_preceding: int | None = None,
                       out_col: str | None = None):
    """Per-key running / rolling aggregate — the SQL ``agg(col) OVER
    (PARTITION BY key ORDER BY ... ROWS BETWEEN N PRECEDING AND CURRENT
    ROW)`` family. ``rows_preceding=None`` is the cumulative frame
    (``UNBOUNDED PRECEDING``); an integer ``N`` keeps the current row
    plus the ``N`` rows before it within the key. ``agg`` is one of
    ``sum`` / ``mean`` / ``count`` (COUNT(col): non-null rows in the
    frame). SUM/MEAN are null when the frame holds no non-null value,
    matching SQL; integer sums stay int64 (caller owns overflow).

    Scale shape: one packed bucketed exchange on ``key``, then one
    lexsort + two prefix sums per bucket — no per-row Python, no
    sort-shuffle. Frames are rank-based, so ``order_by`` must be a
    total order within each key for deterministic output. Float sums
    accumulate in frame order (ties with SQL engines only up to fp
    associativity; exact on integral data)."""
    from .buckets import packed_bucket_map_groups

    key = [key] if isinstance(key, str) else list(key)
    order_by = list(order_by)
    for _c, d in order_by:
        if d not in ("ascending", "descending"):
            raise ValueError(f"order_by direction must be ascending/"
                             f"descending, got {d!r}")
    if agg not in ("sum", "mean", "count"):
        raise ValueError(f"agg must be sum/mean/count, got {agg!r}")
    if rows_preceding is not None and rows_preceding < 0:
        raise ValueError("rows_preceding must be None or >= 0")
    if out_col is None:
        frame = "cum" if rows_preceding is None else "roll"
        out_col = f"{col}_{frame}_{agg}"

    def _out_type(in_type: pa.DataType) -> pa.DataType:
        if agg == "count":
            return pa.int64()
        if agg == "mean":
            return pa.float64()
        return pa.int64() if pa.types.is_integer(in_type) else pa.float64()

    def reduce_group(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gbucket"])
        if group.num_rows == 0:
            return group.append_column(
                out_col,
                pa.array([], _out_type(group.schema.field(col).type)))
        g, starts, seg = _sorted_key_segments(group, key, order_by)
        n = g.num_rows
        arr = g.column(col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        valid = np.asarray(pc.is_valid(arr))
        is_int = pa.types.is_integer(arr.type)
        x = np.asarray(pc.fill_null(arr, 0).cast(
            pa.int64() if is_int else pa.float64()))  # nulls add nothing
        # prefix sums with a leading 0 so frame sums are two lookups
        cs = np.concatenate(([0], np.cumsum(x)))
        cn = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
        i = np.arange(n)
        if rows_preceding is None:
            w = starts[seg]
        else:
            w = np.maximum(starts[seg], i - rows_preceding)
        wsum = cs[i + 1] - cs[w]
        wcnt = cn[i + 1] - cn[w]
        if agg == "count":
            out = pa.array(wcnt, pa.int64())
        elif agg == "sum":
            out = pa.array(wsum, mask=wcnt == 0)
        else:
            mean = wsum.astype(np.float64) / np.maximum(wcnt, 1)
            out = pa.array(mean, pa.float64(), mask=wcnt == 0)
        return g.append_column(out_col, out)

    return packed_bucket_map_groups(ds, key, reduce_group)


def ntile_per_key(ds, key, order_by, n_tiles: int, *,
                  out_col: str = "ntile"):
    """Per-key NTILE — the SQL ``ntile(n) OVER (PARTITION BY key ORDER
    BY ...)`` bucket label (1-based; the first ``count % n`` buckets get
    the extra row, exactly SQL's distribution). Pure integer arithmetic
    on each row's rank, so results are bit-exact vs any SQL engine given
    a total ``order_by`` within each key.

    Scale shape: one packed bucketed exchange on ``key`` + one lexsort
    per bucket; no per-row Python."""
    from .buckets import packed_bucket_map_groups

    key = [key] if isinstance(key, str) else list(key)
    order_by = list(order_by)
    for _c, d in order_by:
        if d not in ("ascending", "descending"):
            raise ValueError(f"order_by direction must be ascending/"
                             f"descending, got {d!r}")
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")

    def reduce_group(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gbucket"])
        if group.num_rows == 0:
            return group.append_column(out_col, pa.array([], pa.int64()))
        g, starts, seg = _sorted_key_segments(group, key, order_by)
        n = g.num_rows
        pos = np.arange(n) - starts[seg]
        seg_len = np.diff(np.append(starts, n))[seg]
        small = seg_len // n_tiles                 # base bucket size
        rem = seg_len % n_tiles                    # buckets with +1 row
        boundary = rem * (small + 1)               # rows in the big buckets
        in_big = pos < boundary
        tile = np.where(
            in_big,
            pos // (small + 1),
            rem + (pos - boundary) // np.maximum(small, 1)) + 1
        return g.append_column(out_col, pa.array(tile, pa.int64()))

    return packed_bucket_map_groups(ds, key, reduce_group)


def rank_per_key(ds, key, order_by, *,
                 ranks=("rank", "dense_rank", "percent_rank", "cume_dist")):
    """Per-key SQL rank family — ``rank() / dense_rank() /
    percent_rank() / cume_dist() OVER (PARTITION BY key ORDER BY …)``
    with exact SQL tie semantics (peers share a rank; nulls are peers
    of nulls). ``ranks`` selects which columns to append, named after
    the SQL functions. All four are integer/ratio arithmetic on tie-run
    boundaries, so results are bit-exact vs any SQL engine.

    Scale shape: one packed bucketed exchange on ``key``, one lexsort
    per reduce task; tie runs are segmented by the canonical 128-bit
    order-key hash (collision odds ~2^-128), everything else is
    cumsum/gather — no per-row Python."""
    from ..functions.keys import hash_keys64_pair
    from .buckets import packed_bucket_map_groups

    key = [key] if isinstance(key, str) else list(key)
    order_by = [(o, "ascending") if isinstance(o, str) else (o[0], o[1])
                for o in order_by]
    allowed = ("rank", "dense_rank", "percent_rank", "cume_dist")
    ranks = tuple(ranks)
    if not ranks or any(r not in allowed for r in ranks):
        raise ValueError(f"ranks must be a non-empty subset of {allowed}")
    order_cols = [c for c, _ in order_by]

    def reduce_group(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gbucket"])
        if group.num_rows == 0:
            t = group
            for r in ranks:
                t = t.append_column(
                    r, pa.array([], pa.float64()
                                if r in ("percent_rank", "cume_dist")
                                else pa.int64()))
            return t
        g, starts, seg = _sorted_key_segments(group, key, order_by)
        n = g.num_rows
        oh1, oh2 = hash_keys64_pair(g, order_cols)
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        new_run[1:] = (oh1[1:] != oh1[:-1]) | (oh2[1:] != oh2[:-1])
        new_run[starts] = True                    # runs never span keys
        run_starts = np.nonzero(new_run)[0]
        rid = np.cumsum(new_run) - 1
        seg_start = starts[seg]
        seg_len = np.diff(np.append(starts, n))[seg]
        t = g
        if "rank" in ranks or "percent_rank" in ranks:
            rank = run_starts[rid] - seg_start + 1
        if "rank" in ranks:
            t = t.append_column("rank", pa.array(rank, pa.int64()))
        if "dense_rank" in ranks:
            dcum = np.cumsum(new_run)
            dense = dcum - dcum[seg_start] + 1
            t = t.append_column("dense_rank", pa.array(dense, pa.int64()))
        if "percent_rank" in ranks:
            denom = np.maximum(seg_len - 1, 1)
            pr = (rank - 1) / denom               # single row → 0.0
            t = t.append_column("percent_rank", pa.array(pr, pa.float64()))
        if "cume_dist" in ranks:
            run_ends = np.append(run_starts[1:], n)
            cd = (run_ends[rid] - seg_start) / seg_len
            t = t.append_column("cume_dist", pa.array(cd, pa.float64()))
        return t

    return packed_bucket_map_groups(ds, key, reduce_group)


def first_last_per_key(ds, key, order_by, col, *,
                       values=("first", "last"), nth: int | None = None,
                       ignore_nulls: bool = False):
    """Per-key SQL ``first_value / last_value / nth_value(col, n) OVER
    (PARTITION BY key ORDER BY … ROWS BETWEEN UNBOUNDED PRECEDING AND
    UNBOUNDED FOLLOWING)`` — each row annotated with its partition's
    first / last / n-th value under the order. The explicit
    full-partition frame (not SQL's default running frame) is the form
    users actually want ("the user's first/latest event"), and the one
    that is order-total and oracle-checkable. ``ignore_nulls=True``
    gives the IGNORE NULLS variant of first/last (nth stays RESPECT
    NULLS, as in most engines' defaults). Output columns are
    ``first_<col>`` / ``last_<col>`` / ``nth<n>_<col>``; any input
    column type works (values are gathered, never copied element-wise).

    Scale shape: one packed bucketed exchange on ``key``, one lexsort
    per reduce task, then pure index arithmetic (reduceat extrema for
    the null-skipping variant) + zero-copy takes — no per-row Python."""
    from .buckets import packed_bucket_map_groups

    key = [key] if isinstance(key, str) else list(key)
    order_by = [(o, "ascending") if isinstance(o, str) else (o[0], o[1])
                for o in order_by]
    values = tuple(values)
    if any(v not in ("first", "last") for v in values):
        raise ValueError("values must be a subset of ('first', 'last')")
    if not values and nth is None:
        raise ValueError("nothing to compute: empty values and nth=None")
    if nth is not None and nth < 1:
        raise ValueError("nth is 1-based and must be >= 1")
    out_names = [f"{v}_{col}" for v in values]
    if nth is not None:
        out_names.append(f"nth{nth}_{col}")

    def reduce_group(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gbucket"])
        if group.num_rows == 0:
            t = group
            for name in out_names:
                t = t.append_column(
                    name, pa.array([], group.schema.field(col).type))
            return t
        g, starts, seg = _sorted_key_segments(group, key, order_by)
        n = g.num_rows
        arr = g.column(col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        seg_start = starts[seg]
        seg_end = np.append(starts[1:], n)[seg]          # exclusive
        t = g
        if ignore_nulls and ("first" in values or "last" in values):
            valid = np.asarray(pc.is_valid(arr))
            i = np.arange(n)
        for v in values:
            if v == "first":
                idx = seg_start
                if ignore_nulls:
                    fv = np.minimum.reduceat(np.where(valid, i, n), starts)
                    idx = fv[seg]                        # n → all-null key
                    idx = np.where(idx < n, idx, -1)
            else:
                idx = seg_end - 1
                if ignore_nulls:
                    lv = np.maximum.reduceat(np.where(valid, i, -1), starts)
                    idx = lv[seg]                        # -1 → all-null key
            gathered = arr.take(pa.array(
                np.where(idx >= 0, idx, 0), pa.int64()))
            if ignore_nulls and (idx < 0).any():
                gathered = pc.if_else(pa.array(idx >= 0), gathered,
                                      pa.scalar(None, arr.type))
            t = t.append_column(f"{v}_{col}", gathered)
        if nth is not None:
            pos = seg_start + (nth - 1)
            in_seg = pos < seg_end
            gathered = arr.take(pa.array(np.where(in_seg, pos, 0), pa.int64()))
            if not in_seg.all():
                gathered = pc.if_else(pa.array(in_seg), gathered,
                                      pa.scalar(None, arr.type))
            t = t.append_column(f"nth{nth}_{col}", gathered)
        return t

    return packed_bucket_map_groups(ds, key, reduce_group)


def ewma_per_key(ds, key, order_by, col, *, alpha: float,
                 out_col: str | None = None):
    """Per-key exponential moving average — pandas
    ``groupby(key)[col].ewm(alpha=alpha, adjust=False,
    ignore_na=True).mean()`` under an explicit ``order_by``:
    ``y_0 = x_0``, ``y_t = (1-alpha)·y_{t-1} + alpha·x_t`` over the
    key's non-null values. The streaming-features primitive (decayed
    activity rates, recency-weighted scores) with no SQL window
    equivalent; pandas is the correctness oracle in tests. Null rows
    don't advance the decay and carry the previous EWMA forward
    (ignore_na=True semantics); rows before a key's first value are
    null.

    Scale shape: one packed bucketed exchange on ``key``, one lexsort
    per reduce task, then a SEGMENTED AFFINE SCAN: each row is the map
    ``y ↦ q·y + alpha·x`` (``(0, x)`` at segment starts, absorbing),
    composed by pointer doubling in ``log2(rows)`` fully-vectorized
    passes. All multipliers are powers of ``q ≤ 1``, so the scan is
    numerically stable for any segment length — no ``q^{-t}`` prefix
    rescaling, no per-row or per-key Python."""
    from .buckets import packed_bucket_map_groups

    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    key = [key] if isinstance(key, str) else list(key)
    order_by = [(o, "ascending") if isinstance(o, str) else (o[0], o[1])
                for o in order_by]
    out = out_col or f"ewma_{col}"
    q = 1.0 - alpha

    def reduce_group(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gbucket"])
        if group.num_rows == 0:
            return group.append_column(out, pa.array([], pa.float64()))
        g, starts, seg = _sorted_key_segments(group, key, order_by)
        n = g.num_rows
        arr = g.column(col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        # cast BEFORE fill_null: filling an int64 array with nan raises
        x = np.asarray(pc.fill_null(arr.cast(pa.float64()), np.nan),
                       dtype=np.float64)
        valid = ~np.isnan(x)
        vi = np.nonzero(valid)[0]
        yout = np.full(n, np.nan, dtype=np.float64)
        if vi.size:
            xv = x[vi]
            segv = seg[vi]
            nv = vi.size
            first = np.empty(nv, dtype=bool)
            first[0] = True
            first[1:] = segv[1:] != segv[:-1]
            # affine maps y -> M*y + C; segment firsts absorb (M=0)
            M = np.where(first, 0.0, q)
            C = np.where(first, xv, alpha * xv)
            s = 1
            while s < nv:
                M2 = M.copy()
                C2 = C.copy()
                C2[s:] = M[s:] * C[:-s] + C[s:]
                M2[s:] = M[s:] * M[:-s]
                M, C = M2, C2
                s <<= 1
            yv = C                      # every segment starts absorbing
            # scatter back; null rows carry the previous valid y forward
            yfull = np.full(n, np.nan)
            yfull[vi] = yv
            idx = np.where(valid, np.arange(n), -1)
            idx = np.maximum.accumulate(idx)
            idx = np.where(idx >= starts[seg], idx, -1)
            yout = np.where(idx >= 0, yfull[np.maximum(idx, 0)], np.nan)
        return g.append_column(out, pa.array(yout, pa.float64()))

    return packed_bucket_map_groups(ds, key, reduce_group)


def fill_forward_per_key(ds, key, order_by, cols, *,
                         suffix: str = "_ff"):
    """Per-key forward fill (LOCF) — SQL ``last_value(col IGNORE NULLS)
    OVER (PARTITION BY key ORDER BY … ROWS BETWEEN UNBOUNDED PRECEDING
    AND CURRENT ROW)``: each null carries the key's most recent non-null
    value forward; rows before the first value stay null. The standard
    gap-repair step for sensor/event feature columns. Appends
    ``{col}{suffix}`` per input column (any type — values are gathered,
    never converted).

    Scale shape: one packed bucketed exchange on ``key``, one lexsort
    per reduce task, then a running maximum over valid-row indices per
    column — pure index arithmetic, no per-row Python."""
    from .buckets import packed_bucket_map_groups

    key = [key] if isinstance(key, str) else list(key)
    order_by = [(o, "ascending") if isinstance(o, str) else (o[0], o[1])
                for o in order_by]
    cols = [cols] if isinstance(cols, str) else list(cols)

    def reduce_group(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gbucket"])
        if group.num_rows == 0:
            t = group
            for c in cols:
                t = t.append_column(f"{c}{suffix}",
                                    group.column(c).slice(0, 0))
            return t
        g, starts, seg = _sorted_key_segments(group, key, order_by)
        n = g.num_rows
        seg_start = starts[seg]
        t = g
        for c in cols:
            arr = g.column(c)
            arr = (arr.combine_chunks()
                   if isinstance(arr, pa.ChunkedArray) else arr)
            valid = np.asarray(pc.is_valid(arr))
            idx = np.where(valid, np.arange(n), -1)
            idx = np.maximum.accumulate(idx)
            idx = np.where(idx >= seg_start, idx, -1)   # stay in key
            filled = arr.take(pa.array(np.maximum(idx, 0), pa.int64()))
            if (idx < 0).any():
                filled = pc.if_else(pa.array(idx >= 0), filled,
                                    pa.scalar(None, arr.type))
            t = t.append_column(f"{c}{suffix}", filled)
        return t

    return packed_bucket_map_groups(ds, key, reduce_group)


def share_per_key(ds, key, col, *, out_col: str | None = None):
    """Per-key share of total — SQL ``col / sum(col) OVER (PARTITION BY
    key)``: each row's fraction of its key's total (spend share, token
    share, traffic mix). Null values contribute nothing and get a null
    share; an all-null or zero-total key yields null/±inf exactly as
    the SQL division does. Integer inputs sum exactly in int64 and the
    share is one double division of exact operands — bit-reproducible
    in SQL; float inputs carry the usual distributed-sum order caveat.

    Scale shape: one packed bucketed exchange on ``key``; per reduce
    task one lexsort + one segment-sum (reduceat) + one vectorized
    division."""
    from .buckets import packed_bucket_map_groups

    key = [key] if isinstance(key, str) else list(key)
    out = out_col or f"{col}_share"

    def reduce_group(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gbucket"])
        if group.num_rows == 0:
            return group.append_column(out, pa.array([], pa.float64()))
        g, starts, seg = _sorted_key_segments(group, key, [])
        arr = g.column(col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        is_int = pa.types.is_integer(arr.type)
        x = np.asarray(pc.fill_null(arr, 0).cast(
            pa.int64() if is_int else pa.float64()))
        totals = np.add.reduceat(x, starts)
        tot = totals[seg].astype(np.float64)
        valid = np.asarray(pc.is_valid(arr))
        with np.errstate(divide="ignore", invalid="ignore"):
            share = np.where(valid, x.astype(np.float64) / tot, np.nan)
        res = pa.array(share, pa.float64())
        if not valid.all():
            res = pc.if_else(pa.array(valid), res,
                             pa.scalar(None, pa.float64()))
        return g.append_column(out, res)

    return packed_bucket_map_groups(ds, key, reduce_group)


def tail_by_budget(ds, key, order_by, cost_col, budget, *,
                   keep_first: bool = True, out_col: str | None = "cum_cost"):
    """Per-key budgeted tail — context-window truncation for conversation
    transcripts: rank each key's rows by ``order_by`` (give it in RECENCY
    order, e.g. ``[("turn_idx", "descending")]``) and keep the prefix of
    that ranking whose running ``cost_col`` sum stays ≤ ``budget`` (the
    most recent turns that fit a token budget). ``keep_first=True`` always
    keeps the rank-1 row (an LLM pipeline never drops the latest turn,
    even when it alone exceeds the budget). SQL-exact:

        sum(cost) OVER (PARTITION BY key ORDER BY ... ROWS UNBOUNDED
        PRECEDING) <= budget  OR  row_number() = 1

    Null costs add nothing (SQL SUM semantics). Integer costs accumulate
    in int64, so the filter and the appended running-sum column
    (``out_col``; pass None to drop it) are bit-exact vs the SQL window;
    float costs carry the usual per-key accumulation-order caveat (the
    in-key order is deterministic, so results are still reproducible).

    Scale shape: one packed bucketed exchange on ``key``, then per bucket
    one lexsort + one prefix sum + one filter take — no per-row Python.
    Output rows ≤ input rows; the dropped mass never leaves the reduce
    task. order_by must totally order each key's rows for deterministic
    output (add a unique id as the last tie-breaker)."""
    from .buckets import packed_bucket_map_groups

    key = [key] if isinstance(key, str) else list(key)
    order_by = list(order_by)
    for _c, d in order_by:
        if d not in ("ascending", "descending"):
            raise ValueError(f"order_by direction must be ascending/"
                             f"descending, got {d!r}")

    def _out_type(in_type: pa.DataType) -> pa.DataType:
        return pa.int64() if pa.types.is_integer(in_type) else pa.float64()

    def reduce_group(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gbucket"])
        if group.num_rows == 0:
            if out_col is not None:
                group = group.append_column(
                    out_col,
                    pa.array([], _out_type(group.schema.field(cost_col).type)))
            return group
        g, starts, seg = _sorted_key_segments(group, key, order_by)
        arr = g.column(cost_col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        is_int = pa.types.is_integer(arr.type)
        x = np.asarray(pc.fill_null(arr, 0).cast(
            pa.int64() if is_int else pa.float64()))
        cs = np.concatenate(([0], np.cumsum(x)))
        i = np.arange(g.num_rows)
        cum = cs[i + 1] - cs[starts[seg]]       # running sum within key
        keep = cum <= budget
        if keep_first:
            keep |= i == starts[seg]
        if out_col is not None:
            g = g.append_column(out_col, pa.array(
                cum, pa.int64() if is_int else pa.float64()))
        return g.filter(pa.array(keep))

    return packed_bucket_map_groups(ds, key, reduce_group)


def truncate_context(ds, budget: int, *, key: str = "conv_id",
                     order_col: str = "turn_idx", text_col: str = "text",
                     keep_first: bool = True, out_col: str = "cum_tokens"):
    """Context-window truncation over a transcript table (the input_hint
    schema): per conversation, keep the MOST RECENT turns whose cumulative
    whitespace-token count fits ``budget`` — what a serving / fine-tuning
    pipeline does to fit each conversation into a model context. The
    latest turn always survives (``keep_first``). Token cost is
    ``functions.text.token_count`` (``\\S+`` runs — swap in
    ``count_tokens_bpe``'s column and ``tail_by_budget`` directly for a
    BPE-metered variant). One vectorized counting pass + one packed
    exchange on ``key``; see ``tail_by_budget`` for the exact semantics.
    """
    from ..functions.text import token_count

    def add_cost(batch: pa.Table) -> pa.Table:
        return batch.append_column("_ctx_cost",
                                   token_count(batch.column(text_col)))

    costed = ds.map_batches(add_cost, batch_format="pyarrow")
    kept = tail_by_budget(costed, key, [(order_col, "descending")],
                          "_ctx_cost", budget, keep_first=keep_first,
                          out_col=out_col)
    return kept.drop_columns(["_ctx_cost"])
