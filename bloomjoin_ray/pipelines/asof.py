"""As-of (temporal) join — an operator the Dataset API lacks, expressed
as the ``range_join`` zipper without the interval-end bound: co-bucket
both sides on the equality key, and inside each bucket ONE lexsort of
the merged left+right rows by (key-hash pair, time, side) drives a
vectorized sweep — each right row marks its sorted position,
``np.maximum.accumulate`` carries the latest right row at or before
every left row. No per-key Python, no pandas round-trip; the shuffle
moves each row exactly once.

Semantics (DuckDB ``ASOF LEFT JOIN`` parity, oracle-testable): for each
left row, attach the right row with the same ``by`` key and the
greatest ``on`` value ≤ the left row's ``on`` value
(``direction="backward"``); ``direction="forward"`` attaches the
smallest ``on`` value ≥ instead (the sweep over negated time);
``direction="nearest"`` the closer of the two (backward wins distance
ties — pandas' rule). All directions are inclusive and accept
``tolerance``, matching ``pd.merge_asof``.

Partitioning assumption: the equality key distributes uniformly across
hash buckets; all rows of one key land in one bucket, so the
within-bucket sweep sees the key's full history. Without an equality
key there is nothing to partition by — all rows route through a single
bucket (one reduce task; the right side is never driver-materialized).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.keys import hash_keys64, hash_keys64_pair


def _order_key(col, name: str) -> np.ndarray:
    """int64 order key for an orderable column (nulls → 0; callers only
    read positions whose validity is already established). Timestamps,
    dates and integers cast; floats map through the IEEE-754 monotone
    bit transform (order-preserving into int64)."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    t = col.type
    if (pa.types.is_timestamp(t) or pa.types.is_integer(t)
            or pa.types.is_date64(t)):
        return np.asarray(pc.fill_null(col.cast(pa.int64()), 0))
    if pa.types.is_date32(t):
        return np.asarray(pc.fill_null(col.cast(pa.int32()), 0)).astype(np.int64)
    if pa.types.is_floating(t):
        v = np.asarray(pc.fill_null(col.cast(pa.float64()), 0.0))
        b = v.view(np.int64)
        # monotone IEEE map: non-negatives keep their bits, negatives
        # flip magnitude bits so more-negative sorts lower
        return b ^ ((b >> np.int64(63)) & np.int64(0x7FFFFFFFFFFFFFFF))
    raise TypeError(f"asof_join column {name!r} must be timestamp, date, "
                    f"integer or float, got {t}")


def _tolerance_int(tolerance, on_type: pa.DataType) -> int | None:
    """Resolve a ``pd.merge_asof``-style tolerance to the ``on``
    column's native int64 unit: plain ints pass through (µs for
    timestamp[us], days for date32, raw for integers);
    ``datetime.timedelta`` / ``np.timedelta64`` convert by the column's
    time unit. Float ``on`` columns are rejected — their order key is
    the monotone IEEE bit transform, where differences are not
    distances."""
    if tolerance is None:
        return None
    if pa.types.is_floating(on_type):
        raise TypeError("tolerance is not supported for float 'on' "
                        "columns (their int64 order key is the IEEE "
                        "bit transform — not a distance domain)")
    import datetime

    if isinstance(tolerance, (datetime.timedelta, np.timedelta64)):
        td = np.timedelta64(tolerance)
        if pa.types.is_timestamp(on_type):
            tol = int(td / np.timedelta64(1, on_type.unit))
        elif pa.types.is_date32(on_type):
            tol = int(td / np.timedelta64(1, "D"))
        elif pa.types.is_date64(on_type):
            tol = int(td / np.timedelta64(1, "ms"))
        else:
            raise TypeError("timedelta tolerance needs a timestamp/date "
                            f"'on' column, got {on_type}")
    else:
        tol = int(tolerance)
    if tol < 0:
        raise ValueError(f"tolerance must be >= 0, got {tol}")
    return tol


def asof_join(ds_left, ds_right, on: str, by: str | list[str] | None = None, *,
              num_buckets: int = 64, suffixes=("", "_right"),
              direction: str = "backward", tolerance=None,
              broadcast_limit_rows: int = 5_000_000):
    """Left as-of join of two Datasets. ``on`` must be an orderable
    column present on both sides (timestamp/date/integer/float); ``by``
    the equality key(s), or None for a pure temporal join. Returns a
    Dataset with all left rows + matched right columns (nulls when no
    match).

    ``tolerance`` (``pd.merge_asof`` parity) bounds the match gap:
    a backward match additionally needs ``l.on - r.on <= tolerance``
    (forward: ``r.on - l.on``); lefts whose nearest candidate sits
    outside it get nulls. Ints are in the column's native unit,
    timedeltas convert (see ``_tolerance_int``); float ``on`` columns
    reject it.

    Without ``by`` there is nothing to partition on: a right side of ≤
    ``broadcast_limit_rows`` broadcasts once (``ray.put``) and the left
    side streams through a vectorized ``searchsorted`` zipper per batch
    (fully distributed); a larger right side routes both sides through
    one exact single-bucket sweep instead."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest'")
    nearest = direction == "nearest"
    by_cols = [by] if isinstance(by, str) else list(by or [])

    left_schema = _schema_of(ds_left)
    right_schema = _schema_of(ds_right)
    tol = _tolerance_int(tolerance, left_schema.field(on).type)
    if nearest and pa.types.is_floating(left_schema.field(on).type):
        raise TypeError("direction='nearest' is not supported for float "
                        "'on' columns (their int64 order key is the IEEE "
                        "bit transform — order-true but not distance-true)")
    right_keep = [c for c in right_schema.names if c not in by_cols and c != on]
    rename_right = {c: c + suffixes[1] if c in set(left_schema.names) else c
                    for c in right_keep}
    out_schema = pa.schema(
        [left_schema.field(c) for c in left_schema.names]
        + [pa.field(rename_right[c], right_schema.field(c).type)
           for c in right_keep])

    if not by_cols:
        from .join import _materialize_if_small

        right_tbl = _materialize_if_small(ds_right, broadcast_limit_rows)
        if right_tbl is not None:
            return _broadcast_asof(ds_left, right_tbl, on, right_keep,
                                   rename_right, left_schema, out_schema,
                                   negate=direction == "forward", tol=tol,
                                   nearest=nearest)
        num_buckets = 1                      # too large to broadcast

    unified = pa.schema(
        [pa.field(f"__l_{c}", left_schema.field(c).type)
         for c in left_schema.names]
        + [pa.field(f"__r_{c}", right_schema.field(c).type)
           for c in right_keep]
        + [pa.field("__t", pa.int64()), pa.field("__tv", pa.bool_()),
           pa.field("__h1", pa.uint64()),
           pa.field("__h2", pa.uint64()), pa.field("__side", pa.int8()),
           pa.field("__bucket", pa.int32())])

    negate = direction == "forward"

    def prep(side: int, names: list[str], prefix: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            if by_cols:
                h1, h2 = hash_keys64_pair(batch, by_cols)
                bucket = (hash_keys64(batch, by_cols)
                          % np.uint64(num_buckets)).astype(np.int32)
            else:
                h1 = h2 = np.zeros(n, dtype=np.uint64)
                bucket = np.zeros(n, dtype=np.int32)
            tv = _order_key(batch.column(on), on)
            if negate:
                tv = -tv
            # null `on` never matches on either side (SQL semantics)
            tvalid = np.asarray(pc.is_valid(batch.column(on)))
            arrays = []
            for f in unified:
                nm = f.name
                if nm.startswith(prefix) and nm[len(prefix):] in names:
                    col = batch.column(nm[len(prefix):])
                    col = (col.combine_chunks()
                           if isinstance(col, pa.ChunkedArray) else col)
                    arrays.append(col.cast(f.type))
                elif nm == "__t":
                    arrays.append(pa.array(tv, type=pa.int64()))
                elif nm == "__tv":
                    arrays.append(pa.array(tvalid, type=pa.bool_()))
                elif nm == "__h1":
                    arrays.append(pa.array(h1))
                elif nm == "__h2":
                    arrays.append(pa.array(h2))
                elif nm == "__side":
                    arrays.append(pa.array(
                        np.full(n, side, dtype=np.int8)))
                elif nm == "__bucket":
                    arrays.append(pa.array(bucket))
                else:
                    arrays.append(pa.nulls(n, f.type))
            return pa.Table.from_arrays(arrays, schema=unified)

        return fn

    tagged = (ds_left.map_batches(
                  prep(1, list(left_schema.names), "__l_"),
                  batch_format="pyarrow")
              .union(ds_right.map_batches(
                  prep(0, right_keep, "__r_"),
                  batch_format="pyarrow")))

    def join_bucket(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return out_schema.empty_table()
        side = np.asarray(group.column("__side"))
        t = np.asarray(group.column("__t"))
        tv = np.asarray(group.column("__tv"))
        h1 = np.asarray(group.column("__h1"))
        h2 = np.asarray(group.column("__h2"))
        # rights (side 0) sort before lefts at equal time → a right row
        # at exactly `on` matches (inclusive, both directions); among
        # equal-(key, t) rights the accumulate picks the LAST in sorted
        # order, matching pd.merge_asof's last-duplicate rule
        order = np.lexsort((side, t, h2, h1))
        side_s = side[order]
        tv_s = tv[order]
        li = np.nonzero(side_s == 1)[0]          # lefts, sorted positions
        if li.size == 0:
            return out_schema.empty_table()
        # null-timed rights are never match candidates
        marker = np.where((side_s == 0) & tv_s, np.arange(n), -1)
        last = np.maximum.accumulate(marker)     # latest right ≤ here
        j = last[li]
        valid = j >= 0
        jj = np.where(valid, j, 0)
        h1_s, h2_s = h1[order], h2[order]
        valid &= (h1_s[jj] == h1_s[li]) & (h2_s[jj] == h2_s[li])
        valid &= tv_s[li]                        # null-timed lefts never match
        t_s = t[order]
        if tol is not None:
            # gap in the (possibly negated) int64 time domain; l >= r on
            # valid rows so the uint64 subtraction is exact at any span
            gap = (t_s[li].astype(np.uint64) - t_s[jj].astype(np.uint64))
            valid &= gap <= np.uint64(tol)
        if nearest:
            # forward candidate: first right STRICTLY after the left in
            # sorted order (equal-t rights sort before lefts, so backward
            # already owns exact matches; duplicate forward rights pick
            # the first, pandas' rule). Backward wins distance ties.
            mf = np.where((side_s == 0) & tv_s, np.arange(n), 2 * n)
            nxt = np.minimum.accumulate(mf[::-1])[::-1]
            jf = nxt[li]
            validf = jf < n
            jjf = np.where(validf, jf, 0)
            validf &= (h1_s[jjf] == h1_s[li]) & (h2_s[jjf] == h2_s[li])
            validf &= tv_s[li]
            gap_b = t_s[li].astype(np.uint64) - t_s[jj].astype(np.uint64)
            gap_f = t_s[jjf].astype(np.uint64) - t_s[li].astype(np.uint64)
            if tol is not None:
                validf &= gap_f <= np.uint64(tol)
            use_f = validf & (~valid | (gap_f < gap_b))
            jj = np.where(use_f, jjf, jj)
            valid |= validf
        left_orig = order[li]
        right_orig = order[jj]                   # original matched right row
        arrays = []
        lo = pa.array(left_orig)
        for c in left_schema.names:
            col = group.column(f"__l_{c}")
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            arrays.append(col.take(lo))
        ro = pa.array(np.where(valid, right_orig, 0))
        mask = pa.array(valid)
        for c in right_keep:
            col = group.column(f"__r_{c}")
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            taken = col.take(ro)
            if not valid.all():
                taken = pc.if_else(mask, taken, pa.nulls(len(valid), col.type))
            arrays.append(taken)
        return pa.Table.from_arrays(arrays, schema=out_schema)

    from .buckets import packed_bucket_map_groups

    # packed exchange instead of groupby("__bucket"): skips Ray's
    # sort-shuffle launch floor; join_bucket is bucket-union-invariant
    # (it re-segments by the key-hash pair inside)
    return packed_bucket_map_groups(tagged, None, join_bucket,
                                    num_buckets=num_buckets,
                                    bucket_col="__bucket", pre_bucketed=True)


def _broadcast_asof(ds_left, right_tbl: pa.Table, on: str,
                    right_keep: list[str], rename_right: dict,
                    left_schema: pa.Schema, out_schema: pa.Schema, *,
                    negate: bool, tol: int | None = None,
                    nearest: bool = False):
    """No-``by`` as-of with a broadcastable right side: the right rows
    sort once on the driver, ship via one ``ray.put``, and every left
    batch matches with a vectorized ``searchsorted`` (side='right' − 1 =
    the latest right ≤ each left ``on``, last among duplicates — the
    same tie rule as the bucketed sweep). The left side never
    materializes; no pandas."""
    import ray

    rvalid = np.asarray(pc.is_valid(right_tbl.column(on)))
    rsub = (right_tbl.filter(pa.array(rvalid))
            if not rvalid.all() else right_tbl)
    rt = _order_key(rsub.column(on), on)
    if negate:
        rt = -rt
    order = np.argsort(rt, kind="stable")
    ref = ray.put((rt[order], rsub.take(pa.array(order)).combine_chunks()))

    def fn(batch: pa.Table) -> pa.Table:
        times, right = ray.get(ref)
        n = batch.num_rows
        lt = _order_key(batch.column(on), on)
        if negate:
            lt = -lt
        lvalid = np.asarray(pc.is_valid(batch.column(on)))
        j = np.searchsorted(times, lt, side="right") - 1
        valid = (j >= 0) & lvalid if len(times) else np.zeros(n, dtype=bool)
        jj = np.where(valid, j, 0)
        if tol is not None and len(times):
            gap = lt.astype(np.uint64) - times[jj].astype(np.uint64)
            valid &= gap <= np.uint64(tol)
        if nearest and len(times):
            # first right strictly after lt (backward owns exact hits;
            # duplicate forward rights pick the first; backward wins
            # distance ties — pandas' rules)
            jf = np.searchsorted(times, lt, side="right")
            validf = (jf < len(times)) & lvalid
            jjf = np.where(validf, jf, 0)
            gap_b = lt.astype(np.uint64) - times[jj].astype(np.uint64)
            gap_f = times[jjf].astype(np.uint64) - lt.astype(np.uint64)
            if tol is not None:
                validf &= gap_f <= np.uint64(tol)
            use_f = validf & (~valid | (gap_f < gap_b))
            jj = np.where(use_f, jjf, jj)
            valid |= validf
        arrays = []
        for c in left_schema.names:
            col = batch.column(c)
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            arrays.append(col.cast(out_schema.field(c).type))
        mask = pa.array(valid)
        ro = pa.array(jj)
        for c in right_keep:
            col = right.column(c)
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            taken = col.take(ro) if len(times) else pa.nulls(n, col.type)
            if len(times) and not valid.all():
                taken = pc.if_else(mask, taken, pa.nulls(n, col.type))
            arrays.append(taken)
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return ds_left.map_batches(fn, batch_format="pyarrow")


def _schema_of(ds) -> pa.Schema:
    schema = ds.schema()
    if schema is None:  # fully-empty Dataset: Ray loses the schema
        return pa.schema([])
    base = getattr(schema, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema([pa.field(n, t) for n, t in zip(schema.names, schema.types)])
