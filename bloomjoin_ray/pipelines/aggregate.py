"""Sketch aggregation pipelines: global + grouped (skew-aware salted),
plus exact distributed distinct / top-k.

Shuffle discipline (SURVEY §7.3):

* **global sketches** — no shuffle at all: per-block partials
  (``map_batches``) + a tiny merge. Mergeability is the whole point.
* **grouped sketches** — rows never shuffle; per-block per-key partial
  sketches shuffle instead (orders of magnitude smaller). With
  ``salt=S`` a two-stage reduce first merges partials within
  ``(key, salt)`` sub-groups so one hot key (Zipf conv_id) fans out
  across S reducers before the final per-key merge — legal precisely
  because sketch merge is associative/commutative (property-tested).
* **exact aggregates** — per-block pre-aggregation (dedupe / local
  counts) before the ``groupby`` so the shuffle carries partials, not rows.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pyarrow as pa

from ..functions.keys import ALT_SEED, hash_keys64
from ..state.base import merge_all, sketch_from_bytes
from ..state.cms import CountMinSketch
from ..state.hll import HllSketch
from ..state.kll import KllSketch
from ..state.tdigest import TDigest
from ..stages.sketch_stages import GlobalSketchPartial, GroupedSketchPartial

# Driver-side merge handles up to this many partials before falling back
# to remote tree merge. Partial blobs are small (16KB HLL / 160KB CMS), so
# even 1024 merge in ~100ms on the driver — while a remote merge wave in a
# mixed workload pays cold plain-task worker starts (the Data pool reaps
# idle plain workers), which costs far more than it saves below ~10^3
# partials. Cluster-scale runs (10^5+ blocks) still tree-merge.
_TREE_MERGE_FANIN = 1024


# --------------------------------------------------------------------------
# generic machinery
# --------------------------------------------------------------------------

def sketch_aggregate_global(ds, make: Callable, update: Callable, *,
                            input_cols: Sequence[str] | None = None):
    """One merged sketch over the whole Dataset. Column-pruned read,
    per-block partials, driver/tree merge; returns the sketch (None if
    the dataset is empty)."""
    import ray

    if input_cols:
        ds = ds.select_columns(list(input_cols))
    rows = ds.map_batches(GlobalSketchPartial(make, update),
                          batch_format="pyarrow").take_all()
    states = [r["state"] for r in rows]
    if len(states) > _TREE_MERGE_FANIN:
        @ray.remote
        def merge_chunk(blobs):
            return merge_all(sketch_from_bytes(bytes(b)) for b in blobs).to_bytes()

        refs = [merge_chunk.remote(states[i:i + _TREE_MERGE_FANIN])
                for i in range(0, len(states), _TREE_MERGE_FANIN)]
        return merge_all(sketch_from_bytes(b) for b in ray.get(refs))
    return merge_all(sketch_from_bytes(bytes(b)) for b in states)


def sketch_aggregate_grouped(ds, key: str | Sequence[str], make: Callable,
                             update: Callable, finalize: Callable[[object], dict], *,
                             input_cols: Sequence[str] | None = None,
                             salt: int | None = None,
                             partial_stage: Callable | None = None):
    """Per-key merged sketches → Dataset[key cols + finalize() columns].

    ``finalize(sketch) -> {col: value}`` names the output columns.
    ``salt=S`` inserts a pre-reduce stage on ``(key, salt)`` for hot keys.
    ``partial_stage`` substitutes a specialized (vectorized) per-block
    partial builder for the generic one.
    """
    key_cols = [key] if isinstance(key, str) else list(key)
    if input_cols:
        cols = list(dict.fromkeys(key_cols + list(input_cols)))
        ds = ds.select_columns(cols)
    stage = partial_stage or GroupedSketchPartial(key_cols, make, update)
    partials = ds.map_batches(stage, batch_format="pyarrow")

    if salt and salt > 1:
        S = int(salt)

        def add_salt(batch: pa.Table) -> pa.Table:
            sarr = (np.arange(batch.num_rows) % S).astype(np.int32)
            return batch.append_column("__salt", pa.array(sarr))

        def presum(states) -> dict:
            return {"state": merge_all(
                sketch_from_bytes(bytes(b)) for b in states).to_bytes()}

        partials = _bucketed_group_reduce(
            partials.map_batches(add_salt, batch_format="pyarrow"),
            key_cols + ["__salt"], presum,
            state_type=pa.large_binary()).drop_columns(["__salt"])

    def final(states) -> dict:
        return finalize(merge_all(sketch_from_bytes(bytes(b)) for b in states))

    return _bucketed_group_reduce(partials, key_cols, final)


def _key_group_bounds(t: pa.Table, key_cols: list[str]):
    """(order, bounds) splitting rows into equal-key groups. Keys are
    identified by the (SEED, ALT_SEED) 64-bit hash PAIR — two distinct
    keys merge only if both hashes collide (~2^-128/pair), closing the
    silent single-hash birthday merge at 10^9+ distinct keys."""
    from ..functions.keys import hash_keys64_pair

    n = t.num_rows
    h1, h2 = hash_keys64_pair(t, key_cols)
    order = np.lexsort((h2, h1))
    d = (np.diff(h1[order]) != 0) | (np.diff(h2[order]) != 0)
    bounds = np.concatenate([[0], np.nonzero(d)[0] + 1, [n]])
    return order, bounds


def _reduce_packed_blocks(key_cols: list[str], per_key: Callable,
                          group: int, num_groups: int, refs):
    """Runs inside a Ray task: stream this group's packs
    (``bucket % num_groups == group``) from every map-block slice,
    unpack incrementally, reduce per key."""
    t = _gather_bucket_packs(group, num_groups, refs)
    if t is None:
        return 0, None
    order, bounds = _key_group_bounds(t, key_cols)
    states_sorted = t.column("state").combine_chunks().take(pa.array(order))
    first_rows = order[bounds[:-1]]
    out_cols: dict[str, list] = {}
    for i in range(len(bounds) - 1):
        states = states_sorted.slice(bounds[i], bounds[i + 1] - bounds[i]).to_pylist()
        for name, value in per_key(states).items():
            out_cols.setdefault(name, []).append(value)
    out = t.take(pa.array(first_rows)).select(key_cols)
    for name, values in out_cols.items():
        out = out.append_column(name, pa.array(values))
    return out.num_rows, out


def _gather_bucket_packs(group: int, num_groups: int, refs) -> pa.Table | None:
    """Concat this modulo-group's packs, streaming one map-block slice
    at a time from the object store: each packed slice is unpacked and
    dropped before the next fetch, so reducer peak memory is the
    UNPACKED partition plus one slice — not packed + unpacked of the
    whole partition at once."""
    import ray

    tables = []
    for ref in refs:
        blk = ray.get(ref)
        if blk.num_rows == 0:
            continue
        gb = np.asarray(blk.column("__gbucket"))
        sel = gb % num_groups == group
        if sel.any():
            for b in blk.filter(pa.array(sel)).column("pack").to_pylist():
                tables.append(pa.ipc.open_stream(
                    pa.BufferReader(bytes(b))).read_all())
    if not tables:
        return None
    return pa.concat_tables(tables).combine_chunks()


def _reduce_packed_hll(key_cols: list[str], out_col: str, p: int, cap: int,
                       group: int, num_groups: int, refs):
    """Vectorized grouped-distinct reduce over RAW-hash-list partials
    (``GroupedHllPartial._partial_rows_raw``): one lexsort dedupes every
    key's hashes at once — Python touches only the rare keys that carry
    a dense per-block HLL blob or overflow ``cap`` in aggregate (those
    get the dense sketch's 1.04/√m estimate; the rest are exact counts,
    same as SparseHll's sparse mode)."""
    from ..state.hll import HllSketch, SparseHll
    from ..state.base import sketch_from_bytes

    t = _gather_bucket_packs(group, num_groups, refs)
    if t is None:
        return 0, None
    order, bounds = _key_group_bounds(t, key_cols)
    n_keys = len(bounds) - 1
    order_arr = pa.array(order)
    hl = t.column("hashes").take(order_arr)
    hl = hl.combine_chunks() if isinstance(hl, pa.ChunkedArray) else hl
    import pyarrow.compute as pc
    lens = np.asarray(pc.fill_null(pc.list_value_length(hl), 0), dtype=np.int64)
    flat = np.asarray(hl.flatten(), dtype=np.uint64)
    key_of_row = np.repeat(np.arange(n_keys), np.diff(bounds))
    key_of_hash = np.repeat(key_of_row, lens)
    est = np.zeros(n_keys, dtype=np.float64)
    if len(flat):
        o2 = np.lexsort((flat, key_of_hash))
        kf, vf = key_of_hash[o2], flat[o2]
        uniq = np.empty(len(kf), dtype=bool)
        uniq[0] = True
        uniq[1:] = (kf[1:] != kf[:-1]) | (vf[1:] != vf[:-1])
        est = np.bincount(kf[uniq], minlength=n_keys).astype(np.float64)
    # slow path only for keys with dense blobs or cap overflow
    states = t.column("state").take(order_arr)
    states = states.combine_chunks() if isinstance(states, pa.ChunkedArray) else states
    has_state = np.asarray(pc.is_valid(states))
    special = np.unique(np.concatenate([
        key_of_row[has_state], np.nonzero(est > cap)[0]]))
    if special.size:
        starts = bounds[:-1]
        hash_offs = np.concatenate([[0], np.cumsum(lens)])
        for k in special:
            sk = SparseHll(p, cap)
            for r in range(starts[k], bounds[k + 1]):
                if has_state[r]:
                    sk.merge(sketch_from_bytes(bytes(states[r].as_py())))
                lo, hi = hash_offs[r], hash_offs[r + 1]
                if hi > lo:
                    sk.update_batch(flat[lo:hi])
            est[k] = sk.estimate()
    out = t.take(pa.array(order[bounds[:-1]])).select(key_cols)
    out = out.append_column(out_col, pa.array(est))
    return out.num_rows, out


def _packed_group_reduce(packed, key_cols: list[str], per_key: Callable, *,
                         num_buckets: int = 64, num_tasks: int | None = None,
                         empty_schema: pa.Schema | None = None,
                         reducer: Callable | None = None):
    """Reduce PACKED partials without Ray's sort-shuffle operator (whose
    launch cost, ~2-3 s measured, is independent of row count): the map
    stage's packed blocks are split into one object per reducer group
    (``split_refs_by_group``) and each reduce task reads ONLY its bucket
    range — true-shuffle network volume on a cluster.

    The reduce wave runs INSIDE Ray Data (``from_items`` of group ids →
    ``map_batches``), not as plain ``ray.remote`` tasks: plain-task
    workers get reaped whenever Data stages occupy the worker pool, so in
    a mixed workload every reduce wave would pay ~num_tasks simultaneous
    cold worker starts (measured 10-20 s at 32 tasks — 5-10× the actual
    reduce work). Data tasks reuse the warm Data pool.

    ``empty_schema`` is the output schema to use when no group produced
    rows (key columns + the per_key output columns); a zero-arg callable
    is evaluated only on the empty path (it may cost a partial
    execution for derived inputs)."""
    import ray
    import ray.data as rd
    from .exchange import split_refs_by_group, stream_arrow_refs

    def empty():
        if empty_schema is not None:
            schema = empty_schema() if callable(empty_schema) else empty_schema
            return rd.from_arrow(schema.empty_table())
        return packed.drop_columns(["pack", "__gbucket"])

    refs = stream_arrow_refs(packed)
    if not refs:
        return empty()
    if num_tasks is None:
        # one reduce task per CPU lane, floor 32 — on a cluster the wave
        # widens with the node count instead of pinning at one box's width
        num_tasks = max(32, int(ray.cluster_resources().get("CPU", 32)))
    num_groups = min(num_buckets, num_tasks)
    parts = split_refs_by_group(refs, "__gbucket", num_groups)
    if reducer is None:
        from functools import partial
        reducer = partial(_reduce_packed_blocks, key_cols, per_key)
    # one ref to the whole ref-table; workers pull only their group's slice
    parts_ref = ray.put(parts)

    def run_groups(batch: pa.Table):
        group_parts = ray.get(parts_ref)
        for g in batch.column("g").to_pylist():
            n, out = reducer(g, num_groups, list(group_parts[g]))
            if n > 0:
                yield out

    out = (rd.from_items([{"g": g} for g in range(num_groups)],
                         override_num_blocks=num_groups)
           .map_batches(run_groups, batch_format="pyarrow")
           .materialize())
    if out.count() == 0:
        return empty()
    return out


def _bucketed_group_reduce(partials, key_cols: list[str], per_key: Callable,
                           *, num_buckets: int = 64, state_type=None):
    """Reduce per-key partial-sketch rows without per-key task overhead:
    hash-bucket the keys, one ``map_groups`` task per bucket, and inside
    each bucket group by the 64-bit key hash vectorized — Python touches
    each key once (for the sketch merge), never each row, and each bucket
    emits ONE Arrow table instead of one per key."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = hash_keys64(batch, key_cols)
        b = (h % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("__gbucket", pa.array(b))

    def reduce_bucket(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gbucket"])
        order, bounds = _key_group_bounds(group, key_cols)
        states_sorted = group.column("state").combine_chunks().take(pa.array(order))
        first_rows = order[bounds[:-1]]
        out_cols: dict[str, list] = {}
        for i in range(len(bounds) - 1):
            states = states_sorted.slice(bounds[i], bounds[i + 1] - bounds[i]).to_pylist()
            for name, value in per_key(states).items():
                out_cols.setdefault(name, []).append(value)
        out = group.take(pa.array(first_rows)).select(key_cols)
        for name, values in out_cols.items():
            out = out.append_column(name, pa.array(values, type=state_type))
        return out

    from .buckets import packed_bucket_map_groups

    return packed_bucket_map_groups(
        partials.map_batches(add_bucket, batch_format="pyarrow"),
        None, reduce_bucket, num_buckets=num_buckets, pre_bucketed=True)


# --------------------------------------------------------------------------
# concrete sketch aggregations
# --------------------------------------------------------------------------

def hll_distinct(ds, cols: str | Sequence[str], *, key=None, p: int = 14,
                 salt: int | None = None, out_col: str = "distinct_est"):
    """Approximate COUNT(DISTINCT cols) — global (returns float) or per
    ``key`` (returns Dataset[key, out_col])."""
    from ..stages.sketch_stages import GroupedHllPartial

    cols = [cols] if isinstance(cols, str) else list(cols)
    make = lambda: HllSketch(p)
    update = lambda s, t: s.update_batch(hash_keys64(t, cols))
    if key is None:
        sk = sketch_aggregate_global(ds, make, update, input_cols=cols)
        return 0.0 if sk is None else sk.estimate()
    key_cols = [key] if isinstance(key, str) else list(key)
    finalize = lambda s: {out_col: float(s.estimate())}
    if not salt:
        # packed fast path: one shuffled row per (block, bucket) instead of
        # one per (key, block) — the exchange is row-count-bound in Ray
        from functools import partial

        in_cols = list(dict.fromkeys(key_cols + cols))
        ds = ds.select_columns(in_cols)
        packed = ds.map_batches(
            GroupedHllPartial(key_cols, cols, p=p, pack_buckets=64),
            batch_format="pyarrow")
        reducer = partial(_reduce_packed_hll, key_cols, out_col, p, 4096)

        def empty_schema():
            from .join import _to_arrow_schema
            in_schema = _to_arrow_schema(ds.schema())
            return pa.schema([in_schema.field(c) for c in key_cols]
                             + [pa.field(out_col, pa.float64())])

        return _packed_group_reduce(packed, key_cols, None,
                                    empty_schema=empty_schema,
                                    reducer=reducer)
    return sketch_aggregate_grouped(
        ds, key, make, update, finalize,
        input_cols=cols, salt=salt,
        partial_stage=GroupedHllPartial(key_cols, cols, p=p))


def approx_quantiles(ds, col: str, qs: Sequence[float], *, key=None,
                     method: str = "tdigest", delta: int = 200, k: int = 200,
                     alpha: float = 0.01, salt: int | None = None,
                     out_prefix: str = "q"):
    """Approximate quantiles of a numeric column via t-digest, KLL, or
    DDSketch. t-digest/KLL bound RANK error; ``method="ddsketch"``
    bounds relative VALUE error (each estimate within ``alpha·|true|``,
    uniformly across quantiles — the right sketch for latency /
    length-style metrics where tail values span decades).

    Global → np.ndarray aligned with ``qs``; grouped → Dataset with one
    ``{out_prefix}{int(100 q)}`` column per quantile.
    """
    qs = list(qs)
    if method == "tdigest":
        make = lambda: TDigest(delta)
    elif method == "kll":
        make = lambda: KllSketch(k)
    elif method == "ddsketch":
        from ..state.ddsketch import DDSketch
        make = lambda: DDSketch(alpha)
    else:
        raise ValueError("method must be 'tdigest', 'kll', or 'ddsketch'")

    def update(s, t: pa.Table):
        arr = t.column(col)
        vals = np.asarray(arr.cast(pa.float64()).drop_null())
        s.update_batch(vals)

    if key is None:
        sk = sketch_aggregate_global(ds, make, update, input_cols=[col])
        if sk is None:
            return np.full(len(qs), np.nan)
        return np.asarray(sk.quantile(np.asarray(qs, dtype=np.float64)))

    def finalize(s):
        vals = s.quantile(np.asarray(qs, dtype=np.float64))
        return {f"{out_prefix}{round(q * 100)}": float(v)
                for q, v in zip(qs, np.atleast_1d(vals))}

    return sketch_aggregate_grouped(ds, key, make, update, finalize,
                                    input_cols=[col], salt=salt)


def grouped_quantile_exact(ds, key, col: str, qs: Sequence[float], *,
                           interpolation: str = "linear",
                           out_prefix: str = "q"):
    """EXACT per-key quantiles — the precise sibling of the grouped
    t-digest/KLL path, for when the key cardinality is shuffle-sized but
    each key's values must be exact. One row per key with a
    ``{out_prefix}{round(q*100)}`` column per quantile.

    ``interpolation="linear"`` matches ``np.quantile`` /
    ``quantile_cont`` (float64 output); ``"disc"`` returns the actual
    element at index ``ceil(n·q) − 1`` — bit-identical to SQL
    ``quantile_disc`` and type-preserving, so results hash-match an
    oracle exactly. Nulls are ignored per key (all-null keys yield null).

    Scale shape: one packed bucketed exchange on ``key`` carrying only
    ``key + col``, then ONE lexsort per bucket; every quantile of every
    key is two vectorized gathers on the sorted column. Unlike the
    sketch path the raw values do shuffle — use the sketch path when a
    single key's values exceed a reducer."""
    from .buckets import packed_bucket_map_groups
    from .windows import _sorted_key_segments

    key = [key] if isinstance(key, str) else list(key)
    qs = [float(q) for q in qs]
    if not qs or any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError("qs must be non-empty with 0 <= q <= 1")
    if interpolation not in ("linear", "disc"):
        raise ValueError("interpolation must be 'linear' or 'disc'")
    names = [f"{out_prefix}{round(q * 100)}" for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(f"qs collide after rounding to {names}")

    def reduce_group(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        group = group.drop_columns(["__gbucket"]).select(key + [col])
        in_type = group.schema.field(col).type
        out_type = in_type if interpolation == "disc" else pa.float64()
        if group.num_rows == 0:
            t = group.select(key)
            for nm in names:
                t = t.append_column(nm, pa.array([], out_type))
            return t
        # nulls sort to the end of each key's run (arrow default), so a
        # segment's non-null values are its leading prefix
        g, starts, seg = _sorted_key_segments(
            group, key, [(col, "ascending")])
        n = g.num_rows
        arr = g.column(col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        valid = np.asarray(pc.is_valid(arr))
        cn = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
        bounds = np.append(starts, n)
        m = cn[bounds[1:]] - cn[bounds[:-1]]          # non-nulls per key
        out = g.take(pa.array(starts)).select(key)
        empty = m == 0
        safe_m = np.maximum(m, 1)
        if interpolation == "disc":
            for q, nm in zip(qs, names):
                idx = np.clip(np.ceil(safe_m * q).astype(np.int64) - 1,
                              0, safe_m - 1)
                vals = arr.take(pa.array(starts + idx))
                if empty.any():
                    vals = pc.if_else(pa.array(~empty), vals,
                                      pa.nulls(len(m), in_type))
                out = out.append_column(nm, vals)
            return out
        v = np.asarray(pc.fill_null(arr.cast(pa.float64()), np.nan))
        for q, nm in zip(qs, names):
            pos = q * (safe_m - 1)
            lo = np.floor(pos).astype(np.int64)
            hi = np.minimum(lo + 1, safe_m - 1)
            frac = pos - lo
            vals = v[starts + lo] * (1 - frac) + v[starts + hi] * frac
            out = out.append_column(
                nm, pa.array(vals, pa.float64(), mask=empty))
        return out

    return packed_bucket_map_groups(ds.select_columns(key + [col]), key,
                                    reduce_group)


def filter_by_quantile(ds, col: str, q: float, *, key=None,
                       keep: str = "ge", method: str = "kll",
                       delta: int = 200, k: int = 200,
                       max_keys: int = 4_000_000):
    """Keep rows on one side of the approximate ``q``-quantile of
    ``col`` — the "drop the bottom X% by quality score" curation step.
    With ``key`` the threshold is computed PER KEY GROUP ("keep the top
    20% per source/domain"), otherwise it is a single global cut.

    Two streaming passes: a column-pruned sketch pass (KLL / t-digest
    partials, no shuffle of rows) computes the threshold(s), then a
    vectorized filter pass streams the full rows. The upstream lineage
    executes twice, so feed it a read-from-storage Dataset, not an
    expensive unmaterialized pipeline. Null values never survive the cut.

    ``keep``: ``'ge' | 'gt' | 'le' | 'lt'`` — the comparison rows must
    satisfy against their threshold. Returns ``(filtered_ds, threshold)``
    where threshold is a float (global) or a ``pa.Table`` of key columns
    + ``threshold`` (grouped). Thresholds carry the sketch's rank error
    (bounds pinned in ``tests/test_aggregate.py``), so the kept fraction
    is approximately ``1 - q`` (for ``'ge'``), not exactly.

    Grouped scale contract: one threshold row per distinct key must fit
    on the driver and broadcast (``ray.put`` once, read per task) —
    guarded at ``max_keys``. Lookup in the filter pass is a vectorized
    searchsorted on the canonical 64-bit key hash.
    """
    import operator

    import pyarrow.compute as pc

    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    ops = {"ge": pc.greater_equal, "gt": pc.greater,
           "le": pc.less_equal, "lt": pc.less}
    if keep not in ops:
        raise ValueError(f"keep must be one of {sorted(ops)}, got {keep!r}")

    if key is None:
        op = ops[keep]
        thr = float(approx_quantiles(ds, col, [q], method=method,
                                     delta=delta, k=k)[0])
        if np.isnan(thr):  # empty input: nothing can pass the cut
            return ds.limit(0), thr

        def flt(t: pa.Table) -> pa.Table:
            mask = op(t.column(col).cast(pa.float64()), thr)
            return t.filter(mask)  # null mask entries drop

        return ds.map_batches(flt, batch_format="pyarrow"), thr

    # grouped: per-key thresholds, broadcast once, hash-lookup per batch
    import ray

    key_cols = [key] if isinstance(key, str) else list(key)
    qcol = f"q{round(q * 100)}"
    grouped = approx_quantiles(ds, col, [q], key=key, method=method,
                               delta=delta, k=k)
    blocks = ray.get(grouped.to_arrow_refs())
    if not blocks:
        return ds.limit(0), pa.table(
            {c: [] for c in key_cols + ["threshold"]})
    thr_tbl = pa.concat_tables(blocks, promote_options="default")
    if thr_tbl.num_rows > max_keys:
        raise ValueError(
            f"{thr_tbl.num_rows} distinct keys exceed max_keys={max_keys}; "
            "a per-key threshold table must be broadcastable")
    thr_tbl = (thr_tbl.select(key_cols + [qcol])
               .rename_columns(key_cols + ["threshold"])
               .combine_chunks())
    if thr_tbl.num_rows == 0:
        return ds.limit(0), thr_tbl

    hashes = hash_keys64(thr_tbl, key_cols)
    order = np.argsort(hashes, kind="stable")
    ref = ray.put((hashes[order],
                   thr_tbl.column("threshold").to_numpy(
                       zero_copy_only=False)[order]))
    np_op = {"ge": operator.ge, "gt": operator.gt,
             "le": operator.le, "lt": operator.lt}[keep]

    def flt_grouped(t: pa.Table) -> pa.Table:
        sorted_h, sorted_thr = ray.get(ref)
        h = hash_keys64(t, key_cols)
        pos = np.searchsorted(sorted_h, h)
        pos_c = np.minimum(pos, len(sorted_h) - 1)
        found = sorted_h[pos_c] == h
        vals = np.asarray(t.column(col).cast(pa.float64()).to_numpy(
            zero_copy_only=False), dtype=np.float64)
        with np.errstate(invalid="ignore"):
            mask = found & np_op(vals, sorted_thr[pos_c])  # NaN → False
        return t.filter(pa.array(mask))

    return ds.map_batches(flt_grouped, batch_format="pyarrow"), thr_tbl


def bucketize_by_quantile(ds, col: str, n_buckets: int = 4, *,
                          method: str = "kll", delta: int = 200,
                          k: int = 200, out_col: str = "bucket"):
    """Append an int32 quantile-bucket index (0 .. n_buckets-1) per row —
    equal-frequency binning for curriculum ordering / stratified mixing.

    One column-pruned sketch pass computes the n_buckets-1 interior
    boundaries, then a vectorized ``searchsorted`` pass labels rows;
    boundaries carry the sketch's rank error so bucket populations are
    approximately equal, not exactly. Null values get bucket null.
    Returns ``(labeled_ds, boundaries)`` (boundaries as float64 array).
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = np.asarray(approx_quantiles(ds, col, qs, method=method,
                                         delta=delta, k=k),
                        dtype=np.float64)

    def label(t: pa.Table) -> pa.Table:
        vals = np.asarray(t.column(col).cast(pa.float64()).to_numpy(
            zero_copy_only=False), dtype=np.float64)
        idx = np.searchsorted(bounds, vals, side="right").astype(np.int32)
        mask = np.isnan(vals)
        return t.append_column(
            out_col, pa.array(idx, type=pa.int32(), mask=mask))

    return ds.map_batches(label, batch_format="pyarrow"), bounds


def grouped_vector_mean(ds, vec_col: str, key: str | Sequence[str], *,
                        out_col: str = "centroid",
                        count_col: str = "n"):
    """Per-key mean of an embedding column (class prototypes / topic
    centroids / IVF seeding). Returns Dataset[keys…, out_col
    (list<double>, all length d), count_col].

    Scale shape: each block collapses to ONE partial row per in-block
    key — (key, float64 sum-vector blob, count) via lexsort +
    ``np.add.reduceat`` — so the packed exchange carries per-key
    partials, never embedding rows. The reduce is bucket-union-invariant
    (re-segments by the real key hash). Mean of float64 partial sums is
    reduction-order-sensitive in the last bits, hence no SQL-hash oracle
    (rows-only; numpy parity pinned in tests)."""
    from ..stages.ann_stages import embeddings_to_matrix
    from .buckets import packed_bucket_map_groups

    key_cols = [key] if isinstance(key, str) else list(key)

    def _segment(tbl: pa.Table):
        h = hash_keys64(tbl, key_cols)
        order = np.argsort(h, kind="stable")
        hs = h[order]
        n = len(hs)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = hs[1:] != hs[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        return order, starts, counts

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.select(key_cols + [vec_col])
        if batch.num_rows == 0:
            return pa.table(
                {**{c: batch.column(c) for c in key_cols},
                 "__vsum": pa.array([], type=pa.large_binary()),
                 "__vcnt": pa.array([], type=pa.int64())})
        M = embeddings_to_matrix(batch.column(vec_col)).astype(np.float64)
        order, starts, counts = _segment(batch)
        sums = np.add.reduceat(M[order], starts, axis=0)
        rep = batch.take(pa.array(order[starts]))
        return pa.table(
            {**{c: rep.column(c) for c in key_cols},
             "__vsum": pa.array([s.tobytes() for s in sums],
                                type=pa.large_binary()),
             "__vcnt": pa.array(counts, type=pa.int64())})

    def reduce_group(group: pa.Table) -> pa.Table:
        sub = group.drop_columns(["__gbucket"])
        d_schema = pa.float64()
        if sub.num_rows == 0:
            return pa.table(
                {**{c: sub.column(c) for c in key_cols},
                 out_col: pa.array([], type=pa.list_(d_schema)),
                 count_col: pa.array([], type=pa.int64())})
        blobs = sub.column("__vsum").to_pylist()
        S = np.stack([np.frombuffer(b, dtype=np.float64) for b in blobs])
        cnt = sub.column("__vcnt").to_numpy(zero_copy_only=False)
        order, starts, _ = _segment(sub)
        sums = np.add.reduceat(S[order], starts, axis=0)
        counts = np.add.reduceat(cnt[order], starts)
        rep = sub.take(pa.array(order[starts]))
        means = sums / counts[:, None]
        n_keys, d = means.shape
        # plain list<double> (not fixed_size_list) so every reduce task —
        # including the all-empty schema probe, where d is unknowable —
        # emits the same Arrow type
        offs = pa.array(np.arange(n_keys + 1, dtype=np.int32) * d)
        cent = pa.ListArray.from_arrays(
            offs, pa.array(means.reshape(-1), type=d_schema))
        return pa.table(
            {**{c: rep.column(c) for c in key_cols},
             out_col: cent,
             count_col: pa.array(counts, type=pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return packed_bucket_map_groups(partials, key_cols, reduce_group)


def cms_sketch(ds, cols: str | Sequence[str], *, depth: int = 5,
               width: int = 4096) -> CountMinSketch:
    """Global count–min sketch over the given key columns."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    return sketch_aggregate_global(
        ds, lambda: CountMinSketch(depth, width),
        lambda s, t: s.update_batch(hash_keys64(t, cols)),
        input_cols=cols) or CountMinSketch(depth, width)


def estimate_join_size(ds_left, ds_right, on, *, depth: int = 5,
                       width: int = 4096) -> dict:
    """CMS inner-product estimate of the equi-join output size
    ``|L ⋈ R|`` — Cormode–Muthukrishnan 2005 §4.2, the sketch-native
    answer to "how big is this join?" before paying for it. Builds one
    CMS per side (per-block partials, tree merge — two column-pruned
    streaming passes, no shuffle) over the canonical 64-bit key hash,
    then takes ``min_r ⟨row_r(L), row_r(R)⟩``.

    Never undercounts: ``true ≤ est ≤ true + ε·N_L·N_R`` w.p. ``1 − δ``
    with ``ε = e/width``, ``δ = e^−depth``. ``on`` accepts the join
    forms ``resolve_on`` does (str / list / dict {left: right}).
    Returns ``{"rows_estimate", "epsilon", "delta", "bound_slack"}``
    where ``bound_slack = ε·N_L·N_R`` is the published additive bound.
    """
    from .asof import _schema_of
    from .plan import resolve_on

    spec = resolve_on(_schema_of(ds_left).names, _schema_of(ds_right).names,
                      on)
    sl = cms_sketch(ds_left, spec.x_cols, depth=depth, width=width)
    sr = cms_sketch(ds_right, spec.y_cols, depth=depth, width=width)
    return {"rows_estimate": sl.inner_product(sr),
            "epsilon": sl.epsilon, "delta": sl.delta,
            "bound_slack": sl.epsilon * sl.total * sr.total}


def ams_f2(ds, cols: str | Sequence[str], *, depth: int = 7,
           width: int = 8192) -> dict:
    """AMS (tug-of-war) estimate of the second frequency moment
    ``F2 = Σ_k f_k²`` of the given key columns — the stream's SELF-join
    size and the canonical skew statistic, the query a planner asks
    before choosing a join/salting strategy. One column-pruned streaming
    pass (per-block partials, tree merge), no shuffle; the linear sketch
    makes the merged counters bit-identical to a single-pass build under
    any partitioning, so the estimate itself is partition-invariant.

    Returns ``{"f2_estimate", "n_rows", "epsilon",
    "avg_multiplicity": F2/n (mean rows matched per row in the
    self-join), "skew": F2/n² ∈ [1/n_distinct, 1]}``; the published
    ``|est − F2| ≤ ε·F2`` bound is pinned in tests."""
    from ..state.ams import AmsSketch

    cols = [cols] if isinstance(cols, str) else list(cols)
    s = sketch_aggregate_global(
        ds, lambda: AmsSketch(depth, width),
        lambda sk, t: sk.update_batch(hash_keys64(t, cols)),
        input_cols=cols) or AmsSketch(depth, width)
    f2 = s.estimate_f2()
    n = s.total
    return {"f2_estimate": f2, "n_rows": n, "epsilon": s.epsilon,
            "avg_multiplicity": (f2 / n) if n else 0.0,
            "skew": (f2 / (n * n)) if n else 0.0}


def cms_heavy_hitters(ds, cols: str | Sequence[str], topk: int = 10, *,
                      depth: int = 5, width: int = 4096,
                      candidates_per_block: int | None = None,
                      out_col: str = "est_count") -> pa.Table:
    """Top-k heavy hitters with CMS-estimated counts, single read pass.

    Each block emits one partial row carrying (a) its CMS partial and
    (b) its local top-m candidate values (serialized Arrow IPC). The
    merged CMS then scores the union of candidates — a key in the global
    top-k must be a local candidate in at least one block.
    """
    import ray

    cols = [cols] if isinstance(cols, str) else list(cols)
    m = candidates_per_block or max(4 * topk, 64)

    def partial(batch: pa.Table) -> pa.Table:
        h = hash_keys64(batch, cols)
        s = CountMinSketch(depth, width)
        s.update_batch(h)
        uh, inv, counts = np.unique(h, return_inverse=True, return_counts=True)
        top = np.argsort(counts)[::-1][:m]
        first_idx = np.zeros(len(uh), dtype=np.int64)
        first_idx[inv[::-1]] = np.arange(len(h) - 1, -1, -1)
        cand = batch.take(pa.array(first_idx[top])).select(cols)
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, cand.schema) as w:
            w.write_table(cand)
        return pa.table({
            "state": pa.array([s.to_bytes()], type=pa.large_binary()),
            "cands": pa.array([sink.getvalue().to_pybytes()], type=pa.large_binary()),
        })

    rows = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow").take_all()
    if not rows:
        return pa.table({c: [] for c in cols} | {out_col: []})
    merged = merge_all(sketch_from_bytes(bytes(r["state"])) for r in rows)
    cands = pa.concat_tables([
        pa.ipc.open_stream(pa.BufferReader(bytes(r["cands"]))).read_all()
        for r in rows
    ])
    from .buckets import group_agg
    cands = group_agg(cands, cols, [])  # dedupe candidate values (null-safe)
    est = merged.query_batch(hash_keys64(cands, cols))
    order = np.argsort(est, kind="stable")[::-1][:topk]
    out = cands.take(pa.array(order))
    return out.append_column(out_col, pa.array(est[order]))


# --------------------------------------------------------------------------
# exact distributed aggregates (pre-aggregated shuffles)
# --------------------------------------------------------------------------

def mg_heavy_hitters(ds, cols: str | Sequence[str], topk: int = 10, *,
                     k: int = 256, count_col: str = "est_count"):
    """Deterministic heavy hitters via Misra-Gries partials: lower-bound
    counts (true - N/(k+1) <= est <= true), guaranteed to include every
    item with frequency > N/(k+1). The randomized counterpart is
    cms_heavy_hitters (upper bounds); running both brackets the truth."""
    from ..state.misra_gries import MisraGries

    cols = [cols] if isinstance(cols, str) else list(cols)
    make = lambda: MisraGries(k)
    update = lambda s, t: s.update_batch(hash_keys64(t, cols), t.select(cols))
    sk = sketch_aggregate_global(ds, make, update, input_cols=cols)
    if sk is None:
        return None
    t = sk.items_table(count_col)
    return t.slice(0, topk) if t is not None else None


def theta_sketch(ds, cols: str | Sequence[str], *, k: int = 4096):
    """Global theta (KMV) sketch over the key columns — distinct counting
    with set-operation estimates across independently built sketches."""
    from ..state.theta import ThetaSketch

    cols = [cols] if isinstance(cols, str) else list(cols)
    sk = sketch_aggregate_global(
        ds, lambda: ThetaSketch(k),
        lambda s, t: s.update_batch(hash_keys64(t, cols)),
        input_cols=cols)
    return sk or ThetaSketch(k)


def theta_set_estimates(ds_a, ds_b, cols: str | Sequence[str], *,
                        k: int = 4096) -> dict[str, float]:
    """Distinct |A|, |B|, |A∪B|, |A∩B|, |A∖B|, Jaccard — from two
    independent single-pass sketches (no join, no shuffle)."""
    a = theta_sketch(ds_a, cols, k=k)
    b = theta_sketch(ds_b, cols, k=k)
    return {
        "distinct_a": a.estimate(),
        "distinct_b": b.estimate(),
        "union": a.union_estimate(b),
        "intersection": a.intersection_estimate(b),
        "difference_a_minus_b": a.difference_estimate(b),
        "jaccard": a.jaccard_estimate(b),
    }


def theta_set_estimates_grouped(ds_a, ds_b, cols: str | Sequence[str],
                                key: str | Sequence[str], *, k: int = 4096):
    """PER-KEY distinct |A|, |B|, |A∪B|, |A∩B|, Jaccard between two
    datasets, from independently built per-key theta partials — rows
    never shuffle, only (block, key) sketch blobs do (verdict r3 #8).
    Keys present on one side only get the empty-sketch semantics
    (distinct 0 for the absent side). Estimates are EXACT whenever a
    key's distinct count stays below k (theta = 1 ⇒ the sketch is the
    full set), so a SQL oracle applies at test scale. Returns
    Dataset[key…, distinct_a, distinct_b, n_union, n_intersection,
    jaccard]."""
    from ..state.theta import ThetaSketch
    from ..stages.sketch_stages import GroupedSketchPartial

    key_cols = [key] if isinstance(key, str) else list(key)
    cols = [cols] if isinstance(cols, str) else list(cols)
    make = lambda: ThetaSketch(k)
    update = lambda s, t: s.update_batch(hash_keys64(t, cols))
    stage = GroupedSketchPartial(key_cols, make, update)
    in_cols = list(dict.fromkeys(key_cols + cols))

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column("__tside", pa.array(
                np.full(b.num_rows, side, dtype=np.int8)))

        return fn

    partials = (ds_a.select_columns(in_cols)
                .map_batches(stage, batch_format="pyarrow")
                .map_batches(tag(0), batch_format="pyarrow")
                .union(ds_b.select_columns(in_cols)
                       .map_batches(stage, batch_format="pyarrow")
                       .map_batches(tag(1), batch_format="pyarrow")))

    out_fields = ["distinct_a", "distinct_b", "n_union", "n_intersection",
                  "jaccard"]

    def reduce_group(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gbucket"])
        if group.num_rows == 0:
            t = group.select(key_cols)
            for f in out_fields:
                t = t.append_column(f, pa.array([], type=pa.float64()))
            return t
        order, bounds = _key_group_bounds(group, key_cols)
        states = group.column("state").combine_chunks().take(pa.array(order))
        sides = np.asarray(group.column("__tside"))[order]
        vals: dict[str, list] = {f: [] for f in out_fields}
        for i in range(len(bounds) - 1):
            a, b = ThetaSketch(k), ThetaSketch(k)
            for r in range(int(bounds[i]), int(bounds[i + 1])):
                sk = sketch_from_bytes(bytes(states[r].as_py()))
                (a if sides[r] == 0 else b).merge(sk)
            vals["distinct_a"].append(a.estimate())
            vals["distinct_b"].append(b.estimate())
            vals["n_union"].append(a.union_estimate(b))
            vals["n_intersection"].append(a.intersection_estimate(b))
            vals["jaccard"].append(a.jaccard_estimate(b))
        out = group.take(pa.array(order[bounds[:-1]])).select(key_cols)
        for f in out_fields:
            out = out.append_column(f, pa.array(vals[f], type=pa.float64()))
        return out

    from .buckets import packed_bucket_map_groups

    return packed_bucket_map_groups(partials, key_cols, reduce_group)


def topk_per_key(ds, key: str | Sequence[str], cols: str | Sequence[str],
                 k: int, *, count_col: str = "n", rank_col: str = "rank"):
    """Exact top-k values by frequency within each key group (e.g. top
    tools per conversation). Per-block pre-counts → one grouped sum →
    per-key top-k inside a bucketed reduce. Deterministic tie-break:
    count desc, then value asc — matching SQL
    ``row_number() OVER (PARTITION BY key ORDER BY n DESC, value)``."""
    key = [key] if isinstance(key, str) else list(key)
    cols = [cols] if isinstance(cols, str) else list(cols)
    all_cols = key + cols

    # integer counts are order-independent → the packed grouped
    # aggregate applies (per-block pre-count + packed sum, no
    # sort-shuffle floor)
    summed = grouped_assoc_agg(ds.select_columns(all_cols), all_cols,
                               count_col=count_col)

    def per_key_topk(group: pa.Table) -> pa.Table:
        # vectorized rank (the sessionize idiom): one C++ sort, a
        # boundary mask on the 128-bit key-hash pair, positional rank —
        # no pandas round-trip
        import pyarrow.compute as pc

        from ..functions.keys import hash_keys64_pair

        if group.num_rows == 0:
            return (group.drop_columns(["__gbucket"])
                         .append_column(rank_col,
                                        pa.array([], type=pa.int64())))
        sort_keys = ([(c, "ascending") for c in key]
                     + [(count_col, "descending")]
                     + [(c, "ascending") for c in cols])
        idx = np.asarray(pc.sort_indices(group, sort_keys=sort_keys))
        g = group.take(pa.array(idx))
        h1, h2 = hash_keys64_pair(g, key)
        n = len(idx)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        starts = np.nonzero(new)[0]
        rank = (np.arange(n)
                - np.repeat(starts, np.diff(np.append(starts, n))))
        keep = rank < k
        out = g.filter(pa.array(keep)).drop_columns(["__gbucket"])
        return out.append_column(
            rank_col, pa.array((rank[keep] + 1).astype(np.int64)))

    from .buckets import packed_bucket_map_groups

    return packed_bucket_map_groups(summed, key, per_key_topk)


def topk_rows_per_key(ds, key: str | Sequence[str], order_by,
                      k: int | None, *, rank_col: str = "rank"):
    """Top-k ROWS per key under an arbitrary sort order — the SQL
    ``row_number() OVER (PARTITION BY key ORDER BY ...) <= k`` filter
    (``topk_per_key`` is the frequency special case; this ranks by any
    existing columns, e.g. a score). ``k=None`` keeps EVERY row — the
    plain ``row_number()`` window (the per-block prune is skipped: with
    nothing to drop it would only re-sort each block). ``order_by`` is
    a list of ``(col, 'ascending'|'descending')`` pairs and must be a
    total order within each key (include a tiebreaker column) for
    deterministic output.

    Scale shape: top-k is a mergeable idempotent reduction
    (``topk(topk(A) ∪ topk(B)) == topk(A ∪ B)``), so each block first
    prunes itself to ≤ k rows per key it contains — only those survive
    into the packed bucketed exchange — and the per-bucket reduce
    re-ranks and emits the 1-based ``rank_col``. The reduce is
    bucket-union-invariant: it re-segments by the real key hash, never
    by bucket."""
    import pyarrow.compute as pc

    from ..functions.keys import hash_keys64_pair

    key = [key] if isinstance(key, str) else list(key)
    order_by = list(order_by)
    for _c, d in order_by:
        if d not in ("ascending", "descending"):
            raise ValueError(f"order_by direction must be ascending/"
                             f"descending, got {d!r}")

    def ranks(table: pa.Table) -> tuple[pa.Table, np.ndarray]:
        sort_keys = [(c, "ascending") for c in key] + order_by
        idx = np.asarray(pc.sort_indices(table, sort_keys=sort_keys))
        g = table.take(pa.array(idx))
        h1, h2 = hash_keys64_pair(g, key)
        n = len(idx)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        starts = np.nonzero(new)[0]
        rank = (np.arange(n)
                - np.repeat(starts, np.diff(np.append(starts, n))))
        return g, rank

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        g, rank = ranks(batch)
        return g.filter(pa.array(rank < k))

    def reduce_group(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gbucket"])
        if group.num_rows == 0:
            return group.append_column(rank_col,
                                       pa.array([], type=pa.int64()))
        g, rank = ranks(group)
        if k is None:
            return g.append_column(
                rank_col, pa.array((rank + 1).astype(np.int64)))
        keep = rank < k
        return g.filter(pa.array(keep)).append_column(
            rank_col, pa.array((rank[keep] + 1).astype(np.int64)))

    from .buckets import packed_bucket_map_groups

    pruned = (ds if k is None
              else ds.map_batches(partial, batch_format="pyarrow"))
    return packed_bucket_map_groups(pruned, key, reduce_group)


def reservoir_sample(ds, k: int, id_cols: str | Sequence[str], *,
                     key: str | Sequence[str] | None = None,
                     weight_col: str | None = None,
                     seed: int = 0x5A5A):
    """Deterministic uniform sample of k whole rows — bottom-k priority
    sampling as a mergeable UDAF (same sample for any partitioning).
    ``id_cols`` must uniquely identify rows (the priority key).
    ``weight_col`` switches to WEIGHTED sampling without replacement
    (Efraimidis–Spirakis A-ES: P(row enters) scales with its weight;
    null/zero/negative weights never sampled) — the data-mixing
    primitive for importance-weighted corpus subsets.

    Global (``key=None``): returns a pa.Table of ≤ k rows (None when
    empty). Grouped: returns a Dataset of the sampled ROWS, ≤ k per
    distinct ``key`` (verdict r3 #8) — per-block per-key partial
    reservoirs shuffle, never the raw rows; the per-key sample is
    identical under any partitioning (the bottom-k merge law)."""
    from ..state.reservoir import ReservoirSample, WeightedReservoirSample

    id_cols = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    if weight_col is None:
        make = lambda: ReservoirSample(k, seed)
        update = lambda s, t: s.update_batch(hash_keys64(t, id_cols), t)
    else:
        import pyarrow.compute as pc

        make = lambda: WeightedReservoirSample(k, seed)
        update = lambda s, t: s.update_batch(
            hash_keys64(t, id_cols), t,
            np.asarray(pc.fill_null(
                t.column(weight_col).cast(pa.float64()), np.nan)))
    if key is None:
        sk = sketch_aggregate_global(ds, make, update)
        return None if sk is None else sk.sample_table()

    from ..stages.sketch_stages import GroupedSketchPartial

    key_cols = [key] if isinstance(key, str) else list(key)
    partials = ds.map_batches(GroupedSketchPartial(key_cols, make, update),
                              batch_format="pyarrow")

    def reduce_group(group: pa.Table) -> pa.Table:
        order, bounds = _key_group_bounds(group, key_cols)
        states = group.column("state").combine_chunks().take(pa.array(order))
        tables = []
        for i in range(len(bounds) - 1):
            sk = merge_all(
                sketch_from_bytes(bytes(states[r].as_py()))
                for r in range(int(bounds[i]), int(bounds[i + 1])))
            t = sk.sample_table()
            if t is not None:
                tables.append(t)
        return pa.concat_tables(tables)

    from .buckets import packed_bucket_map_groups

    return packed_bucket_map_groups(partials, key_cols, reduce_group)


def distinct_exact(ds, cols: str | Sequence[str]) -> int:
    """Exact COUNT(DISTINCT cols): per-block dedupe (map_batches) → shuffle
    only the block-distinct rows, hash-bucketed → ONE pyarrow hash
    aggregate per bucket (C++ group-by over the real values — no
    per-distinct-value Python dispatch, no hash-collision caveat) →
    sum of per-bucket distinct counts."""
    from .buckets import packed_bucket_map_groups

    cols = [cols] if isinstance(cols, str) else list(cols)

    from .buckets import group_agg

    def dedupe(batch: pa.Table) -> pa.Table:
        return group_agg(batch, cols, [])

    def count_bucket(group: pa.Table) -> pa.Table:
        n = group_agg(group.drop_columns(["__gbucket"]), cols, []).num_rows
        return pa.table({"__n": pa.array([n], type=pa.int64())})

    deduped = ds.select_columns(cols).map_batches(dedupe, batch_format="pyarrow")
    counts = packed_bucket_map_groups(deduped, cols, count_bucket)
    return int(counts.sum("__n") or 0)


def grouped_assoc_agg(ds, keys: Sequence[str],
                      aggs: dict[str, tuple[str, str]] | None = None, *,
                      count_col: str | None = None):
    """Grouped MIN/MAX/COUNT with per-block pre-aggregation and a packed
    exchange (no sort-shuffle launch floor). Only order-independent
    aggregates are offered — min/max over any orderable type and integer
    row counts are exact under ANY reduction order, so swapping the
    shuffle machinery cannot perturb results (float SUM stays on
    ``grouped_sums``, whose accumulation order the oracle contract
    pins). ``aggs`` maps input column → ("min" | "max", out_alias).
    Returns Dataset[keys…, aliases…, count_col?]."""
    keys = list(keys)
    aggs = aggs or {}
    for c, (fn, _alias) in aggs.items():
        if fn not in ("min", "max"):
            raise ValueError(f"grouped_assoc_agg supports min/max, got {fn!r}"
                             f" for {c!r}")
    aliases = [alias for _fn, alias in aggs.values()]

    from .buckets import group_agg, packed_bucket_map_groups

    def partial(batch: pa.Table) -> pa.Table:
        specs = [(c, fn) for c, (fn, _a) in aggs.items()]
        if count_col:
            specs.append(([], "count_all"))
        out = group_agg(batch.select(keys + list(aggs)), keys, specs)
        names = keys + aliases + (["__pc"] if count_col else [])
        return out.rename_columns(names)

    def reduce_group(group: pa.Table) -> pa.Table:
        sub = group.drop_columns(["__gbucket"])
        specs = [(alias, fn) for (fn, alias) in aggs.values()]
        if count_col:
            specs.append(("__pc", "sum"))
        out = group_agg(sub, keys, specs)
        names = keys + aliases + ([count_col] if count_col else [])
        return out.rename_columns(names)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return packed_bucket_map_groups(partials, keys, reduce_group)


def grouped_sums(ds, keys: Sequence[str], sum_cols: dict[str, str], *,
                 count_col: str | None = None):
    """Grouped SUM/COUNT with per-block pre-aggregation: each block first
    collapses to one row per in-block key (pyarrow hash aggregate), then the
    shuffle carries only those partials into the final ``groupby().sum()``.
    ``sum_cols`` maps input column → output alias. Returns a Dataset.

    Count-only calls (no float accumulation, so no order sensitivity)
    route through the packed grouped aggregate; float sums keep Ray's
    groupby so the oracle-pinned accumulation order is untouched."""
    from ray.data.aggregate import Sum

    keys = list(keys)
    in_cols = list(sum_cols)
    if not in_cols and count_col:
        return grouped_assoc_agg(ds.select_columns(keys), keys,
                                 count_col=count_col)

    def partial(batch: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in in_cols]
        if count_col:
            aggs.append(([], "count_all"))
        out = batch.select(keys + in_cols).group_by(keys).aggregate(aggs)
        names = keys + [f"__p_{c}" for c in in_cols]
        if count_col:
            names.append("__p_count")
        return out.rename_columns(names)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum(f"__p_{c}", alias_name=alias) for c, alias in sum_cols.items()]
    if count_col:
        aggs.append(Sum("__p_count", alias_name=count_col))
    return partials.groupby(keys).aggregate(*aggs)


def pivot_counts(ds, key, cat_col: str, categories: Sequence | None = None,
                 *, value_col: str | None = None, prefix: str = ""):
    """Grouped pivot on a LOW-CARDINALITY categorical column — the
    feature-engineering ``count(*) FILTER (WHERE cat = c)`` (or
    ``sum(value) FILTER``) wide table, one output column per category.
    ``categories=None`` discovers them with an exact distinct pass
    first (each category becomes a COLUMN — keep it small; pass the
    list explicitly on hot paths to skip the extra pass).

    Scale shape: one vectorized indicator-column pass per block, then
    the grouped-sums partial shuffle (one row per in-block key) — rows
    never shuffle. Unseen categories yield 0 (count) / null-free 0.0
    (sum), matching the SQL FILTER aggregate over the same rows."""
    import pyarrow.compute as pc

    key = [key] if isinstance(key, str) else list(key)
    if categories is None:
        # per-block dedupe, driver union — bounded by blocks × #cats,
        # no sort-shuffle launch floor
        parts = (ds.select_columns([cat_col])
                 .map_batches(lambda b: b.group_by([cat_col]).aggregate([]),
                              batch_format="pyarrow")
                 .take_all())
        categories = sorted({r[cat_col] for r in parts
                             if r[cat_col] is not None})
    categories = list(categories)
    if not categories:
        raise ValueError("categories must be non-empty")
    names = [f"{prefix}{c}" for c in categories]
    if len(set(names)) != len(names):
        raise ValueError("category names collide after prefixing")
    in_cols = [cat_col] + ([value_col] if value_col else [])

    def indicators(batch: pa.Table) -> pa.Table:
        cat = batch.column(cat_col)
        cat = cat.combine_chunks() if isinstance(cat, pa.ChunkedArray) else cat
        if value_col:
            val = batch.column(value_col)
            if not pa.types.is_integer(val.type):
                val = val.cast(pa.float64())
            zero = pa.scalar(0, val.type) if pa.types.is_integer(val.type) \
                else pa.scalar(0.0, pa.float64())
        out = batch.select(key)
        for c, nm in zip(categories, names):
            hit = pc.equal(cat, pa.scalar(c, cat.type))
            hit = pc.fill_null(hit, False)            # null cat matches none
            if value_col:
                col = pc.if_else(hit, pc.fill_null(val, zero), zero)
            else:
                col = hit.cast(pa.int64())
            out = out.append_column(nm, col)
        return out

    wide = ds.select_columns(key + in_cols).map_batches(
        indicators, batch_format="pyarrow")
    return grouped_sums(wide, key, {nm: nm for nm in names})


def grouping_sets_agg(ds, keys: Sequence[str],
                      sets: Sequence[Sequence[str]],
                      sum_cols: dict[str, str] | None = None,
                      *, count_col: str | None = "n",
                      num_buckets: int = 64):
    """SQL ``GROUP BY GROUPING SETS ((…), …)``: one output row per
    group per listed set, with the set's absent key columns null —
    exactly the SQL result, including its real-null-vs-grouped-out
    ambiguity and one duplicate row block per DUPLICATED set.
    ``sum_cols`` maps input column → output alias; ``rollup_agg`` /
    ``cube_agg`` are the prefix / power-set specializations.

    Scale shape: ONE pass over the rows. Each block aggregates once
    over the full key tuple, derives every set's in-block partial from
    that (re-aggregation over partial rows, not raw rows), tags each
    partial with its set id and a hash bucket over the set's LIVE keys,
    and a single packed exchange reduces all sets together — raw rows
    never shuffle, and each all-keys-grouped-out set carries one row
    per block.

    COUNT and integer SUMs are exact under any reduction order; float
    sums are accepted but accumulate in exchange order (same caveat as
    any distributed float sum — route through ``grouped_sums`` per set
    if the oracle pins accumulation order)."""
    from .buckets import group_agg, hash_raw64, packed_bucket_map_groups

    keys = list(keys)
    if not keys:
        raise ValueError("grouping_sets_agg needs at least one key")
    sets = [list(s) for s in sets]
    if not sets:
        raise ValueError("grouping_sets_agg needs at least one set")
    for s in sets:
        if len(set(s)) != len(s) or not set(s) <= set(keys):
            raise ValueError(f"grouping set {s!r} must be a subset of "
                             f"{keys!r} without duplicates")
    sum_cols = dict(sum_cols or {})
    if not sum_cols and not count_col:
        raise ValueError("nothing to aggregate")
    in_cols = list(sum_cols)
    aliases = list(sum_cols.values())
    _SET = np.uint64(0x9E3779B97F4A7C15)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key_types = {k: batch.schema.field(k).type for k in keys}
        specs = [(c, "sum") for c in in_cols]
        if count_col:
            specs.append(([], "count_all"))
        base = (group_agg(batch.select(keys + in_cols), keys, specs)
                .rename_columns(keys + aliases
                                + (["__pc"] if count_col else [])))
        respec = [(a, "sum") for a in aliases]
        if count_col:
            respec.append(("__pc", "sum"))
        out: list[pa.Table] = []
        for si, live in enumerate(sets):
            if live == keys:
                cur = base
            elif live:
                cur = (group_agg(base, live, respec)
                       .rename_columns(live + aliases
                                       + (["__pc"] if count_col else [])))
            else:
                flat = [pc.sum(base.column(a)) for a in aliases]
                cols = {a: pa.array([s.as_py()], base.schema.field(a).type)
                        for a, s in zip(aliases, flat)}
                if count_col:
                    cols["__pc"] = pa.array(
                        [pc.sum(base.column("__pc")).as_py() or 0],
                        pa.int64())
                cur = pa.table(cols)
            n = cur.num_rows
            h = (hash_raw64(cur, live) if live
                 else np.zeros(n, dtype=np.uint64))
            with np.errstate(over="ignore"):  # wraparound intended
                h = h + _SET * np.uint64(si + 1)
            t = pa.table({k: (cur.column(k) if k in live
                              else pa.nulls(n, key_types[k]))
                          for k in keys}
                         | {a: cur.column(a) for a in aliases}
                         | ({"__pc": cur.column("__pc")} if count_col
                            else {})
                         | {"__set": pa.array(np.full(n, si, np.int16)),
                            "__gbucket": pa.array(
                                (h % np.uint64(num_buckets))
                                .astype(np.int32))})
            out.append(t)
        return pa.concat_tables(out)

    def reduce_group(group: pa.Table) -> pa.Table:
        sub = group.drop_columns(["__gbucket"])
        respec = [(a, "sum") for a in aliases]
        if count_col:
            respec.append(("__pc", "sum"))
        out = (group_agg(sub, ["__set"] + keys, respec)
               .rename_columns(["__set"] + keys + aliases
                               + ([count_col] if count_col else [])))
        return out.drop_columns(["__set"]).select(
            keys + aliases + ([count_col] if count_col else []))

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return packed_bucket_map_groups(partials, None, reduce_group,
                                    num_buckets=num_buckets,
                                    pre_bucketed=True)


def rollup_agg(ds, keys: Sequence[str], sum_cols: dict[str, str] | None = None,
               *, count_col: str | None = "n", num_buckets: int = 64):
    """SQL ``GROUP BY ROLLUP (keys…)``: one output row per group at
    EVERY prefix level of ``keys`` — (k1..kn), (k1..kn-1), …, (k1) and
    the grand total — with rolled-up key columns null, exactly like the
    SQL result. The prefix specialization of ``grouping_sets_agg``
    (see there for the scale shape and float-sum caveat)."""
    keys = list(keys)
    if not keys:
        raise ValueError("rollup_agg needs at least one key")
    sets = [keys[:lvl] for lvl in range(len(keys), -1, -1)]
    return grouping_sets_agg(ds, keys, sets, sum_cols,
                             count_col=count_col, num_buckets=num_buckets)


def cube_agg(ds, keys: Sequence[str], sum_cols: dict[str, str] | None = None,
             *, count_col: str | None = "n", num_buckets: int = 64):
    """SQL ``GROUP BY CUBE (keys…)``: one output row per group per
    SUBSET of ``keys`` (2^len(keys) grouping sets). The power-set
    specialization of ``grouping_sets_agg`` (see there for the scale
    shape and float-sum caveat). Capped at 6 keys (64 sets) — wider
    cubes should enumerate the sets they actually need via
    ``grouping_sets_agg``."""
    keys = list(keys)
    if not keys:
        raise ValueError("cube_agg needs at least one key")
    if len(keys) > 6:
        raise ValueError("cube_agg is capped at 6 keys (64 grouping "
                         "sets); pass the needed sets to "
                         "grouping_sets_agg instead")
    sets = [[k for j, k in enumerate(keys) if mask >> j & 1]
            for mask in range((1 << len(keys)) - 1, -1, -1)]
    return grouping_sets_agg(ds, keys, sets, sum_cols,
                             count_col=count_col, num_buckets=num_buckets)


def grouped_moments(ds, keys: Sequence[str], x: str, y: str | None = None,
                    *, sample: bool = True):
    """Per-key second-moment statistics — ``n, mean_x, var_x, std_x``
    and, with ``y``, ``mean_y, var_y, std_y, covar, corr`` — from ONE
    pass of per-block partial sums (n, Σx, Σx², …) through the
    order-pinned ``grouped_sums`` exchange, then a vectorized driver-
    free finalize per group.

    Integer inputs keep int64-exact partial sums, so the finalize's
    float expression tree — evaluated in the documented order
    mean = Σx/n, var = (Σx² − (Σx·Σx)/n)/(n−1), std = √var,
    covar = (Σxy − (Σx·Σy)/n)/(n−1), corr = covar/(std_x·std_y) —
    is bit-reproducible against any engine computing the same
    expressions over the same exact sums (the oracle contract).
    Float inputs accumulate float64 partials (values then carry the
    usual distributed-sum order caveat). ``sample=False`` divides by n
    (population) instead of n−1. Groups with n==1 (or zero variance,
    for corr) yield null."""
    keys = list(keys)
    if not x or (y is not None and y == x):
        raise ValueError("grouped_moments needs x (and optionally a "
                         "distinct y)")
    in_cols = [x] + ([y] if y else [])

    def derive(batch: pa.Table) -> pa.Table:
        xa = np.asarray(batch.column(x))
        cols = {k: batch.column(k) for k in keys}
        cols["__x"] = pa.array(xa)
        cols["__xx"] = pa.array(xa * xa)
        if y:
            ya = np.asarray(batch.column(y))
            cols["__y"] = pa.array(ya)
            cols["__yy"] = pa.array(ya * ya)
            cols["__xy"] = pa.array(xa * ya)
        return pa.table(cols)

    sums = {"__x": "sx", "__xx": "sxx"}
    if y:
        sums |= {"__y": "sy", "__yy": "syy", "__xy": "sxy"}
    agg = grouped_sums(ds.select_columns(keys + in_cols).map_batches(
        derive, batch_format="pyarrow"), keys, sums, count_col="n")

    def finalize(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch.column("n"), dtype=np.float64)
        d = n if not sample else n - 1.0
        sx = np.asarray(batch.column("sx"), dtype=np.float64)
        sxx = np.asarray(batch.column("sxx"), dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean_x = sx / n
            var_x = (sxx - (sx * sx) / n) / d
            std_x = np.sqrt(var_x)
            out = {k: batch.column(k) for k in keys}
            out["n"] = batch.column("n")
            out["mean_x"] = pa.array(mean_x)
            out["var_x"] = pa.array(np.where(d > 0, var_x, np.nan))
            out["std_x"] = pa.array(np.where(d > 0, std_x, np.nan))
            if y:
                sy = np.asarray(batch.column("sy"), dtype=np.float64)
                syy = np.asarray(batch.column("syy"), dtype=np.float64)
                sxy = np.asarray(batch.column("sxy"), dtype=np.float64)
                mean_y = sy / n
                var_y = (syy - (sy * sy) / n) / d
                std_y = np.sqrt(var_y)
                covar = (sxy - (sx * sy) / n) / d
                corr = covar / (std_x * std_y)
                out["mean_y"] = pa.array(mean_y)
                out["var_y"] = pa.array(np.where(d > 0, var_y, np.nan))
                out["std_y"] = pa.array(np.where(d > 0, std_y, np.nan))
                out["covar"] = pa.array(np.where(d > 0, covar, np.nan))
                out["corr"] = pa.array(
                    np.where((d > 0) & (var_x > 0) & (var_y > 0),
                             corr, np.nan))
        return pa.table(out)

    return agg.map_batches(finalize, batch_format="pyarrow")


def topk_exact(ds, cols: str | Sequence[str], k: int, *,
               count_col: str = "n"):
    """Exact top-k by frequency: per-block counts → packed grouped sum
    (integer counts — order-independent) → sort desc → limit k.
    Returns a Dataset."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    summed = grouped_assoc_agg(ds.select_columns(cols), cols,
                               count_col=count_col)
    return summed.sort(count_col, descending=True).limit(k)


def normalize_per_key(ds, key: str | Sequence[str], col: str, *,
                      out_col: str | None = None):
    """Per-key min-max feature scaling — append ``(v - min) / (max -
    min)`` of ``col`` within each key (0.0 when the key is constant).
    min/max are exact order-independent aggregates, and the score is
    one IEEE subtraction + one division, so the result is bit-exact
    reproducible in SQL.

    Scale shape: per-block pre-aggregated min/max partials through the
    packed exchange (``grouped_assoc_agg`` — the stats table is one row
    per key), then the engine's ``hash_join`` ships the stats back
    (broadcast when they fit, partitioned otherwise); the scoring pass
    is a streaming ``map_batches``. The input dataset is traversed
    twice (stats + score) — at scale, read pruning keeps both passes
    column-narrow."""
    import pyarrow.compute as pc

    from .join import hash_join

    key = [key] if isinstance(key, str) else list(key)
    out_col = out_col or f"{col}_norm"

    def dup(batch: pa.Table) -> pa.Table:
        c = batch.column(col)
        return batch.select(key + [col]).append_column("_mm_dup", c)

    stats = grouped_assoc_agg(
        ds.map_batches(dup, batch_format="pyarrow"), key,
        {col: ("min", "_mm_min"), "_mm_dup": ("max", "_mm_max")})

    joined = hash_join(ds, stats, on=key, how="left")

    def score(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column(col), dtype=np.float64)
        mn = np.asarray(batch.column("_mm_min"), dtype=np.float64)
        mx = np.asarray(batch.column("_mm_max"), dtype=np.float64)
        span = mx - mn
        with np.errstate(invalid="ignore", divide="ignore"):
            s = np.where(span == 0.0, 0.0, (v - mn) / span)
        return (batch.drop_columns(["_mm_min", "_mm_max"])
                     .append_column(out_col, pa.array(s)))

    return joined.map_batches(score, batch_format="pyarrow")


def grouped_distinct_exact(ds, key: str | Sequence[str],
                           cols: str | Sequence[str], *,
                           out_col: str = "n_distinct"):
    """EXACT per-key distinct count — SQL ``count(DISTINCT cols) GROUP
    BY key`` (``hll_distinct(key=...)`` is the approximate sibling; this
    pays an exchange of deduped pairs for exactness). Returns
    Dataset[key…, out_col].

    Scale shape: each block first collapses to its distinct
    (key, cols) pairs (Arrow hash aggregate — the only rows that ever
    shuffle), then ONE packed bucketed exchange on ``key`` brings each
    key's surviving pairs together; the reduce lexsorts the 128-bit
    (key, pair) hash pairs once and counts unique pairs per key segment
    with a reduceat — no Python per key. Skewed keys concentrate their
    pair sets on one reducer; if a single key's distinct set outgrows a
    reducer, route through ``hll_distinct`` instead (documented
    tradeoff)."""
    import pyarrow.compute as pc  # noqa: F401  (parity with siblings)

    from ..functions.keys import hash_keys64_pair
    from .buckets import packed_bucket_map_groups

    key = [key] if isinstance(key, str) else list(key)
    cols = [cols] if isinstance(cols, str) else list(cols)
    both = key + cols

    def dedupe_block(batch: pa.Table) -> pa.Table:
        return (batch.select(both).group_by(both).aggregate([])
                .rename_columns(both))

    def reduce_group(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gbucket"])
        if group.num_rows == 0:
            return (group.select(key)
                    .append_column(out_col, pa.array([], pa.int64())))
        kh1, kh2 = hash_keys64_pair(group, key)
        ph1, ph2 = hash_keys64_pair(group, both)
        order = np.lexsort((ph2, ph1, kh2, kh1))
        kh1, kh2 = kh1[order], kh2[order]
        ph1, ph2 = ph1[order], ph2[order]
        n = len(order)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = (kh1[1:] != kh1[:-1]) | (kh2[1:] != kh2[:-1])
        new_pair = np.empty(n, dtype=bool)
        new_pair[0] = True
        new_pair[1:] = (ph1[1:] != ph1[:-1]) | (ph2[1:] != ph2[:-1])
        starts = np.nonzero(new_key)[0]
        counts = np.add.reduceat(new_pair.astype(np.int64), starts)
        out = group.take(pa.array(order[starts])).select(key)
        return out.append_column(out_col, pa.array(counts))

    partials = ds.select_columns(both).map_batches(
        dedupe_block, batch_format="pyarrow")
    return packed_bucket_map_groups(partials, key, reduce_group)


def collect_per_key(ds, key: str | Sequence[str], col: str, order_by, *,
                    out_col: str | None = None, sep: str | None = None,
                    count_col: str | None = None,
                    max_list_len: int | None = None,
                    on_overflow: str = "raise"):
    """SQL ``array_agg(col ORDER BY …) GROUP BY key`` (``sep=None``:
    one list row per key) or ``string_agg(col, sep ORDER BY …)``
    (``sep`` given: one joined string per key, nulls skipped, all-null
    keys yield a null string — SQL semantics). The transcript-assembly
    primitive: turns one-row-per-turn event logs back into
    one-row-per-conversation sequences. ``order_by`` is a list of
    column names or ``(name, "ascending"|"descending")`` pairs and must
    be a total order within each key for deterministic output.
    ``count_col`` adds the per-key row count (SQL ``count(*)``).

    A single key's collected values must fit one reducer (inherent to
    the operator's output row) — ``max_list_len`` guards that envelope
    at scale (verdict r4 #8): a key exceeding it either fails loudly
    (``on_overflow="raise"``, the default — names the key) or keeps its
    FIRST ``max_list_len`` values in ``order_by`` order with a boolean
    ``{out_col}_truncated`` flag appended (``on_overflow="truncate"``;
    ``count_col`` still reports the TRUE pre-truncation count).

    Scale shape: one packed bucketed exchange on ``key`` carrying only
    the projected columns, ONE lexsort per reduce task, then the list
    column is a single zero-copy ``ListArray.from_arrays`` over the
    sorted values (``binary_join`` on top for ``sep``) — no Python per
    key or per element."""
    import pyarrow.compute as pc

    from .buckets import packed_bucket_map_groups
    from .windows import _sorted_key_segments

    if on_overflow not in ("raise", "truncate"):
        raise ValueError("on_overflow must be 'raise' or 'truncate'")
    if max_list_len is not None and max_list_len < 1:
        raise ValueError("max_list_len must be >= 1")
    key = [key] if isinstance(key, str) else list(key)
    order_by = [(o, "ascending") if isinstance(o, str) else (o[0], o[1])
                for o in order_by]
    out_col = out_col or (f"{col}_agg" if sep is not None else f"{col}_list")
    trunc_col = f"{out_col}_truncated"
    truncating = max_list_len is not None and on_overflow == "truncate"

    proj = list(dict.fromkeys(key + [c for c, _ in order_by] + [col]))

    def reduce_group(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gbucket"])
        val_type = group.schema.field(col).type
        if sep is not None and not (pa.types.is_string(val_type)
                                    or pa.types.is_large_string(val_type)):
            raise TypeError(f"sep= needs a string column, got {val_type}")
        if group.num_rows == 0:
            t = group.select(key)
            empty_t = (pa.string() if sep is not None
                       else pa.list_(val_type))
            t = t.append_column(out_col, pa.array([], empty_t))
            if count_col:
                t = t.append_column(count_col, pa.array([], pa.int64()))
            if truncating:
                t = t.append_column(trunc_col, pa.array([], pa.bool_()))
            return t
        g, starts, _seg = _sorted_key_segments(group, key, order_by)
        n = g.num_rows
        bounds = np.append(starts, n).astype(np.int64)
        sizes = bounds[1:] - bounds[:-1]              # TRUE per-key counts
        vals = g.column(col)
        vals = (vals.combine_chunks() if isinstance(vals, pa.ChunkedArray)
                else vals)
        out = g.take(pa.array(starts)).select(key)
        over = None
        if max_list_len is not None:
            over = sizes > max_list_len
            if over.any() and on_overflow == "raise":
                hot = int(np.argmax(over))
                kv = {c: out.column(c)[hot].as_py() for c in key}
                raise ValueError(
                    f"collect_per_key: key {kv} holds {int(sizes[hot])} "
                    f"rows > max_list_len={max_list_len}; raise the "
                    "limit, pre-filter the hot key, or pass "
                    "on_overflow='truncate'")
            if over.any():
                # keep each key's first max_list_len rows (order_by order)
                pos = np.arange(n) - np.repeat(starts, sizes)
                keepm = pos < max_list_len
                vals = vals.filter(pa.array(keepm))
                bounds = np.append(
                    0, np.cumsum(np.minimum(sizes, max_list_len)))
        if sep is None:
            lists = pa.ListArray.from_arrays(
                pa.array(bounds, pa.int32()), vals)
            out = out.append_column(out_col, lists)
        else:
            valid = np.asarray(pc.is_valid(vals))
            cn = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
            m = cn[bounds[1:]] - cn[bounds[:-1]]      # non-nulls per key
            offs = np.concatenate(([0], np.cumsum(m)))
            lists = pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), vals.drop_null())
            joined = pc.binary_join(lists, sep)
            joined = pc.if_else(pa.array(m > 0), joined,
                                pa.nulls(len(m), joined.type))
            out = out.append_column(out_col, joined)
        if count_col:
            out = out.append_column(count_col, pa.array(sizes))
        if truncating:
            flag = over if over is not None else np.zeros(len(sizes), bool)
            out = out.append_column(trunc_col, pa.array(flag))
        return out

    return packed_bucket_map_groups(ds.select_columns(proj), key,
                                    reduce_group)


def histogram(ds, col: str, bins: int, *, lo: float | None = None,
              hi: float | None = None):
    """Equi-width histogram of a numeric column: exact counts per bin.
    Bins are ``[lo + i*w, lo + (i+1)*w)`` with ``w = (hi - lo) / bins``;
    the last bin is closed (values equal to ``hi`` land in it, numpy /
    SQL ``LEAST(floor((v - lo)/w), bins - 1)`` convention) and values
    outside ``[lo, hi]``, nulls, and NaNs are dropped. Empty bins are
    omitted (the output is Dataset[bin, bin_start, bin_end, n], one row
    per NON-empty bin). When ``lo``/``hi`` are omitted they come from an
    extra exact min/max pass over the column.

    Scale shape: one streaming pass maps each block to ≤ ``bins``
    partial-count rows (vectorized mask + floor), then the packed
    count exchange merges them — the shuffle moves bin partials, never
    rows, and the result is ≤ ``bins`` rows regardless of input size.
    Bit-exact vs SQL when lo/hi/bins are given explicitly (identical
    IEEE expressions)."""
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if lo is None or hi is None:
        mn, mx = _minmax_pass(ds, col)
        lo = mn if lo is None else lo
        hi = mx if hi is None else hi
    lo = float(lo)
    hi = float(hi)
    if not hi >= lo:
        raise ValueError(f"need hi >= lo, got [{lo}, {hi}]")
    w = (hi - lo) / bins

    def to_bins(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        arr = batch.column(col)
        # cast BEFORE fill_null: filling an int64 array with nan raises
        v = np.asarray(pc.fill_null(arr.cast(pa.float64()), np.nan),
                       dtype=np.float64)
        m = (v >= lo) & (v <= hi)                  # NaN fails both
        v = v[m]
        if w > 0:
            b = np.minimum(np.floor((v - lo) / w), bins - 1).astype(np.int64)
        else:                                      # degenerate lo == hi
            b = np.zeros(len(v), dtype=np.int64)
        return pa.table({"bin": pa.array(b)})

    binned = ds.select_columns([col]).map_batches(
        to_bins, batch_format="pyarrow")
    counts = grouped_assoc_agg(binned, ["bin"], count_col="n")

    def add_edges(t: pa.Table) -> pa.Table:
        b = np.asarray(t.column("bin"), dtype=np.float64)
        return (t.append_column("bin_start", pa.array(lo + b * w))
                 .append_column("bin_end", pa.array(lo + (b + 1) * w)))

    return counts.map_batches(add_edges, batch_format="pyarrow")


def _minmax_pass(ds, col: str) -> tuple[float, float]:
    """Exact global (min, max) of a numeric column in one streaming
    pass: per-block extremes → tiny driver reduce (one row per block)."""
    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        arr = batch.column(col)
        valid = pc.drop_null(arr)
        if len(valid) == 0:
            return pa.table({"__lo": pa.array([], pa.float64()),
                             "__hi": pa.array([], pa.float64())})
        return pa.table({
            "__lo": pa.array([pc.min(valid).as_py()], pa.float64()),
            "__hi": pa.array([pc.max(valid).as_py()], pa.float64())})

    rows = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow").take_all()
    if not rows:
        raise ValueError(f"histogram: column {col!r} has no non-null values")
    return (min(r["__lo"] for r in rows), max(r["__hi"] for r in rows))


def mode_per_key(ds, key: str | Sequence[str], col: str, *,
                 count_col: str = "n"):
    """Per-key MODE — the most frequent non-null ``col`` value for each
    key, with the deterministic SQL-replicable tie-break (smallest value
    wins among equally frequent ones; binary collation for strings, so
    DuckDB's default ORDER BY agrees). Nulls don't vote and a key whose
    values are all null disappears, matching ``count(*) … WHERE col IS
    NOT NULL``. Returns Dataset[key…, col, count_col].

    Scale shape: exact (key, value) counts via the packed count
    exchange (partials only — at most one row per distinct pair per
    block), then the mergeable top-1 prune; nothing materializes beyond
    one row per distinct (key, value) pair."""
    import pyarrow.compute as pc

    keys = [key] if isinstance(key, str) else list(key)

    def drop_null_vals(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch.column(col)))

    counts = grouped_assoc_agg(
        ds.select_columns(keys + [col]).map_batches(
            drop_null_vals, batch_format="pyarrow"),
        keys + [col], count_col=count_col)
    top = topk_rows_per_key(counts, keys,
                            [(count_col, "descending"), (col, "ascending")],
                            1, rank_col="__rn")
    return top.drop_columns(["__rn"])


def describe(ds, cols: Sequence[str], *, sample: bool = True):
    """Per-column summary statistics — one row per described NUMERIC
    column with ``col, n (non-null), nulls, mean, std, min, max`` —
    from ONE streaming pass of per-block partial sums (n, Σx, Σx²,
    min, max per column). Integer columns keep exact integer partial
    sums (Python-int combined, so cross-block accumulation never
    wraps), making mean/std bit-reproducible against any SQL engine
    evaluating ``CAST(Σx AS DOUBLE)/n`` and
    ``sqrt((Σx² − Σx·Σx/n)/(n−1))`` over the same sums — the same
    oracle contract as ``grouped_moments``. Float columns carry the
    usual distributed-sum order caveat. ``sample=False`` divides by n.

    Scale shape: the shuffle is a driver gather of one partial row per
    (block, column) — bounded by block count, never by row count."""
    cols = list(cols)
    if not cols:
        raise ValueError("describe needs at least one column")
    from .asof import _schema_of

    schema = _schema_of(ds)
    for c in cols:
        t = schema.field(c).type
        if not (pa.types.is_integer(t) or pa.types.is_floating(t)):
            raise TypeError(f"describe: column {c!r} is {t}, not numeric "
                            "— describe covers int/float columns only")

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = {"col": [], "n": [], "nulls": [], "is_int": [],
               "sx_i": [], "sxx_i": [], "sx_f": [], "sxx_f": [],
               "mn": [], "mx": []}
        for c in cols:
            arr = batch.column(c)
            valid = pc.drop_null(arr)
            is_int = pa.types.is_integer(arr.type)
            out["col"].append(c)
            out["n"].append(len(valid))
            out["nulls"].append(len(arr) - len(valid))
            out["is_int"].append(is_int)
            if len(valid) == 0:
                out["sx_i"].append(0); out["sxx_i"].append(0)
                out["sx_f"].append(0.0); out["sxx_f"].append(0.0)
                out["mn"].append(None); out["mx"].append(None)
                continue
            if is_int:
                x = np.asarray(valid.cast(pa.int64()))
                out["sx_i"].append(int(np.sum(x)))
                out["sxx_i"].append(int(np.sum(x * x)))
                out["sx_f"].append(0.0); out["sxx_f"].append(0.0)
            else:
                x = np.asarray(valid.cast(pa.float64()))
                out["sx_f"].append(float(np.sum(x)))
                out["sxx_f"].append(float(np.sum(x * x)))
                out["sx_i"].append(0); out["sxx_i"].append(0)
            out["mn"].append(float(np.min(x)))
            out["mx"].append(float(np.max(x)))
        return pa.table({
            "col": pa.array(out["col"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "nulls": pa.array(out["nulls"], pa.int64()),
            "is_int": pa.array(out["is_int"], pa.bool_()),
            "sx_i": pa.array(out["sx_i"], pa.int64()),
            "sxx_i": pa.array(out["sxx_i"], pa.int64()),
            "sx_f": pa.array(out["sx_f"], pa.float64()),
            "sxx_f": pa.array(out["sxx_f"], pa.float64()),
            "mn": pa.array(out["mn"], pa.float64()),
            "mx": pa.array(out["mx"], pa.float64())})

    rows = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow").take_all()
    stats = []
    for c in cols:
        rs = [r for r in rows if r["col"] == c]
        n = sum(r["n"] for r in rs)
        nulls = sum(r["nulls"] for r in rs)
        is_int = rs[0]["is_int"] if rs else True
        if is_int:  # Python-int combine: exact regardless of magnitude
            sx = float(sum(int(r["sx_i"]) for r in rs))
            sxx = float(sum(int(r["sxx_i"]) for r in rs))
        else:
            sx = sum(r["sx_f"] for r in rs)
            sxx = sum(r["sxx_f"] for r in rs)
        mns = [r["mn"] for r in rs if r["mn"] is not None]
        mxs = [r["mx"] for r in rs if r["mx"] is not None]
        d = float(n - 1 if sample else n)
        mean = sx / n if n else None
        var = (sxx - (sx * sx) / n) / d if n and d > 0 else None
        stats.append({
            "col": c, "n": n, "nulls": nulls, "mean": mean,
            "std": float(np.sqrt(var)) if var is not None else None,
            "min": min(mns) if mns else None,
            "max": max(mxs) if mxs else None})
    import ray.data as _rd

    return _rd.from_arrow(pa.Table.from_pylist(stats, schema=pa.schema([
        ("col", pa.string()), ("n", pa.int64()), ("nulls", pa.int64()),
        ("mean", pa.float64()), ("std", pa.float64()),
        ("min", pa.float64()), ("max", pa.float64())])))


def dataset_checksum(ds, cols: str | Sequence[str] | None = None) -> dict:
    """Order- and partition-invariant content fingerprint — the cheap
    way to answer "is this 100-TB copy identical to the source?"
    without a sort or shuffle. Each row contributes its canonical
    128-bit key hash; the checksum is ``{n, xor_lo, sum_lo, xor_hi}``
    (row count, XOR and wrapping SUM of the low words, XOR of the high
    words), all invariant under row order and partitioning. XOR alone
    is blind to an even number of repeats of the same row; the wrapping
    SUM breaks that, and the second 64-bit lane drives collision odds
    to ~2^-128 for adversarial single-row edits. ``cols=None``
    fingerprints every column.

    Scale shape: one streaming pass, one tiny partial row per block,
    driver combine bounded by block count."""
    from ..functions.keys import hash_keys64_pair

    if cols is None:
        from .asof import _schema_of

        cols = list(_schema_of(ds).names)
    cols = [cols] if isinstance(cols, str) else list(cols)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            z = pa.array([], pa.uint64())
            return pa.table({"n": pa.array([], pa.int64()),
                             "x1": z, "s1": z, "x2": z})
        h1, h2 = hash_keys64_pair(batch, cols)
        return pa.table({
            "n": pa.array([batch.num_rows], pa.int64()),
            "x1": pa.array([np.bitwise_xor.reduce(h1)], pa.uint64()),
            "s1": pa.array([int(np.sum(h1, dtype=np.uint64))], pa.uint64()),
            "x2": pa.array([np.bitwise_xor.reduce(h2)], pa.uint64())})

    rows = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    x1 = x2 = 0
    s1 = 0
    for r in rows:
        x1 ^= int(r["x1"])
        x2 ^= int(r["x2"])
        s1 = (s1 + int(r["s1"])) & 0xFFFFFFFFFFFFFFFF
    return {"n": int(n), "xor_lo": x1, "sum_lo": s1, "xor_hi": x2}


def grouped_jaccard_exact(ds_a, ds_b, key: str | Sequence[str],
                          col: str):
    """EXACT per-key set overlap between two datasets — for each key
    value: ``n_a, n_b, n_inter, n_union, jaccard`` over the DISTINCT
    ``col`` values each side holds for that key (the exact counterpart
    of ``theta_set_estimates_grouped``; use that sketch path when
    per-key distinct cardinalities are too large to co-locate). Null
    ``col`` values are excluded (SQL DISTINCT-set semantics); keys
    present on one side report the other side as 0. Jaccard is one
    double division of exact int64 counts — bit-reproducible in SQL.

    Scale shape: each block dedupes its own (key, value, side) triples
    (values carried as the canonical 128-bit hash pair, collision odds
    ~2^-128), so the packed exchange moves at most one row per distinct
    triple per block; the per-bucket reduce is one lexsort + boundary
    masks — no per-key Python."""
    import pyarrow.compute as pc

    from ..functions.keys import hash_keys64_pair
    from .buckets import group_agg, packed_bucket_map_groups

    keys = [key] if isinstance(key, str) else list(key)

    def prep(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.is_valid(batch.column(col)))
            v1, v2 = hash_keys64_pair(batch, [col])
            t = batch.select(keys)
            t = t.append_column("__v1", pa.array(v1.view(np.int64)))
            t = t.append_column("__v2", pa.array(v2.view(np.int64)))
            t = group_agg(t, keys + ["__v1", "__v2"], [])   # block dedupe
            return t.append_column(
                "__side", pa.array(np.full(t.num_rows, side, np.int8)))
        return fn

    tagged_a = ds_a.select_columns(keys + [col]).map_batches(
        prep(0), batch_format="pyarrow")
    tagged_b = ds_b.select_columns(keys + [col]).map_batches(
        prep(1), batch_format="pyarrow")

    def reduce_group(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gbucket"])
        empty_cols = {c: group.column(c).slice(0, 0) for c in keys}
        if group.num_rows == 0:
            return pa.table({**empty_cols,
                             **{c: pa.array([], pa.int64()) for c in
                                ("n_a", "n_b", "n_inter", "n_union")},
                             "jaccard": pa.array([], pa.float64())})
        idx = np.asarray(pc.sort_indices(group, sort_keys=[
            (c, "ascending") for c in keys]
            + [("__v1", "ascending"), ("__v2", "ascending"),
               ("__side", "ascending")]))
        g = group.take(pa.array(idx))
        h1, h2 = hash_keys64_pair(g, keys)
        v1 = np.asarray(g.column("__v1"), dtype=np.int64)
        v2 = np.asarray(g.column("__v2"), dtype=np.int64)
        side = np.asarray(g.column("__side"), dtype=np.int8)
        n = len(idx)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        new_val = new_key.copy()
        new_val[1:] |= (v1[1:] != v1[:-1]) | (v2[1:] != v2[:-1])
        # block-level dupes of one (key,val,side) triple may still meet
        # here — a side counts once per distinct (key,val)
        new_pair = new_val.copy()
        new_pair[1:] |= side[1:] != side[:-1]
        kid = np.cumsum(new_key) - 1
        w = np.where(new_pair, 1, 0)
        n_keys = int(kid[-1]) + 1
        in_a = np.bincount(kid, weights=w * (side == 0),
                           minlength=n_keys).astype(np.int64)
        in_b = np.bincount(kid, weights=w * (side == 1),
                           minlength=n_keys).astype(np.int64)
        n_union = np.bincount(kid, weights=np.where(new_val, 1, 0),
                              minlength=n_keys).astype(np.int64)
        n_inter = in_a + in_b - n_union
        kstarts = np.nonzero(new_key)[0]
        out = g.select(keys).take(pa.array(kstarts))
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = np.where(n_union > 0,
                           n_inter.astype(np.float64)
                           / n_union.astype(np.float64), np.nan)
        return (out.append_column("n_a", pa.array(in_a))
                   .append_column("n_b", pa.array(in_b))
                   .append_column("n_inter", pa.array(n_inter))
                   .append_column("n_union", pa.array(n_union))
                   .append_column("jaccard", pa.array(jac)))

    return packed_bucket_map_groups(tagged_a.union(tagged_b), keys,
                                    reduce_group)


def entropy_per_key(ds, key: str | Sequence[str], col: str, *,
                    base: float = 2.0, out_col: str = "entropy"):
    """Per-key Shannon entropy of a categorical column — the diversity
    signal curation pipelines gate on (source mix of a dedup cluster,
    label balance of a stratum). For each key: ``H = -Σ p_c·log(p_c)``
    over the distribution of non-null ``col`` values (counted with
    multiplicity), in ``base`` (default bits). A single-category key
    scores 0; an all-null key disappears. Exact category counts; the
    only float work is the final log/divide (values carry float
    summation order across a key's categories — pinned against numpy,
    not a SQL hash).

    Scale shape: per-block (key, value) pre-count via the null-safe
    Arrow group-by, one packed exchange of count partials, then one
    lexsort + two reduceats per bucket — no per-key Python."""
    import math

    import pyarrow.compute as pc

    from ..functions.keys import hash_keys64_pair
    from .buckets import group_agg, packed_bucket_map_groups

    keys = [key] if isinstance(key, str) else list(key)
    if base <= 1.0:
        raise ValueError("base must be > 1")

    def precount(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(col)))
        out = group_agg(batch.select(keys + [col]), keys + [col],
                        [([], "count_all")])
        return out.rename_columns(keys + [col, "__pc"])

    partials = ds.select_columns(keys + [col]).map_batches(
        precount, batch_format="pyarrow")

    def reduce_group(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gbucket"])
        if group.num_rows == 0:
            return (group.select(keys)
                    .append_column(out_col, pa.array([], pa.float64())))
        idx = np.asarray(pc.sort_indices(group, sort_keys=[
            (c, "ascending") for c in keys] + [(col, "ascending")]))
        g = group.take(pa.array(idx))
        h1, h2 = hash_keys64_pair(g, keys)
        v1, v2 = hash_keys64_pair(g, [col])
        cnt = np.asarray(g.column("__pc"), dtype=np.int64)
        n = len(idx)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        new_val = new_key.copy()
        new_val[1:] |= (v1[1:] != v1[:-1]) | (v2[1:] != v2[:-1])
        # merge same (key, value) partials from different blocks
        vstarts = np.nonzero(new_val)[0]
        vid = np.cumsum(new_val) - 1
        c = np.bincount(vid, weights=cnt).astype(np.int64)
        kid_of_v = (np.cumsum(new_key) - 1)[vstarts]
        n_keys = int(kid_of_v[-1]) + 1
        tot = np.bincount(kid_of_v, weights=c, minlength=n_keys)
        p = c / tot[kid_of_v]
        h = -np.bincount(kid_of_v, weights=p * np.log(p),
                         minlength=n_keys) / math.log(base)
        h = np.where(np.abs(h) < 1e-15, 0.0, h)      # exact 0 for 1-cat
        kstarts = np.nonzero(new_key)[0]
        out = g.select(keys).take(pa.array(kstarts))
        return out.append_column(out_col, pa.array(h, pa.float64()))

    return packed_bucket_map_groups(partials, keys, reduce_group)


class _RankAnnotator:
    """Actor-pool stage for ``approx_percentile_rank``: the KLL blob is
    deserialized ONCE per actor in ``__init__`` (stateful-stage idiom);
    each batch is one vectorized searchsorted."""

    def __init__(self, blob: bytes, col: str, out_col: str):
        self.sk = sketch_from_bytes(bytes(blob))
        self.col = col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        arr = batch.column(self.col)
        # cast BEFORE fill_null: filling an int64 array with nan raises
        x = np.asarray(pc.fill_null(arr.cast(pa.float64()), np.nan))
        r = self.sk.rank(x)
        res = pa.array(np.where(np.isnan(x), np.nan, r), pa.float64())
        if arr.null_count or np.isnan(x).any():
            res = pc.if_else(pa.array(~np.isnan(x)), res,
                             pa.scalar(None, pa.float64()))
        return batch.append_column(self.out_col, res)


def approx_percentile_rank(ds, col: str, *, k: int = 200,
                           out_col: str | None = None,
                           concurrency: int | tuple = 2):
    """Annotate every row with its approximate GLOBAL percentile rank
    in ``col`` (0 = minimum, →1 = maximum) — the score-normalization
    step before cross-source quality gating ("is this doc in the
    corpus-wide top decile?"), complementing ``filter_by_quantile``
    (which cuts instead of annotating). Rank error follows the KLL
    bound for sketch parameter ``k`` (~1.7%/√(k/200) one-sided,
    pinned in tests); nulls/NaN rank null.

    Scale shape: one column-pruned KLL pass (per-block partials, no row
    shuffle) → the merged sketch broadcasts to an actor pool that
    deserializes it once per actor and ranks each batch with one
    searchsorted. The upstream lineage executes twice (sketch pass +
    annotate pass) — feed a read-from-storage Dataset, as with
    ``filter_by_quantile``. Size ``concurrency`` BELOW the session's
    CPU count: the actor pool holds its CPUs for the stage's lifetime,
    and claiming them all starves the upstream producer tasks
    (observed as a hang on a 4-CPU session with concurrency=4)."""
    from ..state.kll import KllSketch

    out = out_col or f"{col}_pct_rank"
    make = lambda: KllSketch(k)

    def update(s, t: pa.Table):
        s.update_batch(np.asarray(
            t.column(col).cast(pa.float64()).drop_null()))

    sk = sketch_aggregate_global(ds, make, update, input_cols=[col])
    if sk is None:
        raise ValueError(f"approx_percentile_rank: no non-null values "
                         f"in {col!r}")
    return ds.map_batches(_RankAnnotator, fn_constructor_args=(
        sk.to_bytes(), col, out), batch_format="pyarrow",
        concurrency=concurrency)
