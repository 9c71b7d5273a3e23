"""Distributed exact hash join + the flagship ``bloom_join`` pipeline.

Two physical join strategies, chosen automatically:

* **Broadcast** (the bloomjoin shape — big probe side, small build side,
  ``/root/reference/README.md:7,53-58``): the small side is materialized
  once, ``ray.put`` into the object store, and every ``map_batches`` task
  joins its Arrow block against it zero-copy. No shuffle. Used for
  inner/left/semi/anti when the right side fits the broadcast budget.
* **Partitioned** (both sides large): both sides are bucketed by the
  canonical 32-bit key hash (``bucket = uint32(hash_keys32(keys)) % B``);
  each map block emits one Arrow-IPC pack per bucket, and reduce tasks
  read every map block from the object store to join their bucket range
  with ``pyarrow.Table.join`` (Acero). One all-to-all exchange carrying
  the same volume a shuffle would, without the sort-shuffle operator's
  row-count-independent launch cost (measured ~2-3 s in Ray local mode).
  Supports all six join types natively.

Semantics follow the reference (= dplyr):

* six join types incl. semi/anti (``R/bloomjoin.R:458-474``);
* many-to-many keys produce the full cartesian product;
* ``na_matches="na"`` (default): null keys join null keys — implemented by
  joining on ``(canonical_key_value, null_flag)`` pairs, with nulls coalesced
  to a type default and flagged; ``na_matches="never"`` gives SQL semantics
  by making the null flag side-distinct so null never matches null;
* cross-type keys (int vs float, date vs timestamp, dictionary vs string)
  join by value: key columns are cast to a promoted canonical type for
  comparison while output columns keep the x side's storage type
  (promoted for right/full, where unmatched y rows contribute key values);
* overlapping non-key column names get ``_x``/``_y`` suffixes (dplyr uses
  ``.x``/``.y``; documented naming difference).

``bloom_join`` reproduces the reference's two-pass pipeline
(``R/bloomjoin.R:62-124``): plan (reference decision procedure) → build
per-block Bloom partials on the build side → tree-merge → broadcast the
merged filter → prune the probe side in ``map_batches`` → exact join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.keys import hash_keys32
from ..params import bloom_sizing
from ..report import JoinReport
from ..stages.bloom_stages import (
    BloomPartialBuildFn,
    bloom_probe_fn,
    build_bloom_filter,
    make_prune_counter,
)
from .plan import (
    DISTINCT_SAMPLE_LIMIT,
    JOIN_TYPES,
    OnSpec,
    normalize_n_hint,
    plan_prefilter,
    resolve_on,
)

_PA_JOIN_TYPE = {
    "inner": "inner",
    "left": "left outer",
    "right": "right outer",
    "full": "full outer",
    "semi": "left semi",
    "anti": "left anti",
}

DEFAULT_NUM_BUCKETS = 64
DEFAULT_BROADCAST_LIMIT_ROWS = 1_000_000


# --------------------------------------------------------------------------
# canonical key representation
# --------------------------------------------------------------------------

def _decode_type(t: pa.DataType) -> pa.DataType:
    return t.value_type if pa.types.is_dictionary(t) else t

def _is_stringish(t): return pa.types.is_string(t) or pa.types.is_large_string(t)
def _is_binaryish(t): return pa.types.is_binary(t) or pa.types.is_large_binary(t)
def _is_temporal(t): return pa.types.is_timestamp(t) or pa.types.is_date(t)
def _is_numericish(t):
    return pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_boolean(t) or pa.types.is_decimal(t)


def promote_key_type(tx: pa.DataType, ty: pa.DataType) -> pa.DataType:
    """Common comparison type for a key column pair (join notion of
    equality: 1 == 1.0, date == timestamp at the instant, factor == chr)."""
    tx, ty = _decode_type(tx), _decode_type(ty)
    if tx.equals(ty):
        return tx
    if _is_stringish(tx) and _is_stringish(ty):
        return pa.large_string()
    if _is_binaryish(tx) and _is_binaryish(ty):
        return pa.large_binary()
    if pa.types.is_integer(tx) and pa.types.is_integer(ty):
        return pa.int64()
    if _is_numericish(tx) and _is_numericish(ty):
        return pa.float64()
    if _is_temporal(tx) and _is_temporal(ty):
        return pa.timestamp("us")
    if (_is_temporal(tx) and _is_numericish(ty)) or (_is_numericish(tx) and _is_temporal(ty)):
        return pa.float64()  # seconds scale, matching the key hash
    raise TypeError(f"cannot join key columns of types {tx} and {ty}")


def canon_cast(arr: pa.ChunkedArray | pa.Array, target: pa.DataType) -> pa.Array:
    """Value-preserving cast of a key column to its promoted comparison
    type (nulls preserved; temporal→float64 lands on the seconds scale)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_dictionary(t):
        arr = arr.cast(t.value_type)
        t = arr.type
    if t.equals(target):
        return arr
    if pa.types.is_float64(target) and _is_temporal(t):
        if pa.types.is_date32(t):
            return pc.multiply(arr.cast(pa.int32()).cast(pa.float64()), pa.scalar(86400.0))
        if pa.types.is_date64(t):
            return pc.divide(arr.cast(pa.int64()).cast(pa.float64()), pa.scalar(1e3))
        scale = {"s": 1.0, "ms": 1e3, "us": 1e6, "ns": 1e9}[t.unit]
        return pc.divide(arr.cast(pa.int64()).cast(pa.float64()), pa.scalar(scale))
    return arr.cast(target)


def _null_default(t: pa.DataType):
    if _is_stringish(t):
        return pa.scalar("", type=t)
    if _is_binaryish(t):
        return pa.scalar(b"", type=t)
    if pa.types.is_timestamp(t):
        return pa.scalar(0, type=t)
    if pa.types.is_date32(t):
        return pa.scalar(0, type=t)
    return pa.scalar(0, type=t)


def _key_cols(batch: pa.Table, cols: list[str], targets: list[pa.DataType],
              side: int, na_matches: str, num_buckets: int | None):
    """Compute (__jk_i, __jn_i) canonical join-key arrays and, when
    ``num_buckets`` is given, the shuffle bucket column."""
    n = batch.num_rows
    out: dict[str, pa.Array] = {}
    for i, (c, t) in enumerate(zip(cols, targets)):
        arr = canon_cast(batch.column(c), t)
        if pa.types.is_floating(t):
            # NaN keys behave as nulls (reference NA ≡ NaN rule)
            arr = pc.if_else(pc.is_nan(arr), pa.scalar(None, type=t), arr)
        nulls = pc.is_null(arr)
        flag_val = 1 if na_matches == "na" else 1 + side
        flag = pc.if_else(nulls, pa.scalar(flag_val, type=pa.int8()),
                          pa.scalar(0, type=pa.int8()))
        out[f"__jk{i}"] = pc.fill_null(arr, _null_default(t))
        out[f"__jn{i}"] = flag
    if num_buckets is not None:
        h = hash_keys32(batch, cols).view(np.uint32)
        out["__bucket"] = pa.array((h % np.uint32(num_buckets)).astype(np.int32))
    return out


# --------------------------------------------------------------------------
# output naming
# --------------------------------------------------------------------------

class _JoinLayout:
    """Column naming / schema plan shared by both physical strategies."""

    def __init__(self, x_schema: pa.Schema, y_schema: pa.Schema, spec: OnSpec,
                 how: str, suffixes=("_x", "_y")):
        self.spec = spec
        self.how = how
        self.x_schema = x_schema
        self.y_schema = y_schema
        x_names = list(x_schema.names)
        y_names = list(y_schema.names)
        for nm in x_names + y_names:
            if nm.startswith("__"):
                raise ValueError(f"column names starting with '__' are reserved: {nm}")
        self.keep_y = [c for c in y_names if c not in spec.y_cols]
        if how in ("semi", "anti"):
            self.keep_y = []
        x_key_set = set(spec.x_cols)
        overlap = set(self.keep_y) & set(x_names)
        self.x_rename = {c: c + suffixes[0] for c in x_names
                         if c in overlap and c not in x_key_set}
        self.y_rename = {c: c + suffixes[1] for c in self.keep_y if c in overlap}
        # a suffixed name can itself collide with an existing column
        # (x has 'v', y has 'v' and 'v_y'): keep re-applying the suffix
        # until every output name is unique (dplyr repair behavior)
        from collections import Counter
        for _ in range(16):
            self.x_out = [self.x_rename.get(c, c) for c in x_names]
            self.y_out = [self.y_rename.get(c, c) for c in self.keep_y]
            counts = Counter(self.x_out + self.y_out)
            if all(v == 1 for v in counts.values()):
                break
            progressed = False
            for rename, sfx in ((self.x_rename, suffixes[0]),
                                (self.y_rename, suffixes[1])):
                for orig, new in rename.items():
                    if counts[new] > 1:
                        rename[orig] = new + sfx
                        progressed = True
            if not progressed:
                dups = [n for n, v in counts.items() if v > 1]
                raise ValueError(
                    f"join would produce duplicate output columns: {dups}")
        else:
            raise ValueError("could not uniquify join output column names")
        self.x_names, self.y_names = x_names, y_names
        self.targets = [
            promote_key_type(x_schema.field(cx).type, y_schema.field(cy).type)
            for cx, cy in zip(spec.x_cols, spec.y_cols)
        ]
        self.jk = [f"__jk{i}" for i in range(len(spec.x_cols))]
        self.jn = [f"__jn{i}" for i in range(len(spec.x_cols))]
        self.need_yk = how in ("right", "full")
        self.yk = [f"__yk{i}" for i in range(len(spec.y_cols))] if self.need_yk else []
        # x-side output key columns (post-rename names, original x positions)
        self.x_key_out = [self.x_rename.get(c, c) for c in spec.x_cols]
        self.final_names = self.x_out + self.y_out

    def x_table(self, batch: pa.Table, na_matches: str, num_buckets=None) -> pa.Table:
        cols = _key_cols(batch, self.spec.x_cols, self.targets, 0, na_matches, num_buckets)
        t = batch.rename_columns([self.x_rename.get(c, c) for c in batch.schema.names])
        t = t.select(self.x_out)
        for k, v in cols.items():
            t = t.append_column(k, v)
        return t

    def y_table(self, batch: pa.Table, na_matches: str, num_buckets=None) -> pa.Table:
        cols = _key_cols(batch, self.spec.y_cols, self.targets, 1, na_matches, num_buckets)
        yk_vals = [canon_cast(batch.column(c), t)
                   for c, t in zip(self.spec.y_cols, self.targets)] if self.need_yk else []
        t = batch.rename_columns([self.y_rename.get(c, c) for c in batch.schema.names])
        t = t.select(self.y_out)
        for k, v in cols.items():
            t = t.append_column(k, v)
        for name, v in zip(self.yk, yk_vals):
            t = t.append_column(name, v)
        return t

    def join_tables(self, x_t: pa.Table, y_t: pa.Table,
                    how: str | None = None) -> pa.Table:
        """Per-bucket (or per-batch vs broadcast) exact join. ``how``
        overrides the join type for this call — used by skew salting to
        suppress the replicated side's unmatched rows in salted buckets
        (where that side's rows appear in every sub-bucket)."""
        joined = x_t.join(
            y_t,
            keys=self.jk + self.jn,
            join_type=_PA_JOIN_TYPE[how or self.how],
            use_threads=False,
        )
        if self.need_yk:
            # unmatched y rows must contribute key values: promote + coalesce
            for xk, ykn, tgt in zip(self.x_key_out, self.yk, self.targets):
                merged = pc.coalesce(canon_cast(joined.column(xk), tgt), joined.column(ykn))
                joined = joined.set_column(joined.schema.get_field_index(xk), xk, merged)
        return joined.select(self.final_names)


# --------------------------------------------------------------------------
# physical strategies
# --------------------------------------------------------------------------

def _broadcast_join(ds_x, y_ref, layout: _JoinLayout, na_matches: str):
    """Small right side via ray.put; per-batch Acero join, no shuffle."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        y_t = ray.get(y_ref)  # zero-copy from the local object store
        x_t = layout.x_table(batch, na_matches)
        return layout.join_tables(x_t, y_t)

    return ds_x.map_batches(fn, batch_format="pyarrow")


def _reduce_join_buckets(layout, group: int, num_groups: int,
                         x_schema_ser: bytes, y_schema_ser: bytes,
                         how_overrides: dict, x_refs, y_refs):
    """Runs inside a Ray task: stream both sides' packs for this group's
    buckets (``bucket % num_groups == group``) from the object store —
    one map-block slice at a time, the packed form dropped as soon as
    its buckets are unpacked, so peak memory is the unpacked partition
    plus ONE packed slice (not packed + unpacked of the whole
    partition). Returns (row_count, table). ``how_overrides`` maps
    salted bucket ids to the demoted join type (see ``SaltSpec``)."""
    import pyarrow as pa

    import ray

    def unpack(refs):
        per_bucket: dict[int, list] = {}
        for ref in refs:
            blk = ray.get(ref)
            if blk.num_rows == 0:
                continue
            gb = np.asarray(blk.column("__bucket"))
            sel = gb % num_groups == group
            if not sel.any():
                continue
            sub = blk.filter(pa.array(sel))
            for b, p in zip(np.asarray(sub.column("__bucket")),
                            sub.column("pack").to_pylist()):
                per_bucket.setdefault(int(b), []).append(
                    pa.ipc.open_stream(pa.BufferReader(bytes(p))).read_all())
        return per_bucket

    schema_x = pa.ipc.read_schema(pa.BufferReader(x_schema_ser))
    schema_y = pa.ipc.read_schema(pa.BufferReader(y_schema_ser))
    xs = unpack(x_refs)
    ys = unpack(y_refs)
    outs = []
    for b in sorted(set(xs) | set(ys)):
        x_t = (pa.concat_tables(xs[b]) if b in xs else schema_x.empty_table())
        y_t = (pa.concat_tables(ys[b]) if b in ys else schema_y.empty_table())
        outs.append(layout.join_tables(x_t, y_t, how_overrides.get(b)))
    if not outs:
        return 0, None
    out = pa.concat_tables(outs)
    return out.num_rows, out


# --------------------------------------------------------------------------
# skew salting
# --------------------------------------------------------------------------

from dataclasses import dataclass, field as _dc_field


@dataclass
class SaltSpec:
    """Hot-join-key salting plan for the partitioned join.

    Each hot key (identified by its 64-bit canonical hash) owns a
    private range of ``factor`` sub-bucket ids starting at its ``base``
    (all ≥ ``num_buckets`` so they never collide with normal buckets;
    the modulo reducer grouping spreads consecutive ids across
    reducers). On the key's **salted side** (where it is duplicate-rich)
    rows are spread round-robin over the range; the other side's rows
    with that key are **replicated** into every sub-bucket, so each
    (x, y) row pair still meets in exactly one bucket — the full
    many-to-many cartesian, with no reducer receiving more than
    ~1/factor of the hot key's salted-side rows.

    Join-type demotion inside salted buckets (``how_overrides``): the
    replicated side's rows appear in every sub-bucket, so its unmatched
    rows must not be emitted there — and never exist: a key is only
    salted on a side where the *sample saw actual rows*, hence every
    replicated-side row of that key has a match. full→left / right→inner
    when x is salted; full→right / left→inner when y is salted. Keys
    hot only on y under semi/anti joins are never salted (x replication
    would break their semantics); the per-block y key dedupe already
    collapses them.
    """

    factor: int
    keys: dict[int, tuple[str, int]] = _dc_field(default_factory=dict)  # h64 -> (side, base)

    def how_overrides(self, how: str) -> dict[int, str]:
        ov: dict[int, str] = {}
        for _, (side, base) in self.keys.items():
            if side == "x":
                d = {"full": "left", "right": "inner"}.get(how)
            else:
                d = {"full": "right", "left": "inner"}.get(how)
            if d:
                for s in range(self.factor):
                    ov[base + s] = d
        return ov


def detect_salt_spec(sample_x: np.ndarray, sample_y: np.ndarray,
                     n_x: int, n_y: int, how: str, num_buckets: int,
                     num_groups: int = 32, factor: int | None = None,
                     max_hot: int = 8, threshold: float = 2.0) -> SaltSpec | None:
    """Build a SaltSpec from the planner's 64-bit key-hash samples: a key
    is hot when its estimated row share exceeds ``threshold`` × the
    balanced per-reducer share (it alone would overload one reducer).
    The side with more estimated rows of the key is salted; the other is
    replicated. Returns None when nothing is hot."""
    factor = factor or num_groups
    cand: dict[int, tuple[str, float]] = {}
    for side, sample, n in (("x", sample_x, n_x), ("y", sample_y, n_y)):
        if len(sample) == 0:
            continue
        vals, counts = np.unique(sample, return_counts=True)
        shares = counts / len(sample)
        for v, s in zip(vals[shares > threshold / num_groups],
                        shares[shares > threshold / num_groups]):
            est_rows = float(s * n)
            kh = int(v)
            if side == "y" and how in ("semi", "anti"):
                continue  # y-side salting unsafe for semi/anti; dedupe handles it
            cur = cand.get(kh)
            if cur is None or est_rows > cur[1]:
                cand[kh] = (side, est_rows)
    if not cand:
        return None
    items = sorted(cand.items(), key=lambda kv: -kv[1][1])[:max_hot]
    keys = {kh: (side, num_buckets + i * factor)
            for i, (kh, (side, _)) in enumerate(items)}
    return SaltSpec(factor, keys)


def _apply_salt(prep: pa.Table, h64: np.ndarray, spec: SaltSpec,
                own_side: str, na_matches: str) -> pa.Table:
    """Rewrite the prep table's ``__bucket`` per the salt plan: spread
    rows of keys salted on ``own_side``; replicate rows of keys salted
    on the other side into every sub-bucket. Null keys are exempt under
    na_matches='never' (they match nothing; spreading them is pointless
    and replication+demotion would drop their unmatched output)."""
    n = prep.num_rows
    if n == 0:
        return prep
    bucket = np.asarray(prep.column("__bucket")).copy()
    eligible = None
    if na_matches == "never":
        eligible = np.ones(n, dtype=bool)
        for c in prep.schema.names:
            if c.startswith("__jn"):
                eligible &= np.asarray(prep.column(c)) == 0
    bidx = prep.schema.get_field_index("__bucket")
    drop = np.zeros(n, dtype=bool)
    replicas = []
    for kh, (side, base) in spec.keys.items():
        m = h64 == np.uint64(kh)
        if eligible is not None:
            m &= eligible
        cnt = int(m.sum())
        if not cnt:
            continue
        if side == own_side:
            bucket[m] = base + np.arange(cnt) % spec.factor
        else:
            drop |= m
            sub = prep.filter(pa.array(m))
            for s in range(spec.factor):
                replicas.append(sub.set_column(
                    bidx, "__bucket",
                    pa.array(np.full(cnt, base + s, dtype=np.int32))))
    out = prep.set_column(bidx, "__bucket", pa.array(bucket.astype(np.int32)))
    if drop.any():
        out = out.filter(pa.array(~drop))
    return pa.concat_tables([out] + replicas) if replicas else out


def _pack_by_bucket(table: pa.Table) -> pa.Table:
    """(prep table incl. __bucket) → one row per bucket: {__bucket, pack}."""
    gb = np.asarray(table.column("__bucket"))
    body = table.drop_columns(["__bucket"])
    buckets, packs = [], []
    for b in np.unique(gb):
        sub = body.filter(pa.array(gb == b))
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, sub.schema) as w:
            w.write_table(sub)
        buckets.append(int(b))
        packs.append(sink.getvalue().to_pybytes())
    return pa.table({"__bucket": pa.array(buckets, type=pa.int32()),
                     "pack": pa.array(packs, type=pa.large_binary())})


def _partitioned_join(ds_x, ds_y, layout: _JoinLayout, na_matches: str,
                      num_buckets: int, salt: SaltSpec | None = None):
    """Both sides large: each side's map stage emits ONE packed Arrow-IPC
    blob per (block, bucket); per-block split tasks slice the packed
    blocks into one object per reducer group, so each reduce task's
    arguments reference ONLY its bucket range — true-shuffle network
    volume on a cluster. This sidesteps Ray local's sort-shuffle
    operator, whose launch cost (~2-3 s) is independent of row count,
    and removes the union/null-padding the shuffle formulation needed."""
    import ray
    import ray.data as rd

    from .exchange import split_refs_by_group, stream_arrow_refs

    from ..functions.keys import hash_keys64

    def prep_x(batch: pa.Table) -> pa.Table:
        t = layout.x_table(batch, na_matches, num_buckets)
        if salt:
            t = _apply_salt(t, hash_keys64(batch, layout.spec.x_cols),
                            salt, "x", na_matches)
        return _pack_by_bucket(t)

    def prep_y(batch: pa.Table) -> pa.Table:
        t = layout.y_table(batch, na_matches, num_buckets)
        if salt:
            t = _apply_salt(t, hash_keys64(batch, layout.spec.y_cols),
                            salt, "y", na_matches)
        if layout.how in ("semi", "anti"):
            # only distinct y keys matter: per-block dedupe collapses a
            # hot y key to ≤1 row per (block, bucket) — y-side skew gone
            t = t.group_by(t.schema.names).aggregate([])
        return _pack_by_bucket(t)

    x_refs = stream_arrow_refs(ds_x.map_batches(prep_x, batch_format="pyarrow"))
    y_refs = stream_arrow_refs(ds_y.map_batches(prep_y, batch_format="pyarrow"))

    # prep-table schemas for empty-side construction inside tasks
    schema_x = layout.x_table(layout.x_schema.empty_table(), na_matches).schema
    schema_y = layout.y_table(layout.y_schema.empty_table(), na_matches).schema
    ser_x = schema_x.serialize().to_pybytes()
    ser_y = schema_y.serialize().to_pybytes()

    num_groups = min(num_buckets, 32)
    x_parts = split_refs_by_group(x_refs, "__bucket", num_groups)
    y_parts = split_refs_by_group(y_refs, "__bucket", num_groups)

    # The reduce wave runs INSIDE Ray Data so it reuses the warm Data
    # worker pool — plain ray.remote tasks get their workers reaped
    # whenever Data stages fill the pool, and a mixed workload then pays
    # ~num_groups cold worker starts per join (measured 10-20 s at 32).
    layout_ref = ray.put(layout)
    parts_ref = ray.put((x_parts, y_parts))
    how_ov = salt.how_overrides(layout.how) if salt else {}

    def run_groups(batch: pa.Table):
        lay = ray.get(layout_ref)
        xp, yp = ray.get(parts_ref)
        produced = False
        for g in batch.column("g").to_pylist():
            n, out = _reduce_join_buckets(lay, g, num_groups, ser_x, ser_y,
                                          how_ov, list(xp[g]), list(yp[g]))
            if n > 0:
                produced = True
                yield out
        if not produced:
            # typed empty block — a bare return makes Ray emit a
            # schema-less block and warn on every downstream union
            sx = pa.ipc.read_schema(pa.BufferReader(ser_x))
            sy = pa.ipc.read_schema(pa.BufferReader(ser_y))
            yield lay.join_tables(sx.empty_table(), sy.empty_table())

    out = (rd.from_items([{"g": g} for g in range(num_groups)],
                         override_num_blocks=num_groups)
           .map_batches(run_groups, batch_format="pyarrow")
           .materialize())
    if out.count() == 0:
        return rd.from_arrow(layout.join_tables(
            schema_x.empty_table(), schema_y.empty_table()))
    return out


def _partitioned_join_shuffle(ds_x, ds_y, layout: _JoinLayout, na_matches: str,
                              num_buckets: int):
    """The groupby-shuffle formulation (kept as reference / fallback):
    tag + bucket by key hash, union with null padding, one sort-shuffle,
    per-bucket pyarrow join inside map_groups."""
    jk_fields = [pa.field(n, t) for n, t in zip(layout.jk, layout.targets)]
    jn_fields = [pa.field(n, pa.int8()) for n in layout.jn]

    x_fields = [pa.field(n, layout._x_types[i]) for i, n in enumerate(layout.x_out)]
    y_fields = [pa.field(n, layout._y_types[i]) for i, n in enumerate(layout.y_out)]
    yk_fields = [pa.field(n, t) for n, t in zip(layout.yk, layout.targets)]
    unified = pa.schema(
        x_fields + y_fields + jk_fields + jn_fields + yk_fields
        + [pa.field("__side", pa.int8()), pa.field("__bucket", pa.int32())]
    )

    def _pad(t: pa.Table, side: int) -> pa.Table:
        n = t.num_rows
        arrays = []
        for f in unified:
            if f.name == "__side":
                arrays.append(pa.nulls(n, pa.int8()).fill_null(side))
            elif f.name in t.schema.names:
                col = t.column(f.name)
                col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                arrays.append(col.cast(f.type))
            else:
                arrays.append(pa.nulls(n, f.type))
        return pa.Table.from_arrays(arrays, schema=unified)

    def prep_x(batch: pa.Table) -> pa.Table:
        return _pad(layout.x_table(batch, na_matches, num_buckets), 0)

    def prep_y(batch: pa.Table) -> pa.Table:
        return _pad(layout.y_table(batch, na_matches, num_buckets), 1)

    tagged = ds_x.map_batches(prep_x, batch_format="pyarrow").union(
        ds_y.map_batches(prep_y, batch_format="pyarrow")
    )

    x_cols = layout.x_out + layout.jk + layout.jn
    y_cols = layout.y_out + layout.jk + layout.jn + layout.yk

    def join_bucket(group: pa.Table) -> pa.Table:
        side = group.column("__side")
        x_t = group.filter(pc.equal(side, 0)).select(x_cols)
        y_t = group.filter(pc.equal(side, 1)).select(y_cols)
        return layout.join_tables(x_t, y_t)

    return tagged.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def _materialize_if_small(ds, limit_rows: int):
    """Read at most limit_rows+1 rows; if that is everything, return the
    whole side as one Arrow table (the broadcast build side)."""
    import ray

    head = ds.limit(limit_rows + 1).materialize()
    if head.count() <= limit_rows:
        tables = ray.get(head.to_arrow_refs())
        tables = [t for t in tables if t.num_rows] or tables[:1]
        return pa.concat_tables(tables).combine_chunks() if tables else None
    return None


def hash_join(ds_x, ds_y, on=None, how: str = "inner", *,
              num_buckets: int = DEFAULT_NUM_BUCKETS,
              broadcast_limit_rows: int = DEFAULT_BROADCAST_LIMIT_ROWS,
              na_matches: str = "na",
              x_schema: pa.Schema | None = None,
              y_schema: pa.Schema | None = None,
              salt: SaltSpec | None = None):
    """Exact distributed join of two Datasets (all six dplyr join types).

    Strategy: broadcast the right side when it fits
    (inner/left/semi/anti), else a single co-partitioning hash shuffle.
    ``x_schema``/``y_schema`` may be supplied to avoid the (partial
    execution) cost of ``ds.schema()`` on derived datasets. ``salt``
    (a ``SaltSpec``, see ``detect_salt_spec``) spreads hot keys across
    sub-buckets in the partitioned path; ``bloom_join`` wires it
    automatically from its planner sample.
    """
    import ray

    if how not in JOIN_TYPES:
        raise ValueError(f"Invalid join type '{how}'")
    if na_matches not in ("na", "never"):
        raise ValueError("na_matches must be 'na' or 'never'")
    if x_schema is None:
        x_schema = _to_arrow_schema(ds_x.schema())
    if y_schema is None:
        y_schema = _to_arrow_schema(ds_y.schema())
    spec = resolve_on(list(x_schema.names), list(y_schema.names), on)
    layout = _JoinLayout(x_schema, y_schema, spec, how)
    layout._x_types = [x_schema.field(c).type for c in layout.x_names]
    layout._y_types = [y_schema.field(c).type for c in layout.keep_y]

    if how in ("inner", "left", "semi", "anti") and broadcast_limit_rows > 0:
        y_all = _materialize_if_small(ds_y, broadcast_limit_rows)
        if y_all is not None:
            y_prep = layout.y_table(y_all, na_matches)
            return _broadcast_join(ds_x, ray.put(y_prep), layout, na_matches)
    return _partitioned_join(ds_x, ds_y, layout, na_matches, num_buckets,
                             salt=salt)


def _to_arrow_schema(schema) -> pa.Schema:
    base = getattr(schema, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    if isinstance(schema, pa.Schema):
        return schema
    try:
        return pa.schema([pa.field(n, t) for n, t in zip(schema.names, schema.types)])
    except (TypeError, pa.ArrowInvalid):
        raise TypeError(
            "could not derive an Arrow schema for this Dataset (pandas "
            "extension dtypes?) — create it from Arrow data, e.g. "
            "ray.data.from_arrow(pa.Table.from_pandas(df))"
        )


# --------------------------------------------------------------------------
# bloom_join — the flagship two-pass pipeline
# --------------------------------------------------------------------------

class BloomJoinResult:
    """(dataset, report) pair; iterate/consume ``dataset`` then call
    ``report.finalize()`` for runtime counters."""

    def __init__(self, dataset, report: JoinReport):
        self.dataset = dataset
        self.report = report

    def __iter__(self):
        yield self.dataset
        yield self.report


def _plan_stats(ds, cols, *, per_block: int = 4096,
                sample_cap: int = DISTINCT_SAMPLE_LIMIT, p: int = 14):
    """ONE streaming pass → (row_count, distinct_estimate, key-hash
    sample): per block, a row count, an HLL partial over the 64-bit key
    hashes, and an evenly-spaced in-block sample (proportional to block
    size). Replaces the separate ``count()`` + head-``limit()`` sample
    passes — a head sample is badly biased on key-sorted/partitioned
    inputs (the reference samples evenly spaced, ``R/bloomjoin.R:234``);
    per-block spacing restores that distribution-agnostic behavior, and
    the HLL gives an unbiased distinct estimate at any sort order."""
    from ..functions.keys import hash_keys64
    from ..state.base import merge_all, sketch_from_bytes
    from ..state.hll import SparseHll

    cols = list(cols)

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"n": pa.array([], type=pa.int64()),
                             "state": pa.array([], type=pa.large_binary()),
                             "sample": pa.array([], type=pa.large_binary())})
        h64 = hash_keys64(batch, cols)
        sk = SparseHll.from_hashes(np.unique(h64), p, 4096)
        step = max(1, n // per_block)
        samp = h64[::step]
        return pa.table({"n": pa.array([n], type=pa.int64()),
                         "state": pa.array([sk.to_bytes()], type=pa.large_binary()),
                         "sample": pa.array([samp.tobytes()], type=pa.large_binary())})

    rows = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow").take_all()
    if not rows:
        return 0, 0, np.empty(0, dtype=np.uint64)
    n_total = int(sum(r["n"] for r in rows))
    est = merge_all(sketch_from_bytes(bytes(r["state"])) for r in rows).estimate()
    distinct = min(n_total, max(1, int(round(est)))) if n_total else 0
    sample = np.concatenate([np.frombuffer(bytes(r["sample"]), dtype=np.uint64)
                             for r in rows])
    if len(sample) > sample_cap:
        sample = sample[::int(np.ceil(len(sample) / sample_cap))]
    return n_total, distinct, sample


def bloom_join(ds_x, ds_y, on=None, how: str = "inner", *,
               engine: str = "auto", prefilter_side: str = "auto",
               fpr: float = 0.01, n_hint=None,
               num_buckets: int = DEFAULT_NUM_BUCKETS,
               broadcast_limit_rows: int = DEFAULT_BROADCAST_LIMIT_ROWS,
               na_matches: str = "na",
               max_filter_bits: int = 1 << 33,
               skip_estimation: bool = False,
               salt_hot="auto",
               verbose: bool = False) -> BloomJoinResult:
    """dplyr-equivalent join with an optional Bloom pre-filter
    (reference top-level API, ``R/bloomjoin.R:62-124``).

    Two-pass Ray pipeline when the planner elects to prefilter: the build
    side streams through a ``map_batches`` stage emitting per-block Bloom
    partials (adaptively raw unique key hashes when cheaper), partials
    tree-merge into one filter with the globally-decided ``(m, k)``, the
    merged filter is ``ray.put`` once and every probe-side task filters its
    block against it; the surviving rows feed the exact join.

    ``max_filter_bits`` caps what will be broadcast (default 2^33 bits =
    1 GiB); a plan whose filter would exceed it falls back to the plain
    join — the reference's 2^40-bit cap is a single-process memory cap, a
    cluster must also bound the per-node broadcast.
    """
    import ray

    if how not in JOIN_TYPES:
        raise ValueError(f"Invalid join type '{how}'")
    if not (0.0 < fpr < 1.0):
        raise ValueError("'fpr' must be strictly between 0 and 1")

    x_schema = _to_arrow_schema(ds_x.schema())
    y_schema = _to_arrow_schema(ds_y.schema())
    spec = resolve_on(list(x_schema.names), list(y_schema.names), on)

    hints = normalize_n_hint(n_hint)
    if skip_estimation:
        # static planning for known shapes: NO input passes at all (no
        # count(), no sampling) — at scale the planner must not scan in
        # the driver's hot path. Requires n_hint; row counts are taken
        # from the hints too (rows ≈ distinct for planning purposes) and
        # selectivity is assumed favorable — the planner's skip
        # heuristics then rely on the structural rules only.
        if hints["x"] is None or hints["y"] is None:
            raise ValueError("skip_estimation=True requires n_hint for both sides")
        sample_x = sample_y = np.empty(0, dtype=np.int32)
        distinct_x = n_x = int(hints["x"])
        distinct_y = n_y = int(hints["y"])
    else:
        # one combined stats pass per side: row count + HLL distinct +
        # evenly-spaced key sample (unbiased on sorted inputs, unlike the
        # head-limit sample; see _plan_stats)
        n_x, hll_x, sample_x = _plan_stats(ds_x, spec.x_cols)
        n_y, hll_y, sample_y = _plan_stats(ds_y, spec.y_cols)
        distinct_x = int(round(hints["x"])) if hints["x"] is not None else hll_x
        distinct_y = int(round(hints["y"])) if hints["y"] is not None else hll_y

    if isinstance(salt_hot, SaltSpec):
        salt = salt_hot
    elif salt_hot == "auto":
        # hot-key detection from the same planner samples: a key whose
        # row share would overload one reducer gets spread/replicated
        salt = detect_salt_spec(sample_x, sample_y, n_x, n_y, how, num_buckets)
    else:
        salt = None

    plan = plan_prefilter(how, engine, prefilter_side, n_x, n_y,
                          distinct_x, distinct_y, fpr, sample_x, sample_y)
    report = JoinReport(**{k: v for k, v in plan.metadata.items()
                           if k in JoinReport.__dataclass_fields__})
    report.extra = {k: v for k, v in plan.metadata.items()
                    if k not in JoinReport.__dataclass_fields__}

    def plain() -> BloomJoinResult:
        joined = hash_join(ds_x, ds_y, on, how, num_buckets=num_buckets,
                           broadcast_limit_rows=broadcast_limit_rows,
                           na_matches=na_matches,
                           x_schema=x_schema, y_schema=y_schema, salt=salt)
        return BloomJoinResult(joined, report)

    if not plan.use_prefilter:
        if verbose:
            print(f"Skipping Bloom pre-filter: {report.reason or 'heuristic disabled'}")
        return plain()

    engine_used = plan.metadata.get("engine", "bloom")
    if engine_used == "fuse":
        # xor filters aren't mergeable: the build gathers every distinct
        # key hash (8 bytes each) in the driver. Budget BOTH that gather
        # and the resulting table against max_filter_bits; oversized
        # builds fall back to the mergeable bloom engine.
        from ..state.xorfuse import fingerprint_bits_for

        fp_bits = fingerprint_bits_for(fpr)
        fuse_bits = int(plan.expected_elements * 1.23 * fp_bits) + 512
        gather_bits = plan.expected_elements * 64
        if max(fuse_bits, gather_bits) > max_filter_bits:
            engine_used = "bloom"
            report.extra["engine"] = "bloom"
            report.extra["fuse_fallback"] = (
                "build-side distinct keys exceed the fuse gather budget; "
                "using the mergeable bloom engine")

    def size_bloom():
        """bloom sizing + broadcast-budget check; None ⇒ plain join."""
        mb, kk = bloom_sizing(plan.expected_elements, fpr)
        if mb > max_filter_bits:
            report.bloom_filter_used = False
            report.reason = (f"filter of {mb} bits exceeds broadcast budget "
                             f"({max_filter_bits}); falling back to plain join")
            return None
        report.bloom_m_bits, report.bloom_k = mb, kk
        return mb, kk

    if engine_used == "bloom":
        sized = size_bloom()
        if sized is None:
            return plain()
        m_bits, k = sized

    if plan.target == "x":
        build_ds, build_cols = ds_y, spec.y_cols
        probe_ds, probe_cols = ds_x, spec.x_cols
    else:
        build_ds, build_cols = ds_x, spec.x_cols
        probe_ds, probe_cols = ds_y, spec.y_cols

    counter = make_prune_counter()
    report._counter = counter
    if engine_used == "fuse":
        from ..stages.bloom_stages import build_fuse_filter, fuse_probe_fn

        # re-check the ACTUAL gathered key count against the budget —
        # plan.expected_elements is a sample estimate and may undercount
        fuse = build_fuse_filter(build_ds, list(build_cols), fpr,
                                 max_bits=max_filter_bits)
        if fuse is None:
            engine_used = "bloom"
            report.extra["engine"] = "bloom"
            report.extra["fuse_fallback"] = (
                "actual build-side distinct keys exceeded the fuse gather "
                "budget; using the mergeable bloom engine")
            sized = size_bloom()
            if sized is None:
                return plain()
            m_bits, k = sized
        else:
            report.bloom_m_bits, report.bloom_k = fuse.size_bits, 3
            report.extra.update({"fuse_fp_bits": fuse.fingerprint_bits,
                                 "fuse_n_keys": fuse.n_keys})
    if engine_used == "fuse":
        filter_ref = ray.put(fuse)
        probe = fuse_probe_fn(filter_ref, list(probe_cols), counter)
        if verbose:
            print(f"Fuse (xor) prefilter on '{plan.target}' side: "
                  f"{fuse.size_bits} bits, fp={fuse.fingerprint_bits}")
    else:
        bloom = build_bloom_filter(build_ds, list(build_cols),
                                   plan.expected_elements, fpr, m_bits, k)
        # free planner feedback from the merged filter (one driver-side
        # popcount, no data pass): how full it is and the Swamidass–Baldi
        # distinct estimate — a sanity check on expected_elements
        report.extra["bloom_fill_ratio"] = round(bloom.fill_ratio(), 6)
        report.extra["bloom_distinct_estimate"] = bloom.estimate_cardinality()
        filter_ref = ray.put(bloom)
        probe = bloom_probe_fn(filter_ref, list(probe_cols), counter)
        if verbose:
            print(f"Bloom prefilter on '{plan.target}' side: m={m_bits} bits, k={k}")
    pruned = probe_ds.map_batches(probe, batch_format="pyarrow")

    if plan.target == "x":
        joined = hash_join(pruned, ds_y, on, how, num_buckets=num_buckets,
                           broadcast_limit_rows=broadcast_limit_rows,
                           na_matches=na_matches,
                           x_schema=x_schema, y_schema=y_schema, salt=salt)
    else:
        joined = hash_join(ds_x, pruned, on, how, num_buckets=num_buckets,
                           broadcast_limit_rows=broadcast_limit_rows,
                           na_matches=na_matches,
                           x_schema=x_schema, y_schema=y_schema, salt=salt)
    return BloomJoinResult(joined, report)


def cross_join(ds_left, ds_right, *, max_right_rows: int = 100_000,
               out_batch_rows: int = 65_536):
    """SQL CROSS JOIN — every left row paired with every right row.
    The right side must be SMALL (≤ ``max_right_rows``; a parameter
    grid, a label set, a prompt list): it is gathered once, shipped via
    one ``ray.put`` and read from the closure in every map task, so the
    left side streams block-by-block and nothing else shuffles — the
    broadcast-nested-loop plan every engine picks for tiny-×-huge
    products. Raises when the right side exceeds the cap (a genuine
    large×large cross product has no scale-safe plan) or when column
    names collide (rename first, as in SQL you'd alias).

    Output arrives in ≤ ``out_batch_rows``-row batches (the UDF yields
    chunks), so left-block × right-row inflation never materializes one
    giant batch."""
    import ray

    from .asof import _schema_of

    right = _materialize_if_small(ds_right, max_right_rows)
    if right is None:
        raise ValueError(f"cross_join right side exceeds {max_right_rows} "
                         "rows; cross products only scale with a small "
                         "broadcast side")
    left_schema = _schema_of(ds_left)
    overlap = set(left_schema.names) & set(right.column_names)
    if overlap:
        raise ValueError(f"cross_join column collision: {sorted(overlap)}; "
                         "rename before joining")
    nr = right.num_rows
    rref = ray.put(right)

    def product(batch: pa.Table):
        if batch.num_rows == 0 or nr == 0:
            r = ray.get(rref)
            empty = pa.table({**{c: batch.column(c).slice(0, 0)
                                 for c in batch.column_names},
                              **{c: r.column(c).slice(0, 0)
                                 for c in r.column_names}})
            yield empty
            return
        r = ray.get(rref)
        rows_per_chunk = max(1, out_batch_rows // nr)
        for off in range(0, batch.num_rows, rows_per_chunk):
            sub = batch.slice(off, rows_per_chunk)
            nl = sub.num_rows
            li = np.repeat(np.arange(nl, dtype=np.int64), nr)
            ri = np.tile(np.arange(nr, dtype=np.int64), nl)
            lt = sub.take(pa.array(li))
            rt = r.take(pa.array(ri))
            cols = {c: lt.column(c) for c in lt.column_names}
            cols.update({c: rt.column(c) for c in rt.column_names})
            yield pa.table(cols)

    return ds_left.map_batches(product, batch_format="pyarrow")
