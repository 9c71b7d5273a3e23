"""Fuzzy (edit-distance) string join — record linkage on short keys.

``edit_distance_join`` finds all cross-dataset pairs whose BYTE-level
Levenshtein distance is ≤ ``max_dist`` (the semantics of DuckDB's /
Postgres fuzzystrmatch's ``levenshtein``, so an ANSI-SQL oracle pins it
exactly). The shape is the similarity-join standard:

* candidate generation — symmetric-deletion blocking (the SymSpell
  scheme): every string emits the polynomial hashes of all its
  ≤ ``max_dist``-byte-deletion variants (never materialized — see
  ``functions/editdist.py``); if ed(a, b) ≤ d the two share a variant
  (delete, per side, the ≤ d bytes an optimal alignment edits), so
  hash-bucket collisions are a COMPLETE candidate superset — hash
  collisions only add false candidates, never lose pairs;
* pair harvest — ONE packed bucketed exchange on the variant hash;
  inside each task the rows are lexsorted and collision segments
  expand via ``triangle_indices`` (the MinHash-LSH idiom), restricted
  to cross-side (join mode) or id_a < id_b (self mode);
* verify — candidates are deduped, each side's string ships back via
  the engine's ``hash_join`` (broadcast when it fits), and one
  vectorized Myers bit-parallel pass computes TRUE distances; only
  ``dist ≤ max_dist`` survives.

Scale shape: variant volume is rows × O(L·d²/2) hash+id rows (L ≤ 64
bytes — names, codes, titles; raise otherwise), candidate volume is
bounded by true matches + hash-collision noise, and only candidate ids
(not strings) flow through the pair exchange. No stage is all-pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SIDE = "_ed_side"
_VH = "_ed_vh"
_SA = "_ed_sa"
_SB = "_ed_sb"


def _variant_stage(col: str, id_col: str, d: int, side: int | None,
                   max_bytes: int):
    from ..functions.editdist import deletion_variant_hashes

    def fn(batch: pa.Table) -> pa.Table:
        strings = batch.column(col)
        strings = (strings.combine_chunks()
                   if isinstance(strings, pa.ChunkedArray) else strings)
        mask = np.asarray(strings.is_valid())
        keep = np.nonzero(mask)[0]
        sub = batch.take(pa.array(keep)) if len(keep) != batch.num_rows \
            else batch
        h, idx = deletion_variant_hashes(sub.column(col), d,
                                         max_bytes=max_bytes)
        ids = sub.column(id_col)
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) \
            else ids
        cols = {_VH: pa.array(h.view(np.int64)),
                id_col: ids.take(pa.array(idx))}
        if side is not None:
            cols[_SIDE] = pa.array(
                np.full(len(h), side, dtype=np.int8))
        return pa.table(cols)

    return fn


def _pair_reduce(group: pa.Table, id_col: str, joined: bool) -> pa.Table:
    """Bucket-union-invariant candidate harvest: lexsort by (vhash
    [, side], id), keep-first per (segment[, side], id), expand
    surviving i<j pairs, keep cross-side (join) / ascending-id (self)."""
    import pyarrow.compute as pc

    from .buckets import triangle_indices

    id_type = group.schema.field(id_col).type

    def empty():
        return pa.table({"id_a": pa.array([], type=id_type),
                         "id_b": pa.array([], type=id_type)})

    n = group.num_rows
    if n == 0:
        return empty()
    sort_keys = [(_VH, "ascending")]
    if joined:
        sort_keys.append((_SIDE, "ascending"))
    sort_keys.append((id_col, "ascending"))
    order = np.asarray(pc.sort_indices(group, sort_keys=sort_keys))
    g = group.take(pa.array(order))
    vh = np.asarray(g.column(_VH), dtype=np.int64)
    new_seg = np.empty(n, dtype=bool)
    new_seg[0] = True
    new_seg[1:] = vh[1:] != vh[:-1]
    ids = g.column(id_col).combine_chunks()
    sides = np.asarray(g.column(_SIDE)) if joined else None
    keep = np.empty(n, dtype=bool)
    keep[0] = True
    if n > 1:
        same_id = np.asarray(pc.equal(ids.slice(1), ids.slice(0, n - 1)))
        if sides is not None:
            same_id &= sides[1:] == sides[:-1]
        keep[1:] = new_seg[1:] | ~same_id
    kept = np.nonzero(keep)[0]
    seg_of_kept = (np.cumsum(new_seg) - 1)[kept]
    ksizes = np.bincount(seg_of_kept)
    kbounds = np.concatenate([[0], np.cumsum(ksizes)])
    if not (ksizes > 1).any():
        return empty()
    ai, bi = triangle_indices(kbounds, ksizes > 1)
    ka, kb = kept[ai], kept[bi]
    if sides is not None:
        cross = sides[ka] != sides[kb]
        ka, kb = ka[cross], kb[cross]  # side 0 sorts first → ka is A
        if ka.size == 0:
            return empty()
    # self mode: ids ascend within a segment → id_a < id_b canonical
    return pa.table({"id_a": ids.take(pa.array(ka)),
                     "id_b": ids.take(pa.array(kb))})


def edit_distance_join(ds_a, ds_b=None, *, col: str = "name",
                       id_col: str = "id", max_dist: int = 1,
                       max_bytes: int = 64, keep_strings: bool = False):
    """All pairs within byte-Levenshtein ``max_dist`` (∈ {0, 1, 2}) on
    ``col`` — ``ds_b=None`` self-joins one dataset (``id_a < id_b``),
    otherwise ``id_a`` comes from ``ds_a`` and ``id_b`` from ``ds_b``
    (both sides share the ``id_col``/``col`` names; rename upstream).
    Null strings never match. Returns Dataset[id_a, id_b, dist] (plus
    ``str_a``/``str_b`` when ``keep_strings``)."""
    import pyarrow.compute as pc

    from ..functions.editdist import levenshtein_batch
    from .asof import _schema_of
    from .buckets import dedupe_pairs, packed_bucket_map_groups
    from .join import hash_join

    if max_dist not in (0, 1, 2):
        raise ValueError("edit_distance_join supports max_dist in {0,1,2}")
    joined = ds_b is not None
    sel = [id_col, col]
    if joined:
        parts = (ds_a.select_columns(sel)
                 .map_batches(_variant_stage(col, id_col, max_dist, 0,
                                             max_bytes),
                              batch_format="pyarrow")
                 .union(ds_b.select_columns(sel)
                        .map_batches(_variant_stage(col, id_col, max_dist,
                                                    1, max_bytes),
                                     batch_format="pyarrow")))
    else:
        parts = ds_a.select_columns(sel).map_batches(
            _variant_stage(col, id_col, max_dist, None, max_bytes),
            batch_format="pyarrow")
    cands = packed_bucket_map_groups(
        parts, [_VH], lambda g: _pair_reduce(g, id_col, joined))
    cands = dedupe_pairs(cands)

    def strings_of(ds, out_name):
        def ren(b: pa.Table) -> pa.Table:
            return b.rename_columns([id_col, out_name])

        return ds.select_columns(sel).map_batches(
            ren, batch_format="pyarrow")

    a_schema = _schema_of(ds_a.select_columns(sel))
    id_f, col_f = a_schema.field(id_col), a_schema.field(col)
    cand_schema = pa.schema([pa.field("id_a", id_f.type),
                             pa.field("id_b", id_f.type)])
    sa_schema = pa.schema([id_f, pa.field(_SA, col_f.type)])
    sb_schema = pa.schema([id_f, pa.field(_SB, col_f.type)])
    witha = hash_join(cands, strings_of(ds_a, _SA), {"id_a": id_col},
                      "inner", x_schema=cand_schema, y_schema=sa_schema)
    withb = hash_join(witha, strings_of(ds_b if joined else ds_a, _SB),
                      {"id_b": id_col}, "inner",
                      x_schema=cand_schema.append(pa.field(_SA, col_f.type)),
                      y_schema=sb_schema)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            out = batch.append_column("dist",
                                      pa.array([], type=pa.int64()))
        else:
            dist = levenshtein_batch(batch.column(_SA), batch.column(_SB))
            out = batch.append_column("dist", pa.array(dist))
        out = out.filter(pc.less_equal(out.column("dist"), max_dist))
        if keep_strings:
            return out.rename_columns(
                ["id_a", "id_b", "str_a", "str_b", "dist"])
        return out.select(["id_a", "id_b", "dist"])

    return withb.map_batches(verify, batch_format="pyarrow")


def fuzzy_dedup(ds, *, col: str = "name", id_col: str = "id",
                max_dist: int = 1, score_col: str | None = None,
                max_bytes: int = 64):
    """Entity-level fuzzy dedup: cluster rows whose ``col`` values are
    within byte-Levenshtein ``max_dist`` (transitively — the usual
    record-linkage closure) and keep ONE row per cluster — the
    highest-``score_col`` member (min id on ties) or the min-id member.
    Pure composition of the engine's own operators:
    ``edit_distance_join`` (self mode) → ``dedup_by_pairs`` (driver
    union-find below its pair limit, distributed min-label propagation
    above). Unmatched rows survive unchanged."""
    from .dedup import dedup_by_pairs

    pairs = edit_distance_join(ds, col=col, id_col=id_col,
                               max_dist=max_dist, max_bytes=max_bytes)
    return dedup_by_pairs(ds, pairs, id_col, score_col=score_col)
