"""Deduplication pipelines for training-data curation.

* ``exact_dedup`` — hash-partition on the 128-bit sha1 content-hash
  pair, one vectorized keep-first (min order column) per bucket. Two
  distinct documents merge only if both 64-bit halves collide
  (~2^-128 per pair).
* ``minhash_lsh_pairs`` / ``minhash_dedup`` — shingle → MinHash signature
  → LSH band explosion → packed (band, band_hash) bucket reduce →
  candidate pairs with signature-estimated Jaccard → threshold →
  connected components: driver union-find below ``DRIVER_PAIR_LIMIT``
  pairs, distributed min-label propagation + pointer doubling
  (``connected_components``) above it — no driver bottleneck on
  pathological pair volumes.
* ``simhash_pairs`` / ``simhash_dedup`` — 64-bit SimHash, 4×16-bit band
  buckets (Hamming ≤ 3 ⇒ at least one band equal), verified Hamming.
* ``ngram_jaccard_pairs`` — exact Jaccard via shingle-inverted-index
  co-counting, with document-frequency pruning to bound bucket blowup.

Partitioning assumption: bucket keys (content hash, band hash, shingle
hash) distribute uniformly, so the packed bucket exchanges are
balanced; hot shingles are explicitly df-pruned.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state.minhash import hamming64


# ------------------------------------------------------------- exact ----

def exact_dedup(ds, text_col: str = "text", order_col: str = "doc_id",
                num_buckets: int = 64):
    """Keep one row (min ``order_col``) per distinct ``text_col`` value.

    Scale shape: content hashes route into ``num_buckets`` buckets, ONE
    vectorized keep-first per bucket (pyarrow sort + boundary mask) —
    Python never touches individual documents. Documents are identified
    by the 128-bit sha1 hash pair, so two distinct texts merge only if
    both 64-bit halves collide (~2^-128 per pair). (The earlier
    ``groupby(content_hash)`` formulation paid one pandas call per
    distinct document.)
    """
    from ..functions.text import content_hash128

    def add_hash(batch: pa.Table) -> pa.Table:
        lo, hi = content_hash128(batch.column(text_col))
        b = (lo % np.uint64(num_buckets)).astype(np.int32)
        return (batch.append_column("__ch1", pa.array(lo.view(np.int64)))
                     .append_column("__ch2", pa.array(hi.view(np.int64)))
                     .append_column("__gbucket", pa.array(b)))

    def keep_first(group: pa.Table) -> pa.Table:
        drop = ["__ch1", "__ch2", "__gbucket"]
        if group.num_rows == 0:
            return group.drop_columns(drop)
        idx = np.asarray(pc.sort_indices(group, sort_keys=[
            ("__ch1", "ascending"), ("__ch2", "ascending"),
            (order_col, "ascending")]))
        h1 = np.asarray(group.column("__ch1"))[idx]
        h2 = np.asarray(group.column("__ch2"))[idx]
        first = np.empty(len(idx), dtype=bool)
        first[0] = True
        first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        return group.take(pa.array(idx[first])).drop_columns(drop)

    from .buckets import packed_bucket_map_groups

    return packed_bucket_map_groups(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        None, keep_first, num_buckets=num_buckets, pre_bucketed=True)


# ----------------------------------------------------------- minhash ----

class _MinHashStage:
    """Per-batch: signature per doc → one row per band
    (band, band_hash, id, signature bytes)."""

    def __init__(self, text_col, id_col, num_perm, bands, shingle_k):
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.text import shingle_hashes_batch
        from ..state.minhash import band_hashes_batch, minhash_signatures_flat

        n = batch.num_rows
        flat, offs = shingle_hashes_batch(batch.column(self.text_col), self.k)
        sigs = minhash_signatures_flat(flat, offs, self.num_perm)
        bh = band_hashes_batch(sigs, self.bands)      # (n, bands), vectorized
        idx = np.repeat(np.arange(n), self.bands)
        ids = batch.column(self.id_col)
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        # signatures as ONE contiguous buffer → fixed-size-binary column;
        # replication across bands is a C++ take, not a per-doc blob list
        width = self.num_perm * 8
        sig_arr = pa.Array.from_buffers(
            pa.binary(width), n,
            [None, pa.py_buffer(np.ascontiguousarray(sigs).tobytes())])
        return pa.table({
            "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
            "bhash": pa.array(bh.reshape(-1).view(np.int64)),
            self.id_col: ids.take(pa.array(idx)),
            "sig": sig_arr.take(pa.array(idx)),
        })


def _minhash_bucket_reduce(group: pa.Table, id_col: str, threshold: float,
                           side_col: str | None = None) -> pa.Table:
    """Fully vectorized (the SimHash idiom): ONE C++ sort by
    (bhash, band[, side], id) splits rows into collision segments with
    duplicate-id rows adjacent; a boundary mask keeps the first row per
    (segment[, side], id); ``triangle_indices`` expands every surviving
    i<j pair at once; one batched signature comparison estimates all
    Jaccards — no per-segment dict or per-pair Python appends.

    ``side_col`` switches to JOIN semantics: only pairs whose sides
    differ survive, oriented so ``id_a`` is always side 0."""
    from .buckets import triangle_indices

    id_type = group.column(id_col).type

    def empty():
        return pa.table({"id_a": pa.array([], type=id_type),
                         "id_b": pa.array([], type=id_type),
                         "est_jaccard": pa.array([], type=pa.float64())})

    n = group.num_rows
    if n == 0:
        return empty()
    sort_keys = [("bhash", "ascending"), ("band", "ascending")]
    if side_col is not None:
        sort_keys.append((side_col, "ascending"))
    sort_keys.append((id_col, "ascending"))
    order = np.asarray(pc.sort_indices(group, sort_keys=sort_keys))
    sorted_g = group.take(pa.array(order))
    bh = np.asarray(sorted_g.column("bhash"), dtype=np.int64)
    band = np.asarray(sorted_g.column("band"), dtype=np.int64)
    new_seg = np.empty(n, dtype=bool)
    new_seg[0] = True
    new_seg[1:] = (bh[1:] != bh[:-1]) | (band[1:] != band[:-1])
    ids = sorted_g.column(id_col).combine_chunks()
    sides = (np.asarray(sorted_g.column(side_col))
             if side_col is not None else None)
    # keep-first per (segment[, side], id): duplicate rows of one doc
    # are adjacent after the sort
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
    sig_col = sorted_g.column("sig").combine_chunks()
    # zero-copy (rows, num_perm) uint64 view over the fixed-width
    # signature buffer — no per-doc frombuffer
    width = sig_col.type.byte_width
    sig_mat = np.frombuffer(
        sig_col.buffers()[1], dtype=np.uint64,
        offset=sig_col.offset * width,
        count=len(sig_col) * (width // 8)).reshape(-1, width // 8)
    ai, bi = triangle_indices(kbounds, ksizes > 1)
    ka, kb = kept[ai], kept[bi]          # sorted-row positions
    if sides is not None:
        cross = sides[ka] != sides[kb]
        ka, kb = ka[cross], kb[cross]
        if ka.size == 0:
            return empty()
        # side 0 sorts before side 1 within a segment → ka IS side 0
    est = (sig_mat[ka] == sig_mat[kb]).mean(axis=1)
    hit = est >= threshold
    if not hit.any():
        return empty()
    # same-corpus: ids ascend within each segment, so id_a < id_b is
    # canonical; join mode: id_a is the side-0 (left) id
    return pa.table({"id_a": ids.take(pa.array(ka[hit])),
                     "id_b": ids.take(pa.array(kb[hit])),
                     "est_jaccard": pa.array(est[hit])})


def minhash_join(ds_a, ds_b, text_col: str = "text",
                 id_col: str = "doc_id", *, num_perm: int = 128,
                 bands: int = 16, shingle_k: int = 5,
                 threshold: float = 0.5):
    """CROSS-CORPUS near-duplicate join: candidate pairs (one id from
    each side) with signature-estimated Jaccard ≥ threshold — the
    fuzzy-join shape under snapshot-vs-snapshot dedup, train-vs-bench
    leakage sweeps beyond n-gram decontamination, and record linkage
    on text. Returns Dataset[id_a (from ``ds_a``), id_b (from
    ``ds_b``), est_jaccard].

    Same scale shape as ``minhash_lsh_pairs`` (both corpora's band
    rows hash into the same packed buckets, one lexsort per task), with
    pairs restricted to cross-side — same-corpus collisions cost the
    sort but never the quadratic pair expansion. Both sides need the
    same ``id_col`` name and type (rename upstream)."""
    from .buckets import dedupe_pairs, packed_bucket_map_groups

    stage = _MinHashStage(text_col, id_col, num_perm, bands, shingle_k)

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column("__mside", pa.array(
                np.full(b.num_rows, side, dtype=np.int8)))

        return fn

    parts = (ds_a.select_columns([id_col, text_col])
             .map_batches(stage, batch_format="pyarrow")
             .map_batches(tag(0), batch_format="pyarrow")
             .union(ds_b.select_columns([id_col, text_col])
                    .map_batches(stage, batch_format="pyarrow")
                    .map_batches(tag(1), batch_format="pyarrow")))
    pairs = packed_bucket_map_groups(
        parts, ["band", "bhash"],
        lambda g: _minhash_bucket_reduce(g, id_col, threshold,
                                         side_col="__mside"))
    # a pair can surface from several bands — dedupe (same est each time)
    return dedupe_pairs(pairs, {"est_jaccard": "min"})


def minhash_lsh_pairs(ds, text_col: str = "text", id_col: str = "doc_id", *,
                      num_perm: int = 128, bands: int = 16,
                      shingle_k: int = 5, threshold: float = 0.5):
    """Candidate near-dup pairs with signature-estimated Jaccard ≥
    threshold. Returns Dataset[id_a, id_b, est_jaccard].

    Scale shape: LSH buckets hash into 64 reduce tasks (one Python
    dispatch per task, not per bucket — there are ~n·bands buckets);
    inside a task one lexsort splits rows into equal-(band, bhash)
    segments and only multi-member segments (actual collisions) are
    touched, each scored with one vectorized all-pairs signature
    comparison."""
    from .buckets import dedupe_pairs, packed_bucket_map_groups

    def bucket_reduce(group: pa.Table) -> pa.Table:
        return _minhash_bucket_reduce(group, id_col, threshold)

    stage = _MinHashStage(text_col, id_col, num_perm, bands, shingle_k)
    pairs = packed_bucket_map_groups(
        ds.select_columns([id_col, text_col])
          .map_batches(stage, batch_format="pyarrow"),
        ["band", "bhash"], bucket_reduce)
    # a pair can surface from several bands — dedupe (same est each time)
    return dedupe_pairs(pairs, {"est_jaccard": "min"})


def _union_find_clusters(pairs: list[tuple]) -> dict:
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def connected_components(pairs_ds, *, max_rounds: int = 50):
    """Distributed connected components over a candidate-pair Dataset
    (columns ``id_a``, ``id_b``). Returns Dataset[node, label] covering
    every node that appears in a pair, with ``label`` = the min id of
    the node's component at fixpoint.

    Built on the engine's own ``hash_join``: each round (1) propagates
    the current min label across edges and takes a ``groupby(node)``
    min, then (2) pointer-jumps (``label ← label[label]``) so chains
    collapse in O(log diameter) rounds instead of O(diameter). Labels
    are ids of component members and only ever decrease, so at fixpoint
    both endpoints of every edge agree and the shared label is the
    component min. Per-round state is the label table — O(pair-graph
    nodes), never the corpus — and every exchange is a bucketed join
    or groupby, so pathological pair volumes (bot-spam / boilerplate
    blocks) no longer funnel through the driver."""
    from .aggregate import grouped_assoc_agg
    from .join import hash_join

    def fwd(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column("id_a"), "dst": b.column("id_b")})

    def rev(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column("id_b"), "dst": b.column("id_a")})

    edges = (pairs_ds.map_batches(fwd, batch_format="pyarrow")
             .union(pairs_ds.map_batches(rev, batch_format="pyarrow"))
             .materialize())

    def seed(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("src"),
                         "label": pc.min_element_wise(b.column("src"),
                                                      b.column("_cc_nmin"))})

    # round 0 for free: label[x] = min(x, neighbors(x)); min/max are
    # order-independent, so the packed grouped aggregate applies here
    # and in every propagation round below (no sort-shuffle floor)
    labels = (grouped_assoc_agg(edges, ["src"],
                                {"dst": ("min", "_cc_nmin")})
              .map_batches(seed, batch_format="pyarrow")
              .materialize())

    def msg(b: pa.Table) -> pa.Table:
        # neighbor proposals carry a null old-label; the single own-label
        # row per node carries the real one, so Max(_cc_old) per group
        # recovers it without a second join
        return pa.table({"node": b.column("dst"), "label": b.column("label"),
                         "_cc_old": pa.nulls(b.num_rows,
                                             b.column("label").type)})

    def own(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"), "label": b.column("label"),
                         "_cc_old": b.column("label")})

    def diff(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(pc.equal(b.column("label"),
                                           b.column("_cc_old"))))

    def drop_old(b: pa.Table) -> pa.Table:
        return b.drop_columns(["_cc_old"])

    def as_parent(b: pa.Table) -> pa.Table:
        return pa.table({"_cc_p": b.column("node"),
                         "_cc_plabel": b.column("label")})

    def jump(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"),
                         "label": pc.min_element_wise(b.column("label"),
                                                      b.column("_cc_plabel"))})

    for _ in range(max_rounds):
        # (1) min over {own label} ∪ {neighbor labels}, old label rides
        # along through the same groupby
        new = grouped_assoc_agg(
            hash_join(edges, labels, on={"src": "node"}, how="inner")
            .map_batches(msg, batch_format="pyarrow")
            .union(labels.map_batches(own, batch_format="pyarrow")),
            ["node"], {"label": ("min", "label"),
                       "_cc_old": ("max", "_cc_old")}).materialize()
        changed = new.map_batches(diff, batch_format="pyarrow").count()
        if changed == 0:
            return labels  # propagation is a no-op ⇒ jump would be too
        # (2) pointer doubling: label ← min(label, label[label]), twice —
        # every label is itself a node, so the left join always matches;
        # two jumps quadruple the collapsed chain depth per round
        cur = new.map_batches(drop_old, batch_format="pyarrow")
        for _ in range(2):
            parents = cur.map_batches(as_parent, batch_format="pyarrow")
            cur = (hash_join(cur, parents, on={"label": "_cc_p"},
                             how="left")
                   .map_batches(jump, batch_format="pyarrow")
                   .materialize())
        labels = cur
    raise RuntimeError(f"connected_components did not converge in "
                       f"{max_rounds} rounds")


# pair sets below this use driver union-find; above it, distributed
# min-label propagation (connected_components) + anti join
DRIVER_PAIR_LIMIT = 200_000


def dedup_by_pairs(ds, pairs_ds, id_col: str = "doc_id", *,
                   score_col: str | None = None,
                   driver_pair_limit: int = DRIVER_PAIR_LIMIT):
    """Survivors after clustering candidate pairs: keep ONE row of each
    connected component — the highest-``score_col`` member (min id on
    ties) when a score column is given, else the min-id member; unpaired
    rows survive unchanged. ``score_col`` is the "keep the best copy,
    not an arbitrary one" curation policy (longest / highest-quality
    member of each near-dup cluster).

    Small pair sets (≤ ``driver_pair_limit``) cluster via driver
    union-find with a broadcast drop set — one `ray.put`, zero shuffles
    (with a score, one extra column-pruned pass collects the clustered
    ids' scores, bounded by 2 × pairs). Larger pair sets (bot-spam /
    boilerplate corpora where pairs are NOT ≪ corpus) run distributed
    min-label propagation; the winner per label comes from the packed
    ``topk_rows_per_key`` reduce and the drop applies as anti joins, so
    nothing whole-graph ever reaches the driver."""
    import ray

    pairs = pairs_ds.select_columns(["id_a", "id_b"]).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ds
    if n_pairs <= driver_pair_limit:
        pair_rows = pairs.take_all()
        edges = [(r["id_a"], r["id_b"]) for r in pair_rows]
        cluster = _union_find_clusters(edges)
        if score_col is None:
            drop = {x for x, root in cluster.items() if root != x}
        else:
            # _union_find_clusters maps only NON-ROOT nodes; the winner
            # must compete among every member, roots included
            members = {x for e in edges for x in e}
            root_of = {x: cluster.get(x, x) for x in members}
            ids_ref = ray.put(pa.array(sorted(members)))

            def pick(batch: pa.Table) -> pa.Table:
                s = ray.get(ids_ref)
                return (batch.select([id_col, score_col])
                        .filter(pc.is_in(batch.column(id_col),
                                         value_set=s)))

            scored = ds.map_batches(pick,
                                    batch_format="pyarrow").take_all()
            best: dict = {}  # root -> (score, id)
            ninf = float("-inf")
            for r in scored:
                root = root_of[r[id_col]]
                sc = r[score_col]
                if sc is None or sc != sc:  # null / NaN never wins
                    sc = ninf
                cur = best.get(root)
                if (cur is None or sc > cur[0]
                        or (sc == cur[0] and r[id_col] < cur[1])):
                    best[root] = (sc, r[id_col])
            winners = {i for _, i in best.values()}
            drop = members - winners
        if not drop:
            return ds
        drop_ref = ray.put(pa.array(sorted(drop)))

        def keep(batch: pa.Table) -> pa.Table:
            d = ray.get(drop_ref)  # zero-copy Arrow array from the store
            mask = pc.invert(pc.is_in(batch.column(id_col), value_set=d))
            return batch.filter(mask)

        return ds.map_batches(keep, batch_format="pyarrow")

    from .join import hash_join

    labels = connected_components(pairs)

    if score_col is not None:
        from .aggregate import topk_rows_per_key

        scored = hash_join(labels, ds.select_columns([id_col, score_col]),
                           on={"node": id_col})
        winners = topk_rows_per_key(
            scored, "label",
            [(score_col, "descending"), ("node", "ascending")], 1)
        win_ids = winners.map_batches(
            lambda t: pa.table({"_cc_win": t.column("node")}),
            batch_format="pyarrow")
        drop_ds = hash_join(labels, win_ids, on={"node": "_cc_win"},
                            how="anti")
        drop_ds = drop_ds.map_batches(
            lambda t: pa.table({"_cc_dropid": t.column("node")}),
            batch_format="pyarrow")
        return hash_join(ds, drop_ds, on={id_col: "_cc_dropid"},
                         how="anti")

    def non_roots(b: pa.Table) -> pa.Table:
        sub = b.filter(pc.invert(pc.equal(b.column("node"),
                                          b.column("label"))))
        return pa.table({"_cc_dropid": sub.column("node")})

    drop_ds = labels.map_batches(non_roots, batch_format="pyarrow")
    return hash_join(ds, drop_ds, on={id_col: "_cc_dropid"}, how="anti")


def minhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id", *,
                  threshold: float = 0.7, num_perm: int = 128,
                  bands: int = 16, shingle_k: int = 5,
                  score_col: str | None = None):
    """Near-dup dedup: keep one representative per MinHash cluster —
    the highest-``score_col`` member when given, else the min id."""
    pairs = minhash_lsh_pairs(ds, text_col, id_col, num_perm=num_perm,
                              bands=bands, shingle_k=shingle_k,
                              threshold=threshold)
    return dedup_by_pairs(ds, pairs, id_col, score_col=score_col)


# ----------------------------------------------------------- simhash ----

class _SimHashStage:
    """Per-batch: 64-bit SimHash per doc → 4 rows (16-bit band buckets).

    Fully vectorized: one Arrow tokenize+FNV pass over the whole batch
    (``batch_token_hashes``) and a 64-cumsum SimHash
    (``simhash64_batch``) — no per-doc or per-token Python hashing."""

    def __init__(self, text_col, id_col):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.text import batch_token_hashes, simhash64_batch

        th, offs = batch_token_hashes(batch.column(self.text_col))
        fps = simhash64_batch(th, offs)
        n = len(fps)
        fp_rep = np.repeat(fps, 4)
        shift = np.tile((np.arange(4) * 16).astype(np.uint64), n)
        bucket = ((fp_rep >> shift) & np.uint64(0xFFFF)).astype(np.int32)
        ids = batch.column(self.id_col)
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        return pa.table({
            "band": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
            "bucket": pa.array(bucket),
            self.id_col: ids.take(pa.array(np.repeat(np.arange(n), 4))),
            "fp": pa.array(fp_rep.view(np.int64)),
        })


def simhash_pairs(ds, text_col: str = "text", id_col: str = "doc_id", *,
                  max_hamming: int = 3):
    """Verified SimHash near-dup pairs: Dataset[id_a, id_b, hamming].

    Same 64-task bucketed-segment shape as ``minhash_lsh_pairs`` — one
    Python dispatch per reduce task, not per (band, bucket) LSH cell."""
    from .buckets import (numeric_segments, packed_bucket_map_groups,
                          dedupe_pairs)

    def bucket_reduce(group: pa.Table) -> pa.Table:
        id_type = group.column(id_col).type

        def empty():
            return pa.table({"id_a": pa.array([], type=id_type),
                             "id_b": pa.array([], type=id_type),
                             "hamming": pa.array([], type=pa.int32())})

        if group.num_rows == 0:
            return empty()
        from .buckets import triangle_indices

        band = np.asarray(group.column("band"), dtype=np.int64)
        bk = np.asarray(group.column("bucket"), dtype=np.int64)
        order, bounds = numeric_segments([bk, band])
        sizes = np.diff(bounds)
        # every within-segment pair at once: one triangle expansion, one
        # vectorized Hamming pass, canonical (min, max) id ordering —
        # no per-segment Python (dedupe_pairs collapses duplicate-row
        # and multi-band repeats downstream)
        sorted_g = group.take(pa.array(order))
        ids = sorted_g.column(id_col).combine_chunks()
        fps = np.asarray(sorted_g.column("fp"), dtype=np.int64).view(np.uint64)
        ai, bi = triangle_indices(bounds, sizes > 1)
        if not ai.size:
            return empty()
        hd = hamming64(fps[ai], fps[bi])
        hit = hd <= max_hamming
        if not hit.any():
            return empty()
        a_ids = ids.take(pa.array(ai[hit]))
        b_ids = ids.take(pa.array(bi[hit]))
        out = pa.table({
            "id_a": pc.min_element_wise(a_ids, b_ids),
            "id_b": pc.max_element_wise(a_ids, b_ids),
            "hamming": pa.array(hd[hit].astype(np.int32)),
        })
        return out.filter(pc.not_equal(a_ids, b_ids))

    pairs = packed_bucket_map_groups(
        ds.select_columns([id_col, text_col])
          .map_batches(_SimHashStage(text_col, id_col),
                       batch_format="pyarrow"),
        ["band", "bucket"], bucket_reduce)
    return dedupe_pairs(pairs, {"hamming": "min"})


def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id", *,
                  max_hamming: int = 3, score_col: str | None = None):
    pairs = simhash_pairs(ds, text_col, id_col, max_hamming=max_hamming)
    return dedup_by_pairs(ds, pairs, id_col, score_col=score_col)


def semdedup(ds, *, threshold: float = 0.95, id_col: str = "vec_id",
             vec_col: str = "embedding", n_clusters: int = 16,
             sample_rows: int = 4096, seed: int = 0x5EED,
             centroids=None, score_col: str | None = None):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): drop semantic
    near-duplicates by k-means-clustering the embedding column and
    keeping one representative of each within-cluster cosine-≥-threshold
    component. ``score_col`` picks the best member (e.g. a quality
    score) instead of the min-id one; pass pre-fitted ``centroids``
    (from ``kmeans_fit``) for stable cells across corpus snapshots.
    Survivors stream back as full rows — nothing whole-corpus reaches
    the driver (pairs → ``dedup_by_pairs``'s bounded drop machinery)."""
    from .ann import semdedup_pairs

    pairs = semdedup_pairs(ds, threshold=threshold, id_col=id_col,
                           vec_col=vec_col, n_clusters=n_clusters,
                           sample_rows=sample_rows, seed=seed,
                           centroids=centroids)
    return dedup_by_pairs(ds, pairs, id_col, score_col=score_col)


# ------------------------------------------------- exact n-gram Jaccard ----

def ngram_jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id", *,
                        shingle_k: int = 5, threshold: float = 0.5,
                        max_df: int = 256, shingle_fn=None,
                        ngram: str = "char"):
    """Exact-Jaccard ≥ threshold pairs over the **df-pruned shingle
    universe** via an inverted index.

    Per-batch explode (shingle, id); shingles occurring in > ``max_df``
    docs are dropped (df-pruning — a shingle shared by everything carries
    no near-dup signal but would blow the bucket up quadratically). Both
    the co-count AND the per-doc set sizes are computed over the same
    pruned universe, so the reported Jaccard is exact for that universe
    (a pair sharing ONLY pruned shingles is not reported, by design).

    Scale shape: one ``groupby(shingle)`` pass emits, per surviving
    shingle, its candidate pairs plus one (id, id) self-pair per posting;
    a single pair-count aggregate then yields co-counts for real pairs
    and pruned-universe sizes from the self-pairs — no driver-side
    materialization of any per-doc structure. Sizes join back onto the
    candidate pairs with the engine's own hash join (broadcast when
    small).

    ``ngram`` selects the built-in vectorized shingle kernel:
    ``"char"`` (char ``shingle_k``-shingles, the default) or ``"word"``
    (word ``shingle_k``-grams — the right granularity for small-vocab
    corpora where every char shingle is df-pruned away). A custom
    ``shingle_fn(text) -> uint64 set`` overrides both; passing
    ``word_ngram_hashes`` (bare or ``functools.partial``) is detected
    and routed to the batch word kernel rather than the per-doc loop.
    Returns Dataset[id_a, id_b, jaccard].
    """
    if ngram not in ("char", "word"):
        raise ValueError("ngram must be 'char' or 'word'")
    word_n = shingle_k if (shingle_fn is None and ngram == "word") else None
    if shingle_fn is not None:
        from functools import partial as _partial

        from ..functions.text import word_ngram_hashes as _wng

        if shingle_fn is _wng:
            word_n, shingle_fn = 3, None            # the fn's default n
        elif (isinstance(shingle_fn, _partial) and shingle_fn.func is _wng
                and not shingle_fn.args):
            word_n = shingle_fn.keywords.get("n", 3)
            shingle_fn = None

    def explode(batch: pa.Table) -> pa.Table:
        """(shingle, id) posting rows. Both built-in kernels (char
        shingles / word n-grams) are batch-vectorized; only a truly
        custom ``shingle_fn`` falls back to a per-doc loop (its contract
        is one doc → one uint64 set)."""
        ids = batch.column(id_col).combine_chunks() \
            if isinstance(batch.column(id_col), pa.ChunkedArray) \
            else batch.column(id_col)
        if shingle_fn is None:
            from ..functions.text import (shingle_hashes_batch,
                                          word_ngram_hashes_batch)

            if word_n is not None:
                flat, offs = word_ngram_hashes_batch(
                    batch.column(text_col), word_n)
            else:
                flat, offs = shingle_hashes_batch(
                    batch.column(text_col), shingle_k)
            counts = np.diff(offs)
            idx = np.repeat(np.arange(len(counts)), counts)
            return pa.table({
                "shingle": pa.array(flat.view(np.int64)),
                id_col: ids.take(pa.array(idx)),
            })
        texts = batch.column(text_col).to_pylist()
        sh_col, idx_out = [], []
        for i, t in enumerate(texts):
            sh = shingle_fn(t)
            sh_col.append(sh.view(np.int64))
            idx_out.append(np.full(len(sh), i, dtype=np.int64))
        return pa.table({
            "shingle": pa.array(np.concatenate(sh_col)
                                if sh_col else np.empty(0, np.int64)),
            id_col: ids.take(pa.array(np.concatenate(idx_out)
                                      if idx_out else np.empty(0, np.int64))),
        })

    def emit_pairs(group: pa.Table) -> pa.Table:
        """One bucket's postings → every surviving shingle's i<j candidate
        pairs plus one (id, id) self-pair per surviving posting (the
        pruned-universe size contributions).

        Scale shape: ONE task per bucket (not per shingle — there are
        billions of distinct shingles at corpus scale). Inside, one C++
        sort by (shingle, id) splits postings into per-shingle segments;
        df-pruning is a vectorized segment-size mask; self-pairs are one
        vectorized take; Python loops only over segments with ≥ 2
        postings (``triangle_indices``), each O(df²) real work anyway.
        Sorting by id within the segment canonicalizes id_a < id_b."""
        from .buckets import triangle_indices

        id_type = group.column(id_col).type
        n = group.num_rows
        if n == 0:
            return pa.table({"id_a": pa.array([], type=id_type),
                             "id_b": pa.array([], type=id_type)})
        order = np.asarray(pc.sort_indices(group, sort_keys=[
            ("shingle", "ascending"), (id_col, "ascending")]))
        sh = np.asarray(group.column("shingle"))[order]
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = sh[1:] != sh[:-1]
        bounds = np.concatenate([np.nonzero(new_seg)[0], [n]])
        sizes = np.diff(bounds)
        ok = sizes <= max_df
        surviving = order[np.repeat(ok, sizes)]
        ai, bi = triangle_indices(bounds, ok & (sizes > 1))
        a_idx = np.concatenate([surviving, order[ai]])
        b_idx = np.concatenate([surviving, order[bi]])
        ids = group.column(id_col).combine_chunks()
        return pa.table({"id_a": ids.take(pa.array(a_idx)),
                         "id_b": ids.take(pa.array(b_idx))})

    from .buckets import packed_bucket_map_groups

    # pair co-counts: integer row counts are exact under any reduction
    # order, so the packed grouped aggregate applies (no sort-shuffle)
    from .aggregate import grouped_assoc_agg

    counts = grouped_assoc_agg(
        packed_bucket_map_groups(
            ds.select_columns([id_col, text_col])
              .map_batches(explode, batch_format="pyarrow"),
            ["shingle"], emit_pairs),
        ["id_a", "id_b"], count_col="co",
    ).materialize()  # candidate pairs + one size row per doc

    def split_pairs(batch: pa.Table) -> pa.Table:
        self_m = pc.equal(batch.column("id_a"), batch.column("id_b"))
        return batch.filter(pc.invert(self_m))

    def split_sizes(name):
        def fn(batch: pa.Table) -> pa.Table:
            self_m = pc.equal(batch.column("id_a"), batch.column("id_b"))
            sub = batch.filter(self_m)
            return pa.table({name: sub.column("id_a"),
                             f"s_{name}": sub.column("co")})
        return fn

    from .join import hash_join

    pairs = counts.map_batches(split_pairs, batch_format="pyarrow")
    sizes_a = counts.map_batches(split_sizes("id_a"), batch_format="pyarrow")
    sizes_b = counts.map_batches(split_sizes("id_b"), batch_format="pyarrow")
    joined = hash_join(hash_join(pairs, sizes_a, on="id_a", how="inner"),
                       sizes_b, on="id_b", how="inner")

    def finalize(batch: pa.Table) -> pa.Table:
        co_n = np.asarray(batch.column("co"), dtype=np.float64)
        sa = np.asarray(batch.column("s_id_a"), dtype=np.float64)
        sb = np.asarray(batch.column("s_id_b"), dtype=np.float64)
        jac = co_n / (sa + sb - co_n)
        out = batch.append_column("jaccard", pa.array(jac))
        return (out.filter(pa.array(jac >= threshold))
                   .drop_columns(["co", "s_id_a", "s_id_b"]))

    return joined.map_batches(finalize, batch_format="pyarrow")


# -------------------------------------------------------- line dedup ----

_LN_COLS = ["_ln_h0", "_ln_h1", "_ln_h2", "_ln_h3"]
_U32 = np.uint64(0xFFFFFFFF)


def _split_doc_lines(col) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """(flat_lines, offsets, null_mask): ``flat[offs[i]:offs[i+1]]`` are
    doc *i*'s lines under the SQL contract ``str_split(text, chr(10))``
    ('' ⇒ [''], null ⇒ [''] but flagged null)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    nulls = np.asarray(pc.is_null(arr))
    lst = pc.split_pattern(pc.fill_null(arr, ""), "\n")
    lst = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
    offs = np.asarray(lst.offsets).astype(np.int64)
    offs = offs - offs[0]
    return lst.flatten(), offs, nulls


def _line_hash_cols(lines: pa.Array) -> dict[str, pa.Array]:
    """128-bit line content hash as FOUR int64 columns of 32 bits each —
    every value < 2^32 stays inside the canonical key hasher's float64-
    safe ±2^53 range, so the columns survive hash_join / grouped
    aggregation on any path (full-range int64 would be rejected)."""
    from ..functions.text import content_hash128

    lo, hi = content_hash128(lines)
    parts = [lo & _U32, lo >> np.uint64(32), hi & _U32, hi >> np.uint64(32)]
    return {c: pa.array(p.astype(np.int64)) for c, p in zip(_LN_COLS, parts)}


def _member128(qlo, qhi, H_lo, H_hi) -> np.ndarray:
    """Exact membership of (qlo, qhi) pairs in the lexsorted dup set —
    searchsorted on the low half, vectorized high-half verify for the
    (overwhelmingly common) singleton ranges, tiny scan for low-half
    collisions inside the dup set."""
    i0 = np.searchsorted(H_lo, qlo, "left")
    i1 = np.searchsorted(H_lo, qlo, "right")
    out = np.zeros(len(qlo), dtype=bool)
    single = (i1 - i0) == 1
    out[single] = H_hi[i0[single]] == qhi[single]
    for j in np.nonzero((i1 - i0) > 1)[0]:
        out[j] = bool(np.any(H_hi[i0[j]:i1[j]] == qhi[j]))
    return out


def _join_kept_lines(flat: pa.Array, doc_idx: np.ndarray, keep: np.ndarray,
                     n_docs: int) -> pa.Array:
    """Per-doc '\\n'-join of the kept lines (zero kept ⇒ '') — one
    bincount + one ListArray + one binary_join for the whole batch."""
    counts = np.bincount(doc_idx[keep], minlength=n_docs)
    offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    kept = pc.cast(flat.filter(pa.array(keep)), pa.large_string())
    lst = pa.LargeListArray.from_arrays(pa.array(offs), kept)
    sep = pa.scalar("\n", pa.large_string())
    return pc.cast(pc.binary_join(lst, sep), pa.string())


def dedup_lines(ds, *, threshold: int = 1, id_col: str = "doc_id",
                text_col: str = "text", broadcast_limit_rows: int = 4_000_000):
    """Corpus-level LINE deduplication (the CCNet/RefinedWeb boilerplate
    scrub): split every document on newlines, count each distinct line's
    occurrences across the WHOLE corpus, remove every copy of lines
    occurring more than ``threshold`` times, and re-join the survivors
    in original order ('' when nothing survives; null text stays null).
    Returns Dataset[id_col, text_col].

    Scale shape: lines are identified by the 128-bit sha1 pair (split
    into four 32-bit int64 columns, see ``_line_hash_cols``), counted by
    per-block Arrow ``group_by`` pre-aggregation + the packed exchange
    (``grouped_assoc_agg``). The over-threshold set is usually tiny
    (boilerplate/navigation lines), so it broadcasts via one ``ray.put``
    and the rebuild is ONE streaming ``map_batches`` over the corpus —
    no shuffle of document text, a doc never leaves its block. When the
    dup set exceeds ``broadcast_limit_rows`` the rebuild switches to the
    fully partitioned path: exploded lines LEFT-``hash_join`` the dup
    set, then a packed per-doc regroup re-assembles texts (the marker
    join keeps all-lines-removed docs alive).

    Reference parity: this generalizes ``exact_dedup``'s whole-document
    content-hash identity (reference R/bloomjoin.R key-hash contract) to
    sub-document units; threshold semantics follow the SQL replica
    ``HAVING count(*) <= threshold`` exactly."""
    import ray

    from .aggregate import grouped_assoc_agg

    if threshold < 1:
        raise ValueError("threshold must be >= 1")

    def count_rows(batch: pa.Table) -> pa.Table:
        flat, _offs, nulls = _split_doc_lines(batch.column(text_col))
        if nulls.any():
            tbl = batch.filter(pa.array(~nulls))
            flat, _offs, _ = _split_doc_lines(tbl.column(text_col))
        return pa.table(_line_hash_cols(flat))

    counts = grouped_assoc_agg(
        ds.select_columns([text_col]).map_batches(
            count_rows, batch_format="pyarrow"),
        _LN_COLS, count_col="_ln_n")
    dup = counts.map_batches(
        lambda b: b.filter(pc.greater(b.column("_ln_n"), threshold))
                   .drop_columns(["_ln_n"]),
        batch_format="pyarrow").materialize()

    docs = ds.select_columns([id_col, text_col])
    if dup.count() <= broadcast_limit_rows:
        # empty exchange blocks can carry a degenerate schema — keep
        # only non-empty blocks, projected to the hash columns
        gathered = [t.select(_LN_COLS) for t in ray.get(dup.to_arrow_refs())
                    if t.num_rows]
        tbl = (pa.concat_tables(gathered) if gathered
               else pa.table({c: pa.array([], pa.int64())
                              for c in _LN_COLS}))
        parts = [np.asarray(tbl.column(c)).view(np.uint64)
                 for c in _LN_COLS]
        d_lo = parts[0] | (parts[1] << np.uint64(32))
        d_hi = parts[2] | (parts[3] << np.uint64(32))
        order = np.lexsort((d_hi, d_lo))
        dup_ref = ray.put((d_lo[order], d_hi[order]))

        def rebuild(batch: pa.Table) -> pa.Table:
            from ..functions.text import content_hash128

            H_lo, H_hi = ray.get(dup_ref)
            flat, offs, nulls = _split_doc_lines(batch.column(text_col))
            lo, hi = content_hash128(flat)
            keep = ~_member128(lo, hi, H_lo, H_hi)
            n = batch.num_rows
            doc_idx = np.repeat(np.arange(n), np.diff(offs))
            joined = _join_kept_lines(flat, doc_idx, keep, n)
            if nulls.any():
                joined = pc.if_else(pa.array(nulls),
                                    pa.nulls(n, pa.string()), joined)
            return pa.table({id_col: batch.column(id_col),
                             text_col: joined})

        return docs.map_batches(rebuild, batch_format="pyarrow")

    # partitioned path: dup set too large to broadcast
    from .buckets import packed_bucket_map_groups
    from .join import hash_join

    def explode(batch: pa.Table) -> pa.Table:
        flat, offs, nulls = _split_doc_lines(batch.column(text_col))
        n = batch.num_rows
        doc_idx = np.repeat(np.arange(n), np.diff(offs))
        ids = batch.column(id_col)
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        cols = {id_col: ids.take(pa.array(doc_idx)),
                "_ln_idx": pa.array(np.arange(len(doc_idx))
                                    - np.repeat(offs[:-1], np.diff(offs))),
                "_ln_text": flat,
                "_ln_null": pa.array(nulls[doc_idx])}
        cols.update(_line_hash_cols(flat))
        return pa.table(cols)

    marked = dup.map_batches(
        lambda b: b.append_column("_ln_dup",
                                  pa.array(np.ones(b.num_rows, np.int8))),
        batch_format="pyarrow")
    joined = hash_join(docs.map_batches(explode, batch_format="pyarrow"),
                       marked, on=_LN_COLS, how="left")

    from ..functions.keys import hash_keys64_pair

    def regroup(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gbucket"])
        out_schema = pa.schema([group.schema.field(id_col),
                                pa.field(text_col, pa.string())])
        if group.num_rows == 0:
            return out_schema.empty_table()
        idx = np.asarray(pc.sort_indices(
            group, sort_keys=[(id_col, "ascending"),
                              ("_ln_idx", "ascending")]))
        g = group.take(pa.array(idx))
        h1, h2 = hash_keys64_pair(g, [id_col])
        n = len(idx)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        seg = np.cumsum(new) - 1
        n_docs = int(seg[-1]) + 1
        starts = np.nonzero(new)[0]
        keep = np.asarray(pc.is_null(g.column("_ln_dup")))
        flat = g.column("_ln_text")
        flat = (flat.combine_chunks()
                if isinstance(flat, pa.ChunkedArray) else flat)
        joined_txt = _join_kept_lines(flat, seg, keep, n_docs)
        nulls = np.asarray(g.column("_ln_null"))[starts]
        if nulls.any():
            joined_txt = pc.if_else(pa.array(nulls),
                                    pa.nulls(n_docs, pa.string()),
                                    joined_txt)
        ids = g.column(id_col)
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        return pa.table({id_col: ids.take(pa.array(starts)),
                         text_col: joined_txt})

    return packed_bucket_map_groups(joined, [id_col], regroup)
