"""Deduplication pipelines for training-data curation.

* ``exact_dedup`` — hash-partition on the 128-bit sha1 content-hash
  pair, one vectorized keep-first (min order column) per bucket. Two
  distinct documents merge only if both 64-bit halves collide
  (~2^-128 per pair).
* ``minhash_lsh_pairs`` / ``minhash_dedup`` — shingle → MinHash signature
  → LSH band explosion → ``groupby(band, band_hash)`` bucket join →
  candidate pairs with signature-estimated Jaccard → threshold →
  connected components (driver union-find over the pair set, which is
  orders of magnitude smaller than the corpus; documented assumption).
* ``simhash_pairs`` / ``simhash_dedup`` — 64-bit SimHash, 4×16-bit band
  buckets (Hamming ≤ 3 ⇒ at least one band equal), verified Hamming.
* ``ngram_jaccard_pairs`` — exact Jaccard via shingle-inverted-index
  co-counting, with document-frequency pruning to bound bucket blowup.

Partitioning assumption: bucket keys (content hash, band hash, shingle
hash) distribute uniformly, so ``groupby`` shuffles are balanced; hot
shingles are explicitly df-pruned.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import content_hash64, shingle_hashes
from ..state.minhash import hamming64, signature_jaccard


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

    return (ds.map_batches(add_hash, batch_format="pyarrow")
              .groupby("__gbucket")
              .map_groups(keep_first, batch_format="pyarrow"))


# ----------------------------------------------------------- minhash ----

class _MinHashStage:
    """Per-batch: signature per doc → one row per band
    (band, band_hash, id, signature bytes)."""

    def __init__(self, text_col, id_col, num_perm, bands, shingle_k):
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..state.minhash import band_hashes_batch, minhash_signatures_batch

        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        sigs = minhash_signatures_batch(
            [shingle_hashes(t, self.k) for t in texts], self.num_perm)
        bh = band_hashes_batch(sigs, self.bands)      # (n, bands), vectorized
        blobs = [s.tobytes() for s in sigs]
        idx = np.repeat(np.arange(n), self.bands)
        ids = batch.column(self.id_col)
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        return pa.table({
            "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
            "bhash": pa.array(bh.reshape(-1).view(np.int64)),
            self.id_col: ids.take(pa.array(idx)),
            "sig": pa.array([blobs[i] for i in idx], type=pa.large_binary()),
        })


def minhash_lsh_pairs(ds, text_col: str = "text", id_col: str = "doc_id", *,
                      num_perm: int = 128, bands: int = 16,
                      shingle_k: int = 5, threshold: float = 0.5):
    """Candidate near-dup pairs with signature-estimated Jaccard ≥
    threshold. Returns Dataset[id_a, id_b, est_jaccard]."""

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        sigs = [np.frombuffer(bytes(s), dtype=np.uint64)
                for s in group.column("sig").to_pylist()]
        seen = {}
        for i, d in enumerate(ids):
            if d not in seen:
                seen[d] = sigs[i]
        uids = sorted(seen)
        a_col, b_col, j_col = [], [], []
        for i in range(len(uids)):
            for j in range(i + 1, len(uids)):
                est = signature_jaccard(seen[uids[i]], seen[uids[j]])
                if est >= threshold:
                    a_col.append(uids[i])
                    b_col.append(uids[j])
                    j_col.append(est)
        id_type = group.column(id_col).type
        return pa.table({"id_a": pa.array(a_col, type=id_type),
                         "id_b": pa.array(b_col, type=id_type),
                         "est_jaccard": pa.array(j_col, type=pa.float64())})

    def first_per_pair(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    stage = _MinHashStage(text_col, id_col, num_perm, bands, shingle_k)
    pairs = (ds.select_columns([id_col, text_col])
               .map_batches(stage, batch_format="pyarrow")
               .groupby(["band", "bhash"])
               .map_groups(bucket_pairs, batch_format="pyarrow"))
    # a pair can surface from several bands — dedupe
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        first_per_pair, batch_format="pyarrow")


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


def dedup_by_pairs(ds, pairs_ds, id_col: str = "doc_id"):
    """Survivors after clustering candidate pairs: connected components via
    driver union-find (the pair set ≪ corpus), keep the min-id row of each
    cluster. Unpaired rows survive unchanged."""
    import ray

    pair_rows = pairs_ds.select_columns(["id_a", "id_b"]).take_all()
    cluster = _union_find_clusters([(r["id_a"], r["id_b"]) for r in pair_rows])
    drop = {x for x, root in cluster.items() if root != x}
    if not drop:
        return ds
    drop_ref = ray.put(pa.array(sorted(drop)))

    def keep(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)  # zero-copy Arrow array from the store
        mask = pc.invert(pc.is_in(batch.column(id_col), value_set=d))
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def minhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id", *,
                  threshold: float = 0.7, num_perm: int = 128,
                  bands: int = 16, shingle_k: int = 5):
    """Near-dup dedup: keep one representative per MinHash cluster."""
    pairs = minhash_lsh_pairs(ds, text_col, id_col, num_perm=num_perm,
                              bands=bands, shingle_k=shingle_k,
                              threshold=threshold)
    return dedup_by_pairs(ds, pairs, id_col)


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
    """Verified SimHash near-dup pairs: Dataset[id_a, id_b, hamming]."""

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        fps = np.array(group.column("fp").to_pylist(), dtype=np.int64).view(np.uint64)
        seen = {}
        for d, f in zip(ids, fps):
            seen.setdefault(d, f)
        uids = sorted(seen)
        a_col, b_col, h_col = [], [], []
        for i in range(len(uids)):
            fi = np.array([seen[uids[i]]], dtype=np.uint64)
            for j in range(i + 1, len(uids)):
                hd = int(hamming64(fi, np.uint64(seen[uids[j]]))[0])
                if hd <= max_hamming:
                    a_col.append(uids[i])
                    b_col.append(uids[j])
                    h_col.append(hd)
        id_type = group.column(id_col).type
        return pa.table({"id_a": pa.array(a_col, type=id_type),
                         "id_b": pa.array(b_col, type=id_type),
                         "hamming": pa.array(h_col, type=pa.int32())})

    pairs = (ds.select_columns([id_col, text_col])
               .map_batches(_SimHashStage(text_col, id_col), batch_format="pyarrow")
               .groupby(["band", "bucket"])
               .map_groups(bucket_pairs, batch_format="pyarrow"))
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")


def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id", *,
                  max_hamming: int = 3):
    pairs = simhash_pairs(ds, text_col, id_col, max_hamming=max_hamming)
    return dedup_by_pairs(ds, pairs, id_col)


# ------------------------------------------------- exact n-gram Jaccard ----

def ngram_jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id", *,
                        shingle_k: int = 5, threshold: float = 0.5,
                        max_df: int = 256, shingle_fn=None):
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

    ``shingle_fn(text) -> uint64 set`` overrides the default char
    k-shingling (e.g. ``word_ngram_hashes`` for small-vocab corpora).
    Returns Dataset[id_a, id_b, jaccard].
    """
    mk = shingle_fn or (lambda t: shingle_hashes(t, shingle_k))

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        sh_col, id_out = [], []
        for i, t in enumerate(texts):
            sh = mk(t)
            sh_col.append(sh.view(np.int64))
            id_out.extend([ids[i]] * len(sh))
        return pa.table({
            "shingle": pa.array(np.concatenate(sh_col) if sh_col else [], type=pa.int64()),
            id_col: pa.array(id_out),
        })

    def emit_pairs(group: pa.Table) -> pa.Table:
        """One shingle's postings → its i<j candidate pairs + one (id, id)
        self-pair per posting (the pruned-universe size contributions)."""
        id_type = group.column(id_col).type
        ids = sorted(set(group.column(id_col).to_pylist()))
        if len(ids) > max_df:
            return pa.table({"id_a": pa.array([], type=id_type),
                             "id_b": pa.array([], type=id_type)})
        a_col, b_col = list(ids), list(ids)  # self-pairs: size contributions
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_col.append(ids[i])
                b_col.append(ids[j])
        return pa.table({"id_a": pa.array(a_col, type=id_type),
                         "id_b": pa.array(b_col, type=id_type)})

    from ray.data.aggregate import Count

    counts = (ds.select_columns([id_col, text_col])
                .map_batches(explode, batch_format="pyarrow")
                .groupby("shingle")
                .map_groups(emit_pairs, batch_format="pyarrow")
                .groupby(["id_a", "id_b"])
                .aggregate(Count(alias_name="co"))
                .materialize())  # candidate pairs + one size row per doc

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
