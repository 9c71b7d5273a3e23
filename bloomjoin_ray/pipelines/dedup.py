"""Deduplication pipelines for training-data curation.

* ``exact_dedup`` — hash-partition on a 64-bit content hash, keep the
  first row (min order column) per identical content. The shuffle carries
  only one hash column extra; groups verify actual content so a hash
  collision can never merge two distinct documents.
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

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import content_hash64, shingle_hashes
from ..state.minhash import (
    band_hashes,
    hamming64,
    minhash_signature,
    signature_jaccard,
    simhash64,
)


# ------------------------------------------------------------- exact ----

def exact_dedup(ds, text_col: str = "text", order_col: str = "doc_id"):
    """Keep one row (min ``order_col``) per distinct ``text_col`` value."""

    def add_hash(batch: pa.Table) -> pa.Table:
        h = content_hash64(batch.column(text_col))
        return batch.append_column("__chash", pa.array(h.view(np.int64)))

    def keep_first(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        idx = df.groupby(text_col, sort=False)[order_col].idxmin()
        out = df.loc[sorted(idx)].drop(columns="__chash")
        return pa.Table.from_pandas(out, preserve_index=False)

    return (ds.map_batches(add_hash, batch_format="pyarrow")
              .groupby("__chash")
              .map_groups(keep_first, batch_format="pyarrow"))


# ----------------------------------------------------------- minhash ----

class _MinHashStage:
    """Per-batch: signature per doc → one row per band
    (band, band_hash, id, signature bytes)."""

    def __init__(self, text_col, id_col, num_perm, bands, shingle_k):
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..state.minhash import minhash_signatures_batch

        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col).to_pylist()
        sigs = minhash_signatures_batch(
            [shingle_hashes(t, self.k) for t in texts], self.num_perm)
        band_col, bhash_col, id_col, sig_col = [], [], [], []
        for i in range(len(texts)):
            sig = sigs[i]
            bh = band_hashes(sig, self.bands)
            blob = sig.tobytes()
            for b in range(self.bands):
                band_col.append(b)
                bhash_col.append(int(bh[b].view(np.int64)))
                id_col.append(ids[i])
                sig_col.append(blob)
        return pa.table({
            "band": pa.array(band_col, type=pa.int32()),
            "bhash": pa.array(bhash_col, type=pa.int64()),
            self.id_col: pa.array(id_col),
            "sig": pa.array(sig_col, type=pa.large_binary()),
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
        return pa.table({"id_a": a_col, "id_b": b_col,
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
    drop_ref = ray.put(drop)

    def keep(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        ids = batch.column(id_col).to_pylist()
        mask = pa.array([i not in d for i in ids])
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
    """Per-batch: 64-bit SimHash per doc → 4 rows (16-bit band buckets)."""

    def __init__(self, text_col, id_col):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col).to_pylist()
        band_col, bucket_col, id_col, fp_col = [], [], [], []
        for i, t in enumerate(texts):
            toks = (t or "").lower().split()
            th = np.array([np.frombuffer(
                hashlib.blake2b(w.encode(), digest_size=8).digest(),
                dtype=np.uint64)[0] for w in toks], dtype=np.uint64)
            fp = simhash64(th)
            for b in range(4):
                band_col.append(b)
                bucket_col.append(int((int(fp) >> (16 * b)) & 0xFFFF))
                id_col.append(ids[i])
                fp_col.append(int(np.uint64(fp).view(np.int64)))
        return pa.table({
            "band": pa.array(band_col, type=pa.int32()),
            "bucket": pa.array(bucket_col, type=pa.int32()),
            self.id_col: pa.array(id_col),
            "fp": pa.array(fp_col, type=pa.int64()),
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
        return pa.table({"id_a": a_col, "id_b": b_col,
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
    """Exact Jaccard ≥ threshold pairs via a shingle inverted index.

    Per-batch explode (shingle, id); shingles occurring in > ``max_df``
    docs are dropped (df-pruning — a shingle shared by everything carries
    no near-dup signal but would blow the bucket up quadratically).
    ``shingle_fn(text) -> uint64 set`` overrides the default char
    k-shingling (e.g. ``word_ngram_hashes`` for small-vocab corpora).
    Returns Dataset[id_a, id_b, jaccard].
    """
    import ray

    mk = shingle_fn or (lambda t: shingle_hashes(t, shingle_k))

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        sh_col, id_out, size_col = [], [], []
        for i, t in enumerate(texts):
            sh = mk(t)
            sh_col.append(sh.view(np.int64))
            id_out.extend([ids[i]] * len(sh))
            size_col.append(len(sh))
        return pa.table({
            "shingle": pa.array(np.concatenate(sh_col) if sh_col else [], type=pa.int64()),
            id_col: pa.array(id_out),
        })

    # per-doc set sizes, broadcast for the final jaccard
    def sizes(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        return pa.table({
            id_col: pa.array(ids),
            "size": pa.array([len(mk(t)) for t in texts], type=pa.int64()),
        })

    size_rows = ds.select_columns([id_col, text_col]).map_batches(
        sizes, batch_format="pyarrow").take_all()
    size_map = {r[id_col]: r["size"] for r in size_rows}
    size_ref = ray.put(size_map)

    def co_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column(id_col).to_pylist()))
        if len(ids) > max_df or len(ids) < 2:
            return pa.table({"id_a": pa.array([], type=group.column(id_col).type),
                             "id_b": pa.array([], type=group.column(id_col).type)})
        a_col, b_col = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_col.append(ids[i])
                b_col.append(ids[j])
        return pa.table({"id_a": a_col, "id_b": b_col})

    from ray.data.aggregate import Count

    co = (ds.select_columns([id_col, text_col])
            .map_batches(explode, batch_format="pyarrow")
            .groupby("shingle")
            .map_groups(co_pairs, batch_format="pyarrow")
            .groupby(["id_a", "id_b"])
            .aggregate(Count(alias_name="co")))

    def finalize(batch: pa.Table) -> pa.Table:
        sm = ray.get(size_ref)
        a = batch.column("id_a").to_pylist()
        b = batch.column("id_b").to_pylist()
        co_n = np.asarray(batch.column("co"), dtype=np.float64)
        sa = np.array([sm[x] for x in a], dtype=np.float64)
        sb = np.array([sm[x] for x in b], dtype=np.float64)
        jac = co_n / (sa + sb - co_n)
        keep = jac >= threshold
        out = batch.append_column("jaccard", pa.array(jac))
        return out.filter(pa.array(keep)).drop_columns(["co"])

    return co.map_batches(finalize, batch_format="pyarrow")
