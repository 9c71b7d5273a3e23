"""Incremental dedup against a persisted corpus index — the
daily-ingest workflow at 100 TB: the corpus you already accepted never
moves again; each new increment pays one packed bucket exchange over
ITSELF plus bucket-aligned reads of only the index buckets its
candidates fall in.

Two index kinds share the layout and commit protocol: EXACT
(``init_corpus_index`` / ``incremental_dedup`` — 128-bit content-hash
membership) and NEAR-DUP (``init_neardup_index`` /
``incremental_neardup_dedup`` — MinHash band rows, documented further
down). ``jobs/ingest_job.py`` wraps either in an exactly-once CLI.

Index layout (plain hive parquet, readable by any engine)::

    index_dir/
      __kbucket=i/gen00000002-<token>.parquet   # (h1:int64, h2:int64)
      _bloom_gen00000002.bin                    # merged BloomSketch blob
      _INDEX.json                               # committed spec (see below)

* **Hashes, not text.** The index stores the 128-bit sha1 content-hash
  pair (``functions.text.content_hash128`` — the same identity
  ``exact_dedup`` groups on), bucketed by ``h1 % num_buckets``. At
  10^10 docs the whole index is ~160 GB of parquet, independent of
  document size.
* **Bloom sidecar prunes the probe.** A single merged ``BloomSketch``
  over the xor-folded ``h1`` (the fold bypasses the canonical
  ``hash_keys32``, which would reject full-range 64-bit values — same
  trap as ``decontam._gram_hash32``) ships once via ``ray.put``; rows
  that miss it are DEFINITELY new and never touch index parquet. Only
  bloom hits (true dups + FPR·|new|) are exact-verified against their
  bucket's files.
* **Generation-gated atomic commit.** Ingest tasks write
  ``gen{G+1}-*.parquet`` into the bucket dirs as they dedup, but
  readers only see files with ``gen <= _INDEX.json's generation``; the
  manifest bumps to G+1 (write-then-rename) only after the whole
  increment succeeds. A crashed or Ray-retried run leaves orphan
  gen-(G+1) files that are either invisible (crash before commit) or
  duplicate membership rows (task retry) — both harmless under
  membership semantics; ``compact_index`` reclaims the space.
* **Bloom growth.** The sidecar is sized at ``init_corpus_index``; when
  the post-merge fill ratio exceeds 0.5 (FPR drifting past ~2^-k at
  k probes) the filter is rebuilt from the index parquet — one task
  per bucket — at 4× capacity.

Scale shape: increment cost ∝ |new batch| (one exchange) +
|bloom hits| · (bucket file read); the 100-TB corpus is read only by
``rebuild_bloom``/``compact_index``, both embarrassingly parallel per
bucket and each a rare maintenance event, never a per-ingest cost.
"""

from __future__ import annotations

import json
import os
import secrets

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..state.base import sketch_from_bytes
from ..state.bloom import BloomSketch

_SPEC = "_INDEX.json"


def _fold32(h64: np.ndarray) -> np.ndarray:
    """uint64 content-hash half → int32 bloom key (xor-fold; the value
    is already a uniform 64-bit hash, so folding preserves uniformity
    where the canonical ``hash_keys32`` would float64-canonicalize and
    reject full-range values)."""
    v = np.asarray(h64).view(np.uint64)
    return (v ^ (v >> np.uint64(32))).astype(np.uint32).view(np.int32)


_PAIR_DT = np.dtype([("a", "<u8"), ("b", "<u8")])


def _as_pairs(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    out = np.empty(len(h1), dtype=_PAIR_DT)
    out["a"] = np.asarray(h1).view(np.uint64)
    out["b"] = np.asarray(h2).view(np.uint64)
    return out


def _pair_member(sorted_index: np.ndarray, query: np.ndarray) -> np.ndarray:
    """bool mask: query pair present in lexsorted index pairs. Exact on
    the full 128 bits (structured searchsorted + record equality)."""
    if sorted_index.size == 0 or query.size == 0:
        return np.zeros(len(query), dtype=bool)
    pos = np.minimum(sorted_index.searchsorted(query),
                     len(sorted_index) - 1)
    return sorted_index[pos] == query


# ------------------------------------------------------------- spec ----

def _spec_path(index_dir: str) -> str:
    return os.path.join(index_dir, _SPEC)


def read_index_spec(index_dir: str) -> dict:
    with open(_spec_path(index_dir)) as f:
        return json.load(f)


def _commit_spec(index_dir: str, spec: dict) -> None:
    tmp = _spec_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(spec, f)
    os.replace(tmp, _spec_path(index_dir))


def _bloom_path(index_dir: str, generation: int) -> str:
    return os.path.join(index_dir, f"_bloom_gen{generation:08d}.bin")


def _bucket_dir(index_dir: str, bucket: int) -> str:
    return os.path.join(index_dir, f"__kbucket={bucket}")


def init_corpus_index(index_dir: str, *, num_buckets: int = 64,
                      bloom_capacity: int = 1_000_000,
                      bloom_fpr: float = 0.01,
                      overwrite: bool = False) -> dict:
    """Create an empty corpus index. ``bloom_capacity`` sizes the
    sidecar filter (it auto-rebuilds at 4× when fill ratio > 0.5, so a
    low-ball here costs a rebuild, not correctness)."""
    if os.path.exists(_spec_path(index_dir)):
        if not overwrite:
            raise FileExistsError(
                f"corpus index already exists at {index_dir} "
                "(pass overwrite=True to reinitialise)")
        import shutil
        shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    empty = BloomSketch(int(bloom_capacity), float(bloom_fpr))
    spec = {"kind": "exact", "generation": 0,
            "num_buckets": int(num_buckets),
            "rows": 0, "bloom_capacity": int(bloom_capacity),
            "bloom_fpr": float(bloom_fpr),
            "bloom_m": empty.m, "bloom_k": empty.k}
    for b in range(int(num_buckets)):
        os.makedirs(_bucket_dir(index_dir, b), exist_ok=True)
    with open(_bloom_path(index_dir, 0), "wb") as f:
        f.write(empty.to_bytes())
    _commit_spec(index_dir, spec)
    return spec


def _bucket_files(index_dir: str, bucket: int, max_gen: int) -> list[str]:
    d = _bucket_dir(index_dir, bucket)
    out = []
    if not os.path.isdir(d):
        return out
    for name in sorted(os.listdir(d)):
        if not (name.startswith("gen") and name.endswith(".parquet")):
            continue  # .tmp- partials and foreign files are invisible
        if int(name[3:11]) <= max_gen:
            out.append(os.path.join(d, name))
    return out


def _read_bucket_pairs(index_dir: str, bucket: int,
                       max_gen: int) -> np.ndarray:
    """All committed (h1, h2) pairs of one bucket, lexsorted."""
    tables = [pq.read_table(f, columns=["h1", "h2"])
              for f in _bucket_files(index_dir, bucket, max_gen)]
    if not tables:
        return np.empty(0, dtype=_PAIR_DT)
    t = pa.concat_tables(tables)
    pairs = _as_pairs(np.asarray(t.column("h1")), np.asarray(t.column("h2")))
    pairs.sort()
    return pairs


def _write_bucket_file(index_dir: str, bucket: int, generation: int,
                       h1: np.ndarray, h2: np.ndarray) -> None:
    """One parquet file of new hashes; write-then-rename so a torn
    write is never a readable file."""
    d = _bucket_dir(index_dir, bucket)
    os.makedirs(d, exist_ok=True)
    token = secrets.token_hex(8)
    final = os.path.join(d, f"gen{generation:08d}-{token}.parquet")
    tmp = os.path.join(d, f".tmp-{token}.parquet")
    pq.write_table(pa.table({"h1": pa.array(np.asarray(h1, dtype=np.int64)),
                             "h2": pa.array(np.asarray(h2, dtype=np.int64))}),
                   tmp)
    os.replace(tmp, final)


# ------------------------------------------------------------ ingest ----

def incremental_dedup(ds_new, index_dir: str, *, text_col: str = "text",
                      order_col: str = "doc_id",
                      update_index: bool = True,
                      commit_meta: dict | None = None):
    """Dedup ``ds_new`` against itself AND the persisted corpus index;
    return the surviving rows (first-by-``order_col`` per distinct
    ``text_col``, never seen in any prior committed increment).

    With ``update_index=True`` (the ingest path) the survivors' hashes
    are appended to the index and the Bloom sidecar is extended; the
    result is materialized (it is consumed twice: once for the bloom
    delta, once by the caller) and the commit is atomic via the
    generation gate. With ``update_index=False`` this is a pure
    membership query: fully lazy, index untouched.
    """
    import ray

    from ..functions.text import content_hash128
    from .buckets import packed_bucket_map_groups

    spec = read_index_spec(index_dir)
    if spec.get("kind", "exact") != "exact":
        raise ValueError(f"{index_dir} is not an exact index "
                         f"(kind={spec.get('kind')!r}); use "
                         "incremental_neardup_dedup for near-dup indexes")
    nb = int(spec["num_buckets"])
    gen = int(spec["generation"])
    next_gen = gen + 1
    with open(_bloom_path(index_dir, gen), "rb") as f:
        bloom_blob = f.read()
    bloom_ref = ray.put(bloom_blob) if spec["rows"] > 0 else None
    index_has_rows = spec["rows"] > 0

    def add_hash(batch: pa.Table) -> pa.Table:
        lo, hi = content_hash128(batch.column(text_col))
        b = (lo % np.uint64(nb)).astype(np.int32)
        return (batch.append_column("_ch1", pa.array(lo.view(np.int64)))
                     .append_column("_ch2", pa.array(hi.view(np.int64)))
                     .append_column("__gbucket", pa.array(b)))

    def bucket_fn(group: pa.Table) -> pa.Table:
        """Bucket-union-invariant: keep-first is global over (h1, h2);
        index probes re-segment by the real bucket column."""
        if group.num_rows == 0:
            return group.drop_columns(["__gbucket"])
        idx = np.asarray(pc.sort_indices(group, sort_keys=[
            ("_ch1", "ascending"), ("_ch2", "ascending"),
            (order_col, "ascending")]))
        h1 = np.asarray(group.column("_ch1"))[idx]
        h2 = np.asarray(group.column("_ch2"))[idx]
        first = np.empty(len(idx), dtype=bool)
        first[0] = True
        first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        surv = group.take(pa.array(idx[first]))

        if index_has_rows:
            s1 = np.asarray(surv.column("_ch1")).view(np.uint64)
            s2 = np.asarray(surv.column("_ch2")).view(np.uint64)
            filt = sketch_from_bytes(ray.get(bloom_ref))
            hit = filt.contains_batch(_fold32(s1))
            if hit.any():
                seen = np.zeros(len(hit), dtype=bool)
                q = _as_pairs(s1[hit], s2[hit])
                buckets = np.asarray(surv.column("__gbucket"))[hit]
                member = np.zeros(len(q), dtype=bool)
                for b in np.unique(buckets):
                    m = buckets == b
                    member[m] = _pair_member(
                        _read_bucket_pairs(index_dir, int(b), gen), q[m])
                seen[np.nonzero(hit)[0][member]] = True
                surv = surv.filter(pa.array(~seen))

        if update_index and surv.num_rows:
            sb = np.asarray(surv.column("__gbucket"))
            u1 = np.asarray(surv.column("_ch1"))
            u2 = np.asarray(surv.column("_ch2"))
            for b in np.unique(sb):
                m = sb == b
                _write_bucket_file(index_dir, int(b), next_gen,
                                   u1[m], u2[m])
        return surv.drop_columns(["__gbucket"])

    survivors = packed_bucket_map_groups(
        ds_new.map_batches(add_hash, batch_format="pyarrow"),
        None, bucket_fn, num_buckets=nb, pre_bucketed=True)

    if not update_index:
        return survivors.map_batches(
            lambda t: t.drop_columns(["_ch1", "_ch2"]),
            batch_format="pyarrow")

    survivors = survivors.materialize()

    # bloom delta: per-block partials at the committed (m, k) layout,
    # merged on the driver (one blob per block — bounded)
    m, k, fpr = spec["bloom_m"], spec["bloom_k"], spec["bloom_fpr"]

    def partial(batch: pa.Table) -> pa.Table:
        s = BloomSketch(1, fpr, _m=m, _k=k)
        s.add_batch(_fold32(np.asarray(batch.column("_ch1"))))
        return pa.table({"blob": pa.array([s.to_bytes()],
                                          type=pa.large_binary())})

    merged = sketch_from_bytes(bloom_blob)
    n_new = 0
    for row in survivors.map_batches(
            partial, batch_format="pyarrow").take_all():
        merged.merge(sketch_from_bytes(row["blob"]))
    n_new = survivors.count()

    with open(_bloom_path(index_dir, next_gen), "wb") as f:
        f.write(merged.to_bytes())
    spec["generation"] = next_gen
    spec["rows"] = int(spec["rows"]) + int(n_new)
    if commit_meta:  # rides the same atomic rename as the generation
        spec.update(commit_meta)
    _commit_spec(index_dir, spec)

    if merged.fill_ratio() > 0.5:
        rebuild_bloom(index_dir)

    return survivors.map_batches(
        lambda t: t.drop_columns(["_ch1", "_ch2"]),
        batch_format="pyarrow")


# -------------------------------------------------- near-dup index ----

def init_neardup_index(index_dir: str, *, num_buckets: int = 64,
                       num_perm: int = 128, bands: int = 16,
                       shingle_k: int = 5,
                       bloom_capacity: int = 1_000_000,
                       bloom_fpr: float = 0.01,
                       overwrite: bool = False) -> dict:
    """Create an empty NEAR-DUP corpus index: MinHash band rows
    ``(band, bhash, id, sig)`` bucketed by ``bhash % num_buckets``, plus
    a Bloom sidecar over the band hashes. The MinHash geometry
    (``num_perm``/``bands``/``shingle_k``) is pinned at init — every
    increment must probe with the signatures the index stores."""
    if os.path.exists(_spec_path(index_dir)):
        if not overwrite:
            raise FileExistsError(
                f"corpus index already exists at {index_dir} "
                "(pass overwrite=True to reinitialise)")
        import shutil
        shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    empty = BloomSketch(int(bloom_capacity), float(bloom_fpr))
    spec = {"kind": "neardup", "generation": 0,
            "num_buckets": int(num_buckets), "rows": 0,
            "num_perm": int(num_perm), "bands": int(bands),
            "shingle_k": int(shingle_k), "id_col": None,
            "bloom_capacity": int(bloom_capacity),
            "bloom_fpr": float(bloom_fpr),
            "bloom_m": empty.m, "bloom_k": empty.k}
    for b in range(int(num_buckets)):
        os.makedirs(_bucket_dir(index_dir, b), exist_ok=True)
    with open(_bloom_path(index_dir, 0), "wb") as f:
        f.write(empty.to_bytes())
    _commit_spec(index_dir, spec)
    return spec


def _read_bucket_band_rows(index_dir: str, bucket: int, max_gen: int,
                           bhash_filter: np.ndarray | None = None
                           ) -> pa.Table | None:
    """Committed (band, bhash, id, sig) rows of one near-dup bucket,
    optionally pruned to ``bhash ∈ bhash_filter`` (sorted int64)."""
    tables = [pq.read_table(f)
              for f in _bucket_files(index_dir, bucket, max_gen)]
    if not tables:
        return None
    t = pa.concat_tables(tables)
    if bhash_filter is not None and t.num_rows:
        bh = np.asarray(t.column("bhash"))
        pos = np.minimum(bhash_filter.searchsorted(bh),
                         len(bhash_filter) - 1)
        t = t.filter(pa.array(bhash_filter[pos] == bh))
    return t if t.num_rows else None


def incremental_neardup_dedup(ds_new, index_dir: str, *,
                              text_col: str = "text",
                              order_col: str = "doc_id",
                              threshold: float = 0.7,
                              update_index: bool = True,
                              commit_meta: dict | None = None):
    """Near-dup dedup of ``ds_new`` against itself AND a persisted
    MinHash index — the daily-ingest counterpart of
    ``dedup.minhash_dedup``: the accepted corpus is never re-shingled;
    each increment pays one signature pass over ITSELF plus
    Bloom-pruned, ``isin``-filtered reads of only the index buckets its
    band hashes fall in.

    Survivor policy (documented, pinned in tests): a new doc whose
    estimated Jaccard vs ANY indexed doc is ≥ ``threshold`` is dropped;
    the remainder cluster among themselves (pairs touching a
    corpus-dup are discarded first — a doc near-dup of a corpus-dup
    but not of the corpus itself SURVIVES) and the min-``order_col``
    member of each cluster is kept. With ``update_index=True`` the
    survivors' band rows are appended under the next generation and
    the Bloom sidecar is extended; commit is atomic via the generation
    gate, exactly as in ``incremental_dedup``. Ray-retried tasks can
    leave duplicate band rows — harmless: the pair reduce keeps the
    first row per (segment, side, id).

    Scale shape: increment cost ∝ |new batch| · bands (one packed
    exchange of band rows) + |bloom-hit band rows| · (bucket file
    read); novel-content increments skip ~all index I/O via the
    sidecar. Pairs, clustering and the survivor filter run entirely on
    engine primitives (``hash_join`` anti/semi, ``dedup_by_pairs``) —
    nothing corpus-sized ever reaches the driver."""
    import ray

    from .buckets import dedupe_pairs, packed_bucket_map_groups
    from .dedup import _MinHashStage, _minhash_bucket_reduce, dedup_by_pairs
    from .join import hash_join

    spec = read_index_spec(index_dir)
    if spec.get("kind") != "neardup":
        raise ValueError(f"{index_dir} is not a near-dup index "
                         f"(kind={spec.get('kind')!r}); use "
                         "incremental_dedup for exact indexes")
    if spec["id_col"] not in (None, order_col):
        raise ValueError(f"index was built with id column "
                         f"{spec['id_col']!r}, got {order_col!r}")
    nb = int(spec["num_buckets"])
    gen = int(spec["generation"])
    next_gen = gen + 1
    with open(_bloom_path(index_dir, gen), "rb") as f:
        bloom_blob = f.read()
    bloom_ref = ray.put(bloom_blob)
    index_has_rows = spec["rows"] > 0

    stage = _MinHashStage(text_col, order_col, int(spec["num_perm"]),
                          int(spec["bands"]), int(spec["shingle_k"]))

    def add_bucket(batch: pa.Table) -> pa.Table:
        bh = np.asarray(batch.column("bhash")).view(np.uint64)
        return batch.append_column(
            "_ndbucket", pa.array((bh % np.uint64(nb)).astype(np.int32)))

    band_rows = (ds_new.select_columns([order_col, text_col])
                 .map_batches(stage, batch_format="pyarrow")
                 .map_batches(add_bucket, batch_format="pyarrow"))
    if update_index:
        band_rows = band_rows.materialize()  # reused for the append pass

    def probe_fn(group: pa.Table) -> pa.Table:
        """Bucket-union-invariant: within-batch pairs re-segment by
        (bhash, band); index probes re-segment by the bucket column."""
        within = _minhash_bucket_reduce(group, order_col, threshold)
        within = within.append_column(
            "vs_corpus", pa.array(np.zeros(within.num_rows, dtype=np.int8)))
        if not index_has_rows or group.num_rows == 0:
            return within
        filt = sketch_from_bytes(ray.get(bloom_ref))
        bh = np.asarray(group.column("bhash")).view(np.uint64)
        hit = filt.contains_batch(_fold32(bh))
        if not hit.any():
            return within
        probe = group.filter(pa.array(hit))
        pieces = []
        pb = np.asarray(probe.column("_ndbucket"))
        pbh = np.asarray(probe.column("bhash"), dtype=np.int64)
        for b in np.unique(pb):
            m = pb == b
            idx_t = _read_bucket_band_rows(index_dir, int(b), gen,
                                           np.unique(pbh[m]))
            if idx_t is None:
                continue
            new_t = probe.filter(pa.array(m))
            both = pa.concat_tables([
                pa.table({"band": idx_t.column("band"),
                          "bhash": idx_t.column("bhash"),
                          order_col: idx_t.column(order_col),
                          "sig": idx_t.column("sig")}),
                pa.table({"band": new_t.column("band"),
                          "bhash": new_t.column("bhash"),
                          order_col: new_t.column(order_col),
                          "sig": new_t.column("sig")}),
            ]).append_column("__mside", pa.array(np.concatenate([
                np.zeros(idx_t.num_rows, dtype=np.int8),
                np.ones(new_t.num_rows, dtype=np.int8)])))
            pieces.append(_minhash_bucket_reduce(
                both, order_col, threshold, side_col="__mside"))
        if not pieces:
            return within
        cross = pa.concat_tables(pieces)
        cross = cross.append_column(
            "vs_corpus", pa.array(np.ones(cross.num_rows, dtype=np.int8)))
        return pa.concat_tables([within, cross])

    pairs = packed_bucket_map_groups(
        band_rows, None, probe_fn, num_buckets=nb,
        pre_bucketed=True, bucket_col="_ndbucket").materialize()

    if pairs.count() == 0:  # fully-empty Datasets lose their schema
        survivors = ds_new
    else:
        # id_a is the INDEX id on vs_corpus pairs (side 0 sorts first)
        def dup_ids(batch: pa.Table) -> pa.Table:
            sub = batch.filter(pc.equal(batch.column("vs_corpus"), 1))
            return pa.table({"_nd_dupid": sub.column("id_b")})

        def within_only(batch: pa.Table) -> pa.Table:
            sub = batch.filter(pc.equal(batch.column("vs_corpus"), 0))
            return sub.drop_columns(["vs_corpus"])

        # empty Datasets shed their schema — every branch below guards
        # on count() before joining
        dups = (pairs.map_batches(dup_ids, batch_format="pyarrow")
                .materialize())
        if dups.count() == 0:
            dups, kept = None, ds_new
        else:
            kept = hash_join(ds_new, dups, on={order_col: "_nd_dupid"},
                             how="anti")
        wp = (pairs.map_batches(within_only, batch_format="pyarrow")
              .materialize())
        if wp.count() == 0:
            survivors = kept
        else:
            within = dedupe_pairs(wp, {"est_jaccard": "min"})
            if dups is not None:  # corpus-dup endpoints never cluster
                for side in ("id_a", "id_b"):
                    within = hash_join(within, dups,
                                       on={side: "_nd_dupid"}, how="anti")
            survivors = dedup_by_pairs(kept, within, order_col)

    if not update_index:
        return survivors

    survivors = survivors.materialize()
    n_new = survivors.count()
    to_write = None
    if n_new:  # empty survivors lose their schema — nothing to append
        surv_ids = survivors.map_batches(
            lambda t: pa.table({"_nd_sid": t.column(order_col)}),
            batch_format="pyarrow")
        to_write = hash_join(band_rows, surv_ids,
                             on={order_col: "_nd_sid"}, how="semi")

    m, k, fpr = spec["bloom_m"], spec["bloom_k"], spec["bloom_fpr"]

    def write_rows(batch: pa.Table) -> pa.Table:
        """Append this block's survivor band rows per bucket (gen-gated
        files) and emit one bloom partial; both idempotent-safe."""
        s = BloomSketch(1, fpr, _m=m, _k=k)
        if batch.num_rows:
            s.add_batch(_fold32(
                np.asarray(batch.column("bhash")).view(np.uint64)))
            bk = np.asarray(batch.column("_ndbucket"))
            for b in np.unique(bk):
                sl = (batch.filter(pa.array(bk == b))
                      .select(["band", "bhash", order_col, "sig"]))
                d = _bucket_dir(index_dir, int(b))
                os.makedirs(d, exist_ok=True)
                token = secrets.token_hex(8)
                tmp = os.path.join(d, f".tmp-{token}.parquet")
                pq.write_table(sl, tmp)
                os.replace(tmp, os.path.join(
                    d, f"gen{next_gen:08d}-{token}.parquet"))
        return pa.table({"blob": pa.array([s.to_bytes()],
                                          type=pa.large_binary())})

    merged = sketch_from_bytes(bloom_blob)
    if to_write is not None:
        for row in to_write.map_batches(
                write_rows, batch_format="pyarrow").take_all():
            merged.merge(sketch_from_bytes(row["blob"]))

    with open(_bloom_path(index_dir, next_gen), "wb") as f:
        f.write(merged.to_bytes())
    spec["generation"] = next_gen
    spec["rows"] = int(spec["rows"]) + int(n_new)
    spec["id_col"] = order_col
    if commit_meta:  # rides the same atomic rename as the generation
        spec.update(commit_meta)
    _commit_spec(index_dir, spec)

    if merged.fill_ratio() > 0.5:
        rebuild_neardup_bloom(index_dir)
    return survivors


def rebuild_neardup_bloom(index_dir: str, *,
                          capacity: int | None = None) -> dict:
    """Rebuild the near-dup Bloom sidecar from the committed band rows
    — one Ray Data task per bucket, partials merged on the driver.
    Default capacity: 4× current (the saturation-growth path)."""
    import ray

    spec = read_index_spec(index_dir)
    gen = int(spec["generation"])
    cap = int(capacity or 4 * spec["bloom_capacity"])
    cap = max(cap, 2 * int(spec["rows"]) * int(spec["bands"]), 1024)
    fpr = float(spec["bloom_fpr"])
    probe = BloomSketch(cap, fpr)
    m, k = probe.m, probe.k

    def build(batch: pa.Table) -> pa.Table:
        s = BloomSketch(1, fpr, _m=m, _k=k)
        for b in np.asarray(batch.column("bucket")):
            t = _read_bucket_band_rows(index_dir, int(b), gen)
            if t is not None:
                s.add_batch(_fold32(
                    np.asarray(t.column("bhash")).view(np.uint64)))
        return pa.table({"blob": pa.array([s.to_bytes()],
                                          type=pa.large_binary())})

    ds = ray.data.from_items(
        [{"bucket": b} for b in range(int(spec["num_buckets"]))])
    merged = BloomSketch(1, fpr, _m=m, _k=k)
    for row in ds.map_batches(build, batch_format="pyarrow").take_all():
        merged.merge(sketch_from_bytes(row["blob"]))

    with open(_bloom_path(index_dir, gen), "wb") as f:
        f.write(merged.to_bytes())
    spec.update(bloom_capacity=cap, bloom_m=m, bloom_k=k)
    _commit_spec(index_dir, spec)
    return spec


def compact_neardup_index(index_dir: str) -> dict:
    """Rewrite each near-dup bucket to one file with exact-duplicate
    band rows (task-retry artifacts) removed — same crash-safety
    argument as ``compact_index``: the compacted file lands at the
    committed generation before the old files are removed."""
    import ray

    spec = read_index_spec(index_dir)
    gen = int(spec["generation"])
    id_col = spec["id_col"]
    if id_col is None:  # never ingested — nothing to compact
        return spec

    def compact(batch: pa.Table) -> pa.Table:
        for b in np.asarray(batch.column("bucket")):
            files = _bucket_files(index_dir, int(b), gen)
            if len(files) <= 1:
                continue
            t = _read_bucket_band_rows(index_dir, int(b), gen)
            if t is None:
                continue
            # keep-first per (bhash, band, id): dup rows are identical
            idx = np.asarray(pc.sort_indices(t, sort_keys=[
                ("bhash", "ascending"), ("band", "ascending"),
                (id_col, "ascending")]))
            g = t.take(pa.array(idx))
            bh = np.asarray(g.column("bhash"))
            bd = np.asarray(g.column("band"))
            ids = g.column(id_col).combine_chunks()
            n = g.num_rows
            keep = np.empty(n, dtype=bool)
            keep[0] = True
            if n > 1:
                same = np.asarray(pc.equal(ids.slice(1), ids.slice(0, n - 1)))
                keep[1:] = (bh[1:] != bh[:-1]) | (bd[1:] != bd[:-1]) | ~same
            g = g.filter(pa.array(keep))
            d = _bucket_dir(index_dir, int(b))
            token = secrets.token_hex(8)
            tmp = os.path.join(d, f".tmp-{token}.parquet")
            pq.write_table(g, tmp)
            os.replace(tmp, os.path.join(
                d, f"gen{gen:08d}-{token}.parquet"))
            for f in files:
                os.remove(f)
        return pa.table({"n": pa.array([batch.num_rows], type=pa.int64())})

    ds = ray.data.from_items(
        [{"bucket": b} for b in range(int(spec["num_buckets"]))])
    ds.map_batches(compact, batch_format="pyarrow").count()
    return spec


# ------------------------------------------------------- maintenance ----

def rebuild_bloom(index_dir: str, *, capacity: int | None = None) -> dict:
    """Rebuild the Bloom sidecar from the committed index parquet — one
    Ray Data task per bucket, partials merged on the driver. Default
    capacity: 4× current (the saturation-growth path)."""
    import ray

    spec = read_index_spec(index_dir)
    gen = int(spec["generation"])
    cap = int(capacity or 4 * spec["bloom_capacity"])
    cap = max(cap, 2 * int(spec["rows"]), 1024)
    fpr = float(spec["bloom_fpr"])
    probe = BloomSketch(cap, fpr)
    m, k = probe.m, probe.k

    def build(batch: pa.Table) -> pa.Table:
        s = BloomSketch(1, fpr, _m=m, _k=k)
        for b in np.asarray(batch.column("bucket")):
            pairs = _read_bucket_pairs(index_dir, int(b), gen)
            s.add_batch(_fold32(pairs["a"]))
        return pa.table({"blob": pa.array([s.to_bytes()],
                                          type=pa.large_binary())})

    ds = ray.data.from_items(
        [{"bucket": b} for b in range(int(spec["num_buckets"]))])
    merged = BloomSketch(1, fpr, _m=m, _k=k)
    for row in ds.map_batches(build, batch_format="pyarrow").take_all():
        merged.merge(sketch_from_bytes(row["blob"]))

    with open(_bloom_path(index_dir, gen), "wb") as f:
        f.write(merged.to_bytes())
    spec.update(bloom_capacity=cap, bloom_m=m, bloom_k=k)
    _commit_spec(index_dir, spec)
    return spec


def compact_index(index_dir: str) -> dict:
    """Rewrite each bucket to one deduplicated file (one Ray Data task
    per bucket). Crash-safe: the compacted file lands (committed
    generation, so immediately visible) before the old files are
    removed — an interruption leaves duplicate membership rows, never
    missing ones."""
    import ray

    spec = read_index_spec(index_dir)
    gen = int(spec["generation"])

    def compact(batch: pa.Table) -> pa.Table:
        total = 0
        for b in np.asarray(batch.column("bucket")):
            files = _bucket_files(index_dir, int(b), gen)
            if len(files) <= 1:
                pairs = _read_bucket_pairs(index_dir, int(b), gen)
                total += len(pairs)
                continue
            pairs = np.unique(_read_bucket_pairs(index_dir, int(b), gen))
            _write_bucket_file(index_dir, int(b), gen,
                               pairs["a"].view(np.int64),
                               pairs["b"].view(np.int64))
            for f in files:
                os.remove(f)
            total += len(pairs)
        return pa.table({"rows": pa.array([total], type=pa.int64())})

    ds = ray.data.from_items(
        [{"bucket": b} for b in range(int(spec["num_buckets"]))])
    rows = sum(r["rows"] for r in
               ds.map_batches(compact, batch_format="pyarrow").take_all())
    spec["rows"] = int(rows)
    _commit_spec(index_dir, spec)
    return spec
