"""Incremental dedup against a persisted corpus index — the
daily-ingest workflow at 100 TB: the corpus you already accepted never
moves again; each new increment pays one packed bucket exchange over
ITSELF plus bucket-aligned reads of only the index buckets its
candidates fall in.

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
    spec = {"generation": 0, "num_buckets": int(num_buckets),
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
                      update_index: bool = True):
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
    _commit_spec(index_dir, spec)

    if merged.fill_ratio() > 0.5:
        rebuild_bloom(index_dir)

    return survivors.map_batches(
        lambda t: t.drop_columns(["_ch1", "_ch2"]),
        batch_format="pyarrow")


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
