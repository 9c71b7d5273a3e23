"""Ray Data stages for the distributed Bloom build + probe passes.

The reference builds and probes its filter in one C-stack frame
(``/root/reference/src/BloomFilter.cpp:86-165``). Distributed, that splits
into:

* **partial build** — a ``map_batches`` pass over the build side's key
  columns only (column-pruned read). Each block emits ONE partial row:
  either its deduped raw key hashes (when that is smaller — the common
  case for small blocks) or a serialized Bloom filter with the globally
  agreed ``(m, k)``. Adaptive choice keeps the merge traffic at
  ``min(4·distincts, m/8)`` bytes per block.
* **tree merge** — pairwise ``ray.remote`` reduction when there are many
  partials, driver-side fold otherwise. All partials share one global
  ``(m, k, seeds)``, so OR-merge is exact.
* **probe** — stateless ``map_batches`` tasks; the merged filter travels
  once via ``ray.put`` and each task reads it zero-copy from its node's
  object store. A counter actor collects pruned/retained totals for the
  JoinReport without blocking the stream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.keys import hash_keys32
from ..state.bloom import BloomSketch

_TREE_MERGE_FANIN = 32


class BloomPartialBuildFn:
    """Callable map_batches stage: block → one partial row
    (kind: 'keys' | 'bloom', payload: bytes). ``key_hash_fn`` overrides
    the canonical ``hash_keys32`` for columns that are ALREADY uniform
    hashes (full-range int64 the canonicalizer would reject — e.g.
    decontamination n-gram hashes); it must be an importable callable
    ``(table, key_cols) -> int32 ndarray``."""

    def __init__(self, key_cols: list[str], m_bits: int, k: int,
                 key_hash_fn=None):
        self.key_cols = key_cols
        self.m_bits = m_bits
        self.k = k
        self.key_hash_fn = key_hash_fn or hash_keys32

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = np.unique(self.key_hash_fn(batch, self.key_cols))
        if keys.nbytes <= self.m_bits // 8:
            kind, payload = "keys", keys.tobytes()
        else:
            f = BloomSketch(1, 0.01, _m=self.m_bits, _k=self.k)
            f.add_batch(keys)
            kind, payload = "bloom", f.to_bytes()
        return pa.table({"kind": [kind], "payload": [payload]})


def _merge_rows_into(f: BloomSketch, kinds, payloads) -> BloomSketch:
    key_parts = []
    for kind, payload in zip(kinds, payloads):
        if kind == "keys":
            key_parts.append(np.frombuffer(payload, dtype=np.int32))
        else:
            f.merge(BloomSketch.from_bytes(payload))
    if key_parts:
        f.add_batch(np.concatenate(key_parts))
    return f


def build_bloom_filter(ds, key_cols: list[str], expected_elements: int,
                       fpr: float, m_bits: int, k: int,
                       key_hash_fn=None) -> BloomSketch:
    """Full build pass: column-pruned read → per-block partials →
    (tree-)merge → one filter. ``key_hash_fn`` as in
    ``BloomPartialBuildFn``."""
    import ray

    partials = ds.select_columns(list(key_cols)).map_batches(
        BloomPartialBuildFn(list(key_cols), m_bits, k, key_hash_fn),
        batch_format="pyarrow",
    ).take_all()

    def new_filter() -> BloomSketch:
        f = BloomSketch(expected_elements, fpr, _m=m_bits, _k=k)
        f.expected_elements = expected_elements
        f.fpr = fpr
        return f

    if len(partials) > _TREE_MERGE_FANIN:
        @ray.remote
        def merge_chunk(rows) -> bytes:
            f = _merge_rows_into(new_filter(),
                                 [r["kind"] for r in rows],
                                 [r["payload"] for r in rows])
            return f.to_bytes()

        refs = [merge_chunk.remote(partials[i : i + _TREE_MERGE_FANIN])
                for i in range(0, len(partials), _TREE_MERGE_FANIN)]
        merged = new_filter()
        for blob in ray.get(refs):
            merged.merge(BloomSketch.from_bytes(blob))
        return merged
    return _merge_rows_into(new_filter(),
                            [r["kind"] for r in partials],
                            [r["payload"] for r in partials])


def build_fuse_filter(ds, key_cols: list[str], fpr: float,
                      max_bits: int | None = None):
    """``engine="fuse"`` build pass: column-pruned read → per-block
    DISTINCT 64-bit key hashes → driver-side global unique → xor filter
    construction (xor filters are not mergeable, so all distinct keys
    meet in one place).

    The planner budgets the gather via ``max_filter_bits`` using a
    sample-based *estimate*; ``max_bits`` re-checks the ACTUAL gathered
    key count so an undercounting estimate cannot blow driver memory.
    Returns ``None`` when the real gather overruns the budget — the
    caller falls back to the mergeable bloom engine."""
    from ..functions.keys import hash_keys64
    from ..state.xorfuse import XorFuseFilter, fingerprint_bits_for

    import ray

    from ..pipelines.exchange import stream_arrow_refs

    def per_block(batch: pa.Table) -> pa.Table:
        h = np.unique(hash_keys64(batch, key_cols))
        return pa.table({"h": pa.array(h.view(np.int64))})

    refs = stream_arrow_refs(
        ds.select_columns(list(key_cols)).map_batches(
            per_block, batch_format="pyarrow"))
    # budget in 64-bit keys; raw (pre-unique) gather may hold per-block
    # duplicates, so allow 4x headroom on the running total before
    # bailing — peak driver memory stays O(budget) either way.
    budget_keys = None if max_bits is None else max(max_bits // 64, 1)
    parts, total = [], 0
    for r in refs:
        t = ray.get(r)
        if not t.num_rows:
            continue
        parts.append(np.asarray(t.column("h"), dtype=np.int64)
                     .view(np.uint64))
        total += t.num_rows
        if budget_keys is not None and total > 4 * budget_keys:
            return None
    hashes = (np.unique(np.concatenate(parts)) if parts
              else np.empty(0, dtype=np.uint64))
    if budget_keys is not None and hashes.size > budget_keys:
        return None
    return XorFuseFilter.build(hashes,
                               fingerprint_bits=fingerprint_bits_for(fpr))


def fuse_probe_fn(filter_ref, key_cols: list[str], counter=None):
    """Probe stage for the xor filter — same contract as
    ``bloom_probe_fn`` (64-bit canonical key hashes, zero false
    negatives, prune counter)."""
    import ray

    def prune(batch: pa.Table) -> pa.Table:
        from ..functions.keys import hash_keys64

        f = ray.get(filter_ref)
        keep = f.contains_batch(hash_keys64(batch, key_cols))
        if counter is not None:
            counter.add.remote(len(keep), int(keep.sum()))
        return batch.filter(pa.array(keep))

    return prune


def make_prune_counter():
    """Zero-CPU counter actor fed fire-and-forget from probe tasks."""
    import ray

    @ray.remote(num_cpus=0)
    class _PruneCounter:
        def __init__(self):
            self.probed = 0
            self.retained = 0

        def add(self, probed: int, retained: int) -> None:
            self.probed += probed
            self.retained += retained

        def totals(self):
            return self.probed, self.retained

    return _PruneCounter.remote()


def bloom_probe_fn(filter_ref, key_cols: list[str], counter=None):
    """Stateless probe stage: keep rows whose key hash may be in the
    filter. The ObjectRef resolves zero-copy per task."""
    import ray

    def prune(batch: pa.Table) -> pa.Table:
        f: BloomSketch = ray.get(filter_ref)
        keep = f.contains_batch(hash_keys32(batch, key_cols))
        if counter is not None:
            counter.add.remote(len(keep), int(keep.sum()))
        return batch.filter(pa.array(keep))

    return prune
