"""Deterministic dataset splitting (train/val/test) by content hash.

The split of a row depends only on its key's canonical 64-bit hash —
never on partitioning, block order, or a random seed — so re-running on
a reshuffled or incrementally-grown corpus keeps every existing row in
its original split (the property a training pipeline actually needs;
``Dataset.split_proportionately`` is positional and loses it). Each
output is a lazy filtered view: no shuffle, no materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.keys import hash_keys64


def split_by_hash(ds, key_cols, fractions: dict[str, float],
                  *, seed_salt: str = ""):
    """Partition ``ds`` into named splits by hash of ``key_cols``.

    ``fractions`` maps split name → fraction; must sum to ≤ 1 (any
    remainder is dropped — useful for subsampling). Returns
    ``{name: Dataset}``. Rows with equal keys always land in the same
    split (dedup-safe). ``seed_salt`` derives an independent split
    assignment from the same keys (e.g. per-epoch holdouts).
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    names = list(fractions)
    edges = np.cumsum([fractions[n] for n in names])
    # exact integer comparison on the hash's top 53 bits: float64 edges
    # at 2^64 would round and could drop/duplicate boundary rows; 53-bit
    # cuts are exactly representable, and a 1.0 edge (2^53) strictly
    # exceeds every 53-bit hash prefix, so nothing is ever lost
    cuts = [int(round(float(e) * (1 << 53))) for e in edges]

    if seed_salt:
        from ..functions.keys import fnv1a64_strings, splitmix64

        # the salt hash is a per-call constant — compute it once, not
        # per row per batch
        salt_h = np.uint64(splitmix64(fnv1a64_strings(
            pa.array([seed_salt], type=pa.string())))[0])
    else:
        salt_h = None

    def make_filter(lo: int, hi: int):
        def fn(batch: pa.Table) -> pa.Table:
            h = hash_keys64(batch, key_cols)
            if salt_h is not None:
                from ..functions.keys import mix_in, splitmix64

                h = splitmix64(mix_in(
                    h, np.full(len(h), salt_h, dtype=np.uint64)))
            h53 = (h >> np.uint64(11)).astype(np.int64)
            return batch.filter(pa.array((h53 >= lo) & (h53 < hi)))

        return fn

    out = {}
    lo = 0
    for name, hi in zip(names, cuts):
        out[name] = ds.map_batches(make_filter(lo, hi),
                                   batch_format="pyarrow")
        lo = hi
    return out


def mix_corpora(parts, key_cols, *, source_col: str | None = None,
                seed_salt: str = ""):
    """Weighted deterministic mixture of several corpora — the
    training-data "mix 30% of web + all of wiki + 5% of code" step.

    ``parts`` is a list of ``(name, ds, fraction)``; each corpus is
    subsampled by the same content-hash Bernoulli as ``split_by_hash``
    (partition-invariant, growth-stable, duplicate-safe), with the
    corpus ``name`` mixed into the draw so corpora sample independently
    even over shared keys. ``source_col`` (optional) tags every row with
    its corpus name. Returns the lazy union — one streaming filter per
    corpus, no shuffle, nothing materialized. Schemas must align
    (the usual Ray Data ``union`` contract).
    """
    from ..functions.keys import fnv1a64_strings, mix_in, splitmix64

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not parts:
        raise ValueError("parts must be non-empty")
    seen = set()
    for name, _ds, frac in parts:
        if not 0.0 <= float(frac) <= 1.0:
            raise ValueError(
                f"fraction for {name!r} must be in [0, 1], got {frac}")
        if name in seen:
            raise ValueError(f"duplicate corpus name {name!r}")
        seen.add(name)

    def make_fn(name: str, cut: int):
        salt_h = np.uint64(splitmix64(fnv1a64_strings(
            pa.array([f"{seed_salt}|{name}"], type=pa.string())))[0])

        def fn(batch: pa.Table) -> pa.Table:
            h = hash_keys64(batch, key_cols)
            h = splitmix64(mix_in(
                h, np.full(len(h), salt_h, dtype=np.uint64)))
            h53 = (h >> np.uint64(11)).astype(np.int64)
            sub = batch.filter(pa.array(h53 < cut))
            if source_col:
                sub = sub.append_column(
                    source_col, pa.array([name] * sub.num_rows,
                                         type=pa.string()))
            return sub

        return fn

    pieces = [
        ds.map_batches(
            make_fn(name, int(round(float(frac) * (1 << 53)))),
            batch_format="pyarrow")
        for name, ds, frac in parts
    ]
    return pieces[0] if len(pieces) == 1 else pieces[0].union(*pieces[1:])


def stratified_sample(ds, strata_col: str, fractions: dict, key_cols,
                      *, default: float = 1.0, seed_salt: str = ""):
    """Deterministic per-stratum subsampling — the data-mixture
    rebalance step (keep 10% of `web`, all of `wiki`, …). ``fractions``
    maps a stratum value of ``strata_col`` → keep fraction in [0, 1];
    strata absent from the map keep ``default``. The draw is the same
    content-hash Bernoulli as ``split_by_hash`` over ``key_cols`` (53-bit
    exact-integer threshold), so the selection is partition-invariant,
    growth-stable (new rows never flip old decisions), duplicate-safe
    (equal keys draw identically), and ``seed_salt`` derives independent
    resamples. One streaming filter pass: no shuffle, nothing
    materialized, a row never leaves its block."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    for v, f in fractions.items():
        if not 0.0 <= float(f) <= 1.0:
            raise ValueError(f"fraction for {v!r} must be in [0, 1], got {f}")
    if not 0.0 <= float(default) <= 1.0:
        raise ValueError(f"default fraction must be in [0, 1], got {default}")
    names = list(fractions)
    # exact 53-bit integer thresholds (see split_by_hash): a 1.0 cut is
    # 2^53, strictly above every 53-bit hash prefix — nothing dropped
    cuts = np.array([int(round(float(fractions[n]) * (1 << 53)))
                     for n in names] + [int(round(float(default) * (1 << 53)))],
                    dtype=np.int64)
    value_set = pa.array(names)

    if seed_salt:
        from ..functions.keys import fnv1a64_strings, splitmix64

        salt_h = np.uint64(splitmix64(fnv1a64_strings(
            pa.array([seed_salt], type=pa.string())))[0])
    else:
        salt_h = None

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        h = hash_keys64(batch, key_cols)
        if salt_h is not None:
            from ..functions.keys import mix_in, splitmix64

            h = splitmix64(mix_in(
                h, np.full(len(h), salt_h, dtype=np.uint64)))
        h53 = (h >> np.uint64(11)).astype(np.int64)
        idx = pc.index_in(batch.column(strata_col), value_set=value_set)
        idx = np.asarray(pc.fill_null(idx, len(names))).astype(np.int64)
        return batch.filter(pa.array(h53 < cuts[idx]))

    return ds.map_batches(fn, batch_format="pyarrow")
