"""Composite-key hashing over Arrow batches.

Re-implements the reference's canonical key hasher
(``/root/reference/src/hash_keys.cpp:81-255`` and ``R/hash_keys.R:13-62``)
as vectorized NumPy over zero-copy Arrow buffers. The contract is the
reference's (``src/hash_keys.cpp:57-68``): two keys that the *join* would
consider equal MUST hash identically, because a Bloom-probe miss is a false
negative that silently drops a matching row. So:

* every numeric-ish storage type (int8..64, uint, float16/32/64, bool,
  date32/64, timestamp) shares ``TAG_NUM`` and is canonicalized to float64
  bit patterns (``1`` == ``1.0`` == ``True``; date == timestamp at equal
  instants, both on a *seconds* scale);
* ``-0.0`` maps to ``+0.0``; every null/NaN maps to one per-tag sentinel
  (null joins null, dplyr ``na_matches = "na"`` semantics);
* strings, large_strings and dictionary-encoded strings share ``TAG_CHR``
  and hash their UTF-8 bytes (dictionary arrays hash decoded *values* — the
  reference's factor == character rule, ``src/hash_keys.cpp:115-144``);
* per-row accumulator seeded with ``0x726F626F746F726F``; each column's
  component hash folded in with ``mix_in(acc, h) = (acc ^ rotl64(h, 23)) *
  0x9e3779b97f4a7c15`` (``src/hash_keys.cpp:74-78``); column order matters.

``hash_keys32`` matches the reference's final xor-fold to 32 bits
(``src/hash_keys.cpp:247-252``). ``hash_keys64`` stops at the 64-bit
``splitmix64`` finalizer — the sketches that need full 64-bit entropy at
10^12-key scale (HLL, MinHash) use it; a 32-bit key hash saturates around
2^32 distincts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

U64 = np.uint64

SEED = U64(0x726F626F746F726F)
# Independent accumulator seed for the grouping collision guard: group
# reduces sort/split on the (SEED, ALT_SEED) hash PAIR, so two distinct
# keys merge only if both 64-bit hashes collide (~2^-128 per pair —
# negligible even at 10^12 keys, vs the birthday-expected collisions a
# single 64-bit hash has at ~10^9+ distinct keys).
ALT_SEED = U64(0xA076_1D64_78BD_642F)
TAG_NUM = U64(0x9AE16A3B2F90404F)
TAG_CHR = U64(0x8A5CD789635D2DFF)
NA_SENTINEL = U64(0xD1B54A32D192ED03)

_FNV_OFFSET = U64(1469598103934665603)
_FNV_PRIME = U64(1099511628211)

_SPLITMIX_C0 = U64(0x9E3779B97F4A7C15)
_SPLITMIX_C1 = U64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = U64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray | np.uint64) -> np.ndarray | np.uint64:
    """Vectorized splitmix64 finalizer (same constants as the reference)."""
    with np.errstate(over="ignore"):
        x = x + _SPLITMIX_C0
        x = (x ^ (x >> U64(30))) * _SPLITMIX_C1
        x = (x ^ (x >> U64(27))) * _SPLITMIX_C2
        return x ^ (x >> U64(31))


def _rotl64(x, r: int):
    return (x << U64(r)) | (x >> U64(64 - r))


def mix_in(acc, h):
    """Fold one component hash into the accumulator (src/hash_keys.cpp:74-78)."""
    with np.errstate(over="ignore"):
        return (acc ^ _rotl64(h, 23)) * _SPLITMIX_C0


# Precomputed scalar component hashes for nulls under each tag.
_NUM_NA_COMPONENT = mix_in(TAG_NUM, splitmix64(NA_SENTINEL))
_CHR_NA_COMPONENT = mix_in(TAG_CHR, NA_SENTINEL)  # string NA skips splitmix64,
# exactly as the reference does (src/hash_keys.cpp:231 vs :161).


def fnv1a64_strings(arr: pa.Array) -> np.ndarray:
    """FNV-1a 64 over each string's UTF-8 bytes, vectorized position-wise.

    Iterates over byte positions (not rows): at step ``j`` every string
    longer than ``j`` bytes folds its j-th byte in one NumPy op. Total work
    is O(total_bytes) with ``max_len`` NumPy dispatches — fast for key-like
    strings. Null slots are left at the FNV offset basis; callers must
    overwrite them with the sentinel component.
    """
    n = len(arr)
    out = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return out
    if pa.types.is_dictionary(arr.type):
        raise TypeError("decode dictionary arrays before hashing")
    offs_dtype = np.int64 if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type) else np.int32
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=offs_dtype)[arr.offset : arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    starts = offsets[:-1]
    lens = offsets[1:] - starts
    max_len = int(lens.max()) if n else 0
    active = np.nonzero(lens > 0)[0]
    j = 0
    with np.errstate(over="ignore"):
        while active.size:
            b = data[starts[active] + j].astype(np.uint64)
            out[active] = (out[active] ^ b) * _FNV_PRIME
            j += 1
            if j >= max_len:
                break
            active = active[lens[active] > j]
    return out


def _null_mask(arr: pa.Array) -> np.ndarray:
    """Boolean ndarray, True where the slot is null."""
    if arr.null_count == 0:
        return np.zeros(len(arr), dtype=bool)
    return np.asarray(arr.is_null())


def _numeric_component(arr: pa.Array, scale: float | None) -> np.ndarray:
    """TAG_NUM component: canonical float64 bits (−0→+0, null/NaN→sentinel)."""
    nulls = _null_mask(arr)
    vals = np.asarray(arr.cast(pa.float64()).fill_null(0.0))
    if scale is not None and scale != 1.0:
        vals = vals * scale
    vals = vals + 0.0  # −0.0 → +0.0
    bits = vals.view(np.uint64).copy()
    bad = nulls | np.isnan(vals)
    if bad.any():
        bits[bad] = NA_SENTINEL
    return mix_in(TAG_NUM, splitmix64(bits))


def _string_component(arr: pa.Array) -> np.ndarray:
    nulls = _null_mask(arr)
    comp = mix_in(TAG_CHR, splitmix64(fnv1a64_strings(arr)))
    if nulls.any():
        comp[nulls] = _CHR_NA_COMPONENT
    return comp


def _component_hash(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-row component hash for one key column."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_dictionary(t):
        # Factor rule: hash the decoded level values (src/hash_keys.cpp:115-144).
        # Precompute one component per dictionary level, then gather by code.
        dict_vals = arr.dictionary
        level_comp = _component_hash(dict_vals)
        codes = np.asarray(arr.indices.fill_null(0))
        if len(level_comp):
            comp = level_comp[codes]
        else:  # dictionary with zero levels (e.g. an all-null column)
            comp = np.zeros(len(arr), dtype=np.uint64)
        nulls = _null_mask(arr)
        if nulls.any():
            na = _CHR_NA_COMPONENT if _is_stringish(dict_vals.type) else _NUM_NA_COMPONENT
            comp = comp.copy()
            comp[nulls] = na
        return comp
    if _is_stringish(t):
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return _string_component(arr)
        return _string_component(arr)
    if pa.types.is_timestamp(t):
        unit_scale = {"s": 1.0, "ms": 1e-3, "us": 1e-6, "ns": 1e-9}[t.unit]
        return _numeric_component(arr.cast(pa.int64()), unit_scale)
    if pa.types.is_date32(t):
        # Date counts days; put it on the seconds scale so date == timestamp
        # at equal instants (src/hash_keys.cpp:108-112).
        return _numeric_component(arr.cast(pa.int32()), 86400.0)
    if pa.types.is_date64(t):
        return _numeric_component(arr.cast(pa.int64()), 1e-3)
    if pa.types.is_boolean(t):
        return _numeric_component(arr, None)
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        return _numeric_component(arr, None)
    if pa.types.is_decimal(t):
        return _numeric_component(arr.cast(pa.float64()), None)
    if pa.types.is_null(t):
        return np.full(len(arr), _NUM_NA_COMPONENT, dtype=np.uint64)
    raise TypeError(f"Unsupported key column type in hash: {t}")


def _is_stringish(t: pa.DataType) -> bool:
    return (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    )


def hash_keys64(table: pa.Table | pa.RecordBatch, by: list[str],
                seed: np.uint64 = SEED) -> np.ndarray:
    """64-bit composite key hash, one uint64 per row; column order matters.
    ``seed=ALT_SEED`` gives an independent second hash of the same keys
    (the grouping collision guard)."""
    if isinstance(by, str):
        by = [by]
    if not by:
        raise ValueError("`by` must contain at least one column.")
    n = table.num_rows
    acc = np.full(n, seed, dtype=np.uint64)
    for name in by:
        if name not in table.schema.names:
            raise KeyError(f"Join column not found: {name}")
        acc = mix_in(acc, _component_hash(table.column(name)))
    return splitmix64(acc)


def hash_keys64_pair(table: pa.Table | pa.RecordBatch,
                     by: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(SEED, ALT_SEED) hash pair in ONE pass over the key bytes: the
    per-column component hashes are seed-independent, so the expensive
    part (position-wise FNV over string columns) runs once and only the
    cheap accumulator fold differs between the two outputs."""
    if isinstance(by, str):
        by = [by]
    if not by:
        raise ValueError("`by` must contain at least one column.")
    n = table.num_rows
    acc1 = np.full(n, SEED, dtype=np.uint64)
    acc2 = np.full(n, ALT_SEED, dtype=np.uint64)
    for name in by:
        if name not in table.schema.names:
            raise KeyError(f"Join column not found: {name}")
        comp = _component_hash(table.column(name))
        acc1 = mix_in(acc1, comp)
        acc2 = mix_in(acc2, comp)
    return splitmix64(acc1), splitmix64(acc2)


def hash_keys32(table: pa.Table | pa.RecordBatch, by: list[str]) -> np.ndarray:
    """32-bit composite key hash (int32), xor-fold of the 64-bit finalizer —
    the reference's public hasher (src/hash_keys.cpp:247-252)."""
    h = hash_keys64(table, by)
    return (h ^ (h >> U64(32))).astype(np.uint32).view(np.int32)
