"""Batch edit-distance kernels for the fuzzy string join.

Levenshtein here is BYTE-level over UTF-8 (unit-cost insert / delete /
substitute, no transpositions) — exactly what DuckDB's ``levenshtein``
and Postgres fuzzystrmatch compute (multi-byte codepoints count once
per byte), so the SQL oracle pins the operator bit-for-bit. For ASCII
data (names, codes, SKUs — the short-key domain the join targets) byte
== character.

``levenshtein_batch`` is Myers' bit-parallel algorithm (Myers 1999,
"A fast bit-vector algorithm for approximate string matching") run
SIDEWAYS: instead of one string pair at a time, every uint64 bit-vector
(Pv/Mv/Ph/Mh/Eq) is a NumPy array over the whole pair batch, so each of
the ``max_len(text)`` steps advances EVERY pair at once — no per-pair
Python. The pattern side (the shorter string of each pair) must fit a
machine word: min(len_a, len_b) ≤ 64 bytes per pair.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_U1 = np.uint64(1)
_U0 = np.uint64(0)


def _flat_bytes(arr) -> tuple[np.ndarray, np.ndarray]:
    """UTF-8 byte buffer + int64 offsets of a string/binary Array (nulls
    forbidden — the join drops them upstream)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        arr = pa.array(list(arr), type=pa.string())
    if arr.null_count:
        raise ValueError("levenshtein_batch: null strings not allowed")
    arr = arr.cast(pa.binary()) if pa.types.is_string(arr.type) else arr
    buffers = arr.buffers()
    off_dtype = (np.int64 if pa.types.is_large_binary(arr.type)
                 else np.int32)
    offs = np.frombuffer(buffers[1], dtype=off_dtype)[
        arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    data = (np.frombuffer(buffers[2], dtype=np.uint8)
            if buffers[2] is not None else np.empty(0, np.uint8))
    return data, offs


def _padded(data: np.ndarray, offs: np.ndarray, width: int) -> np.ndarray:
    """(rows, width) uint8 matrix; padding slot 0 (pattern pad never
    matches text pad because the TEXT matrix pads with 1)."""
    n = len(offs) - 1
    lens = np.diff(offs)
    out = np.zeros((n, width), dtype=np.uint8)
    col = np.arange(width)
    mask = col[None, :] < lens[:, None]
    if data.size:
        idx = offs[:-1, None] + col[None, :]
        out[mask] = data[np.minimum(idx, len(data) - 1)[mask]]
    return out


def levenshtein_batch(a, b) -> np.ndarray:
    """Pairwise byte-level Levenshtein distances of two equal-length
    string batches; returns int64 (rows,). Per pair, the SHORTER string
    must be ≤ 64 bytes (raises otherwise)."""
    da, oa = _flat_bytes(a)
    db, ob = _flat_bytes(b)
    la, lb = np.diff(oa), np.diff(ob)
    n = len(la)
    if n != len(lb):
        raise ValueError("levenshtein_batch: batch lengths differ")
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # pattern = shorter side of each pair
    swap = la > lb
    plen = np.where(swap, lb, la).astype(np.int64)
    tlen = np.where(swap, la, lb).astype(np.int64)
    if plen.max(initial=0) > 64:
        raise ValueError("levenshtein_batch: min(len_a, len_b) must be "
                         "<= 64 bytes per pair")
    wa = int(la.max(initial=0)) or 1
    wb = int(lb.max(initial=0)) or 1
    ma = _padded(da, oa, wa)
    mb = _padded(db, ob, wb)
    wp, wt = max(min(wa, wb), 1), max(wa, wb)
    pat = np.zeros((n, wp), dtype=np.uint8)
    txt = np.ones((n, wt), dtype=np.uint8)  # pad 1 != pattern pad 0
    pat[swap] = mb[swap][:, :wp]   # pattern bytes live in [:plen] <= wp
    pat[~swap] = ma[~swap][:, :wp]
    txt[swap, :wa] = ma[swap]
    txt[~swap, :wb] = mb[~swap]
    # zero pattern bytes beyond plen, one text bytes beyond tlen
    pc_ = np.arange(wp)
    pat[pc_[None, :] >= plen[:, None]] = 0
    tc = np.arange(wt)
    txt[tc[None, :] >= tlen[:, None]] = 1

    powers = _U1 << np.arange(64, dtype=np.uint64)
    score = plen.astype(np.int64).copy()
    empty_pat = plen == 0
    with np.errstate(over="ignore"):
        pv = np.where(empty_pat, _U0,
                      (_U1 << np.minimum(plen, 63).astype(np.uint64))
                      * np.where(plen == 64, np.uint64(2), _U1) - _U1)
        pmask = pv.copy()  # confine Eq to the pattern's m bits
        mv = np.zeros(n, dtype=np.uint64)
        top = np.where(empty_pat, _U0,
                       _U1 << np.maximum(plen - 1, 0).astype(np.uint64))
        full = np.uint64(0xFFFFFFFFFFFFFFFF)
        for j in range(wt):
            act = j < tlen
            # Eq: bits of pattern positions matching text byte j
            m = pat == txt[:, j][:, None]            # (n, wp) bool
            eq = (m.astype(np.uint64) * powers[:wp][None, :]).sum(
                axis=1, dtype=np.uint64) & pmask
            xv = eq | mv
            xh = (((eq & pv) + pv) ^ pv) | eq
            ph = mv | (full ^ (xh | pv))
            mh = pv & xh
            inc = (ph & top) != 0
            dec = (mh & top) != 0
            score = np.where(act, score + inc.astype(np.int64)
                             - dec.astype(np.int64), score)
            ph = (ph << _U1) | _U1
            mh = mh << _U1
            pv_new = mh | (full ^ (xv | ph))
            mv_new = ph & xv
            pv = np.where(act, pv_new, pv)
            mv = np.where(act, mv_new, mv)
    # empty pattern: distance is the text length
    return np.where(empty_pat, tlen, score).astype(np.int64)


def deletion_variant_hashes(arr, d: int,
                            max_bytes: int = 64
                            ) -> tuple[np.ndarray, np.ndarray]:
    """All ≤ ``d``-byte-deletion variant hashes of every string (the
    SymSpell candidate key set): if byte-Levenshtein(a, b) ≤ d then a
    and b SHARE at least one variant hash (delete, per side, the bytes
    an optimal alignment edits — ≤ d each — and the remainders are the
    same string). Returns ``(hashes, row_idx)`` flat pairs, uint64 /
    int64; includes the 0-deletion hash, so exact equals always collide.

    Hashes are a degree-weighted polynomial over bytes mod 2^64 —
    variants are HASHED, never materialized: single deletions combine a
    prefix-hash row with a suffix tail sum; double deletions add the
    middle range as a wrap-safe cumsum difference. O(rows · L · d²)
    numpy work, no per-row Python. Collisions only widen candidate
    sets (the verify pass computes true distances); they never lose
    pairs. ``d`` ∈ {0, 1, 2}; strings ≤ ``max_bytes`` (raise)."""
    if d not in (0, 1, 2):
        raise ValueError("deletion_variant_hashes supports d in {0,1,2}")
    data, offs = _flat_bytes(arr)
    lens = np.diff(offs)
    n = len(lens)
    if n and lens.max(initial=0) > max_bytes:
        raise ValueError(f"edit-distance join strings must be <= "
                         f"{max_bytes} bytes (got {int(lens.max())})")
    width = int(lens.max(initial=0)) or 1
    mat = _padded(data, offs, width).astype(np.uint64)
    base = np.uint64(0x100000001B3)  # odd 64-bit multiplier (FNV prime)
    with np.errstate(over="ignore"):
        pow_ = np.empty(width + 1, dtype=np.uint64)
        pow_[0] = _U1
        for i in range(width):
            pow_[i + 1] = pow_[i] * base
        col = np.arange(width)
        valid = col[None, :] < lens[:, None]
        # offset every byte by 1 so a 0x00 byte != absent (length is
        # mixed in via the degree weighting)
        bumped = np.where(valid, mat + _U1, _U0)
        # full hash: sum c[i] * B^(L-1-i)
        wfull = np.where(valid, bumped * pow_[np.maximum(
            lens[:, None] - 1 - col[None, :], 0)], _U0)
        h0 = wfull.sum(axis=1, dtype=np.uint64)
        rows = [h0]
        idxs = [np.arange(n, dtype=np.int64)]
        if d >= 1 and n:
            # P[p] = hash of s[:p]; computed cumulatively
            pref = np.zeros((n, width + 1), dtype=np.uint64)
            for p in range(width):
                pref[:, p + 1] = pref[:, p] * base + bumped[:, p]
            # T1[p] = sum_{i>=p} c[i] B^(L-1-i)  (weights of the FULL
            # string); T2 likewise with B^(L-2-i) for the shifted tail
            t1 = np.zeros((n, width + 1), dtype=np.uint64)
            t1[:, :width] = np.cumsum(wfull[:, ::-1], axis=1,
                                      dtype=np.uint64)[:, ::-1]
            p_grid = np.arange(width)
            # del1(p) = P[p] * B^(L-1-p) + T1[p+1]  for p < L
            e1 = np.maximum(lens[:, None] - 1 - p_grid[None, :], 0)
            h1 = pref[:, :width] * pow_[e1] + t1[:, 1:width + 1]
            m1 = p_grid[None, :] < lens[:, None]
            rows.append(h1[m1])
            idxs.append(np.nonzero(m1)[0].astype(np.int64))
        if d >= 2 and n:
            w2 = np.where(valid, bumped * pow_[np.maximum(
                lens[:, None] - 2 - col[None, :], 0)], _U0)
            t2 = np.zeros((n, width + 1), dtype=np.uint64)
            t2[:, :width] = np.cumsum(w2[:, ::-1], axis=1,
                                      dtype=np.uint64)[:, ::-1]
            # del2(p, q), p < q < L:
            #   P[p]·B^(L-2-p) + (T2[p+1] - T2[q]) + T1[q+1]
            pg = np.arange(width)[None, :, None]     # p
            qg = np.arange(width)[None, None, :]     # q
            e2 = np.maximum(lens[:, None, None] - 2 - pg, 0)
            h2 = (pref[:, :width, None] * pow_[e2]
                  + (t2[:, 1:width + 1, None] - t2[:, None, :width])
                  + t1[:, None, 1:width + 1])
            m2 = (pg < qg) & (qg < lens[:, None, None])
            rows.append(h2[m2])
            idxs.append(np.nonzero(m2)[0].astype(np.int64))
        return np.concatenate(rows), np.concatenate(idxs)
