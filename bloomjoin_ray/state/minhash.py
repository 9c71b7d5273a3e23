"""MinHash signatures + SimHash fingerprints for near-duplicate detection.

MinHash: ``num_perm`` permutations approximated by seeded splitmix64
re-mixes of the shingle hash universe (one pass per doc, vectorized:
``sig[j] = min over shingles of mix_j(shingle)``). Signature equality rate
estimates Jaccard similarity; LSH banding (``bands × rows = num_perm``)
turns "Jaccard ≥ τ" into bucket collisions with the standard S-curve
``P(collide) = 1 − (1 − s^rows)^bands``.

SimHash: 64-bit hyperplane-free variant for token multisets — each token
hash votes ±1 per bit; the sign vector is the fingerprint; Hamming
distance approximates cosine distance of the token frequency vectors.
"""

from __future__ import annotations

import numpy as np

from ..functions.keys import splitmix64

U64 = np.uint64


def minhash_signature(shingles: np.ndarray, num_perm: int = 128,
                      seed: int = 0x5EED) -> np.ndarray:
    """(num_perm,) uint64 signature of a shingle-hash set."""
    return minhash_signatures_batch([shingles], num_perm, seed)[0]


def minhash_signatures_batch(shingle_sets: list[np.ndarray],
                             num_perm: int = 128,
                             seed: int = 0x5EED) -> np.ndarray:
    """(n_docs, num_perm) signatures from a list of per-doc shingle-hash
    arrays — concatenates once and delegates to the flat kernel."""
    sizes = np.array([s.size for s in shingle_sets], dtype=np.int64)
    flat = (np.concatenate([s.astype(np.uint64, copy=False)
                            for s in shingle_sets if s.size])
            if sizes.sum() else np.empty(0, dtype=np.uint64))
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    return minhash_signatures_flat(flat, offsets, num_perm, seed)


def minhash_signatures_flat(flat: np.ndarray, offsets: np.ndarray,
                            num_perm: int = 128,
                            seed: int = 0x5EED) -> np.ndarray:
    """(n_docs, num_perm) signatures over a FLAT shingle-hash array with
    per-doc ``offsets`` (the layout ``shingle_hashes_batch`` emits): one
    mixing pass per permutation over the whole flat array, per-doc minima
    via ``np.minimum.reduceat`` — no per-doc Python loop (the map_batches
    hot path for MinHash dedup). Empty docs get the all-max signature."""
    n = len(offsets) - 1
    out = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    sizes = np.diff(offsets)
    nonempty = sizes > 0
    if not nonempty.any():
        return out
    bounds = np.asarray(offsets[:-1][nonempty], dtype=np.int64)
    flat = flat.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        for j in range(num_perm):
            mixed = splitmix64(flat ^ U64((seed + j * 0x9E3779B97F4A7C15)
                                          & 0xFFFFFFFFFFFFFFFF))
            out[nonempty, j] = np.minimum.reduceat(mixed, bounds)
    return out


def signature_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """MinHash Jaccard estimate: fraction of equal signature slots."""
    return float((a == b).mean())


def band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(bands,) uint64: one hash per contiguous signature band."""
    return band_hashes_batch(sig[None, :], bands)[0]


def band_hashes_batch(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) band hashes for a whole signature matrix — one
    FNV fold pass per band row, vectorized across every doc."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    view = sigs[:, : bands * rows].reshape(n, bands, rows)
    with np.errstate(over="ignore"):
        h = np.full((n, bands), U64(1469598103934665603))
        for r in range(rows):
            h = (h ^ view[:, :, r]) * U64(1099511628211)
        h = splitmix64(h)
    return h


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> np.uint64:
    """64-bit SimHash of a token-hash multiset."""
    if token_hashes.size == 0:
        return np.uint64(0)
    h = token_hashes.astype(np.uint64, copy=False)
    w = np.ones(len(h)) if weights is None else np.asarray(weights, dtype=np.float64)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & U64(1)).astype(np.float64)
    votes = (bits * 2.0 - 1.0).T @ w
    out = np.uint64(0)
    for b in range(64):
        if votes[b] > 0:
            out |= U64(1) << U64(b)
    return out


def hamming64(a: np.ndarray, b: np.ndarray | np.uint64) -> np.ndarray:
    """Vectorized Hamming distance between uint64 fingerprints."""
    x = np.bitwise_xor(a, b)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & U64(1)).astype(np.int64)
        x = x >> U64(1)
    return cnt
