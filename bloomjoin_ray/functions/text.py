"""Vectorized text-analysis kernels for training-data pipelines: token
counting, quality scoring, language ID (n-gram/stopword heuristic),
document fingerprinting, shingling and content hashing.

All functions take/return Arrow or NumPy arrays and are meant to run
inside ``map_batches``; regexes and profiles are module-level so actor
pools compile them once per process.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS_RE = re.compile(r"\s+")
_PUNCT_SET = ".,;:!?"

# Tiny deterministic stopword profiles for language ID. A real pipeline
# would ship fastText lid.176; this is the dependency-free heuristic tier:
# score = fraction of tokens in each language's closed-class word list.
_LANG_PROFILES: dict[str, frozenset] = {
    "en": frozenset("the a of and to in is it you that was for on are with as i his they be at".split()),
    "de": frozenset("der die das und ist ich nicht ein eine zu den von mit sich des auf für im".split()),
    "fr": frozenset("le la les de des et un une est je ne pas que pour dans ce il au du sur".split()),
    "es": frozenset("el la los las de y un una es en que no por con para su al lo como más".split()),
    "it": frozenset("il lo la i gli le di e un una è che non per con del in da su al".split()),
}


def _strings_to_list(arr) -> list:
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        return arr.to_pylist()
    return list(arr)


def token_count(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace token count (number of ``\\S+`` runs), vectorized via
    Arrow kernels. SQL parity: ``len(list_filter(string_split_regex(text,
    '\\s+'), x -> x <> ''))``."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    counts = pc.count_substring_regex(texts, r"\S+")
    return counts.cast(pa.int64())


def char_count(texts) -> pa.Array:
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    return pc.utf8_length(texts).cast(pa.int64())


def punct_count(texts) -> pa.Array:
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    return pc.count_substring_regex(texts, r"[.,;:!?]").cast(pa.int64())


def quality_metrics(texts) -> dict[str, pa.Array]:
    """Per-document quality columns: n_chars, n_tokens, n_punct,
    avg_token_len, punct_ratio. All exactly SQL-expressible for the
    correctness oracle."""
    n_chars = char_count(texts)
    n_tokens = token_count(texts)
    n_punct = punct_count(texts)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    nonspace = pc.count_substring_regex(texts, r"\S").cast(pa.int64())
    tok_f = n_tokens.cast(pa.float64())
    chars_f = n_chars.cast(pa.float64())
    avg_tok = pc.if_else(pc.greater(tok_f, 0.0),
                         pc.divide(nonspace.cast(pa.float64()), pc.max_element_wise(tok_f, 1.0)),
                         pa.scalar(0.0))
    punct_ratio = pc.if_else(pc.greater(chars_f, 0.0),
                             pc.divide(n_punct.cast(pa.float64()), pc.max_element_wise(chars_f, 1.0)),
                             pa.scalar(0.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_punct": n_punct,
        "avg_token_len": avg_tok,
        "punct_ratio": punct_ratio,
    }


def detect_language(texts) -> pa.Array:
    """Best-scoring stopword profile per document; 'und' (undetermined)
    when no profile matches any token. Deterministic; ties broken by
    profile order en>de>fr>es>it."""
    out = []
    for t in _strings_to_list(texts):
        if t is None:
            out.append(None)
            continue
        toks = _WS_RE.split(t.lower())
        if not toks:
            out.append("und")
            continue
        best_lang, best = "und", 0.0
        for lang, words in _LANG_PROFILES.items():
            score = sum(1 for w in toks if w in words)
            if score > best:
                best, best_lang = score, lang
        out.append(best_lang)
    return pa.array(out, type=pa.string())


def content_hash64(texts) -> np.ndarray:
    """Stable 64-bit content hash (first 8 bytes of sha1 over UTF-8) —
    the exact-dedup key. hashlib is C-speed per string; for long document
    text this beats a position-wise vectorized hash."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(_strings_to_list(texts)):
        b = b"\x00" if t is None else t.encode("utf-8", "surrogatepass")
        out[i] = np.frombuffer(hashlib.sha1(b).digest()[:8], dtype=np.uint64)[0]
    return out


def fingerprint64(texts, window: int = 4) -> np.ndarray:
    """Order-sensitive document fingerprint: min-of-rolling-hash over word
    ``window``-grams (a winnowing-style signature). Equal fingerprints ⇒
    likely shared passages; used as a cheap near-dup pre-cluster key."""
    prime = np.uint64(1099511628211)
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(_strings_to_list(texts)):
        if not t:
            out[i] = 0
            continue
        toks = _WS_RE.split(t.strip().lower())
        if len(toks) < window:
            toks = toks + [""] * (window - len(toks))
        hs = np.array([np.uint64(int(hashlib.blake2b(w.encode(), digest_size=8).hexdigest(), 16))
                       for w in toks], dtype=np.uint64)
        with np.errstate(over="ignore"):
            acc = hs[: len(hs) - window + 1].copy()
            for j in range(1, window):
                acc = acc * prime ^ hs[j : len(hs) - window + 1 + j]
        out[i] = acc.min() if acc.size else 0
    return out


def word_ngram_hashes(text: str | None, n: int = 3) -> np.ndarray:
    """Word n-gram hash set (uint64) of one document — the right shingle
    granularity for small-vocabulary corpora where every character
    k-shingle is document-frequency-pruned away."""
    if not text:
        return np.empty(0, dtype=np.uint64)
    toks = _WS_RE.split(text.strip().lower())
    if len(toks) < n:
        toks = toks + [""] * (n - len(toks))
    hs = np.array([np.uint64(int(hashlib.blake2b(w.encode(), digest_size=8).hexdigest(), 16))
                   for w in toks], dtype=np.uint64)
    m = len(hs) - n + 1
    with np.errstate(over="ignore"):
        acc = hs[:m].copy()
        prime = np.uint64(1099511628211)
        for j in range(1, n):
            acc = acc * prime ^ hs[j : m + j]
    return np.unique(acc)


def shingle_hashes(text: str | None, k: int = 5) -> np.ndarray:
    """Character k-shingle hash set (uint64) of one document — the input
    universe for MinHash / exact Jaccard."""
    if not text:
        return np.empty(0, dtype=np.uint64)
    b = text.lower().encode("utf-8", "surrogatepass")
    if len(b) < k:
        b = b + b"\x00" * (k - len(b))
    arr = np.frombuffer(b, dtype=np.uint8)
    n = len(arr) - k + 1
    with np.errstate(over="ignore"):
        h = np.full(n, np.uint64(1469598103934665603))
        prime = np.uint64(1099511628211)
        for j in range(k):
            h = (h ^ arr[j : j + n].astype(np.uint64)) * prime
    return np.unique(h)
