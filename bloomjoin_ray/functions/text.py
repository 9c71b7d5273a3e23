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

from .keys import fnv1a64_strings, splitmix64

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


def _as_string_array(texts) -> pa.Array:
    """Normalize any text input to one pa.string() Array (lists →
    Arrow, chunked → combined, all-null blocks' null type → string)."""
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(_strings_to_list(texts), type=pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if pa.types.is_null(texts.type):
        texts = texts.cast(pa.string())
    return texts


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
    profile order en>de>fr>es>it.

    Vectorized: one Arrow lower+split pass over the batch, then one
    ``pc.is_in`` membership pass per language over the flat token array
    with per-doc segment sums — no per-row Python."""
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(_strings_to_list(texts), type=pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    nulls = np.asarray(pc.is_null(texts))
    toks = pc.split_pattern_regex(pc.utf8_lower(pc.fill_null(texts, "")),
                                  r"\s+")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offs = np.asarray(toks.offsets).astype(np.int64)
    offs = offs - offs[0]
    flat = toks.flatten()
    n = len(texts)
    best = np.zeros(n, dtype=np.int64)
    lang_idx = np.zeros(n, dtype=np.int64)          # 0 = 'und'
    langs = list(_LANG_PROFILES)
    c = np.empty(len(flat) + 1, dtype=np.int64)
    c[0] = 0
    for i, lang in enumerate(langs):
        member = np.asarray(pc.is_in(
            flat, value_set=pa.array(sorted(_LANG_PROFILES[lang]))))
        np.cumsum(member, out=c[1:])
        score = c[offs[1:]] - c[offs[:-1]]
        win = score > best                           # strict: first lang wins ties
        best[win] = score[win]
        lang_idx[win] = i + 1
    table = np.array(["und"] + langs)
    out = table[lang_idx]
    return pa.array(np.where(nulls, None, out), type=pa.string())


def content_hash64(texts) -> np.ndarray:
    """Stable 64-bit content hash (first 8 bytes of sha1 over UTF-8) —
    the exact-dedup key. hashlib is C-speed per string; for long document
    text this beats a position-wise vectorized hash."""
    return content_hash128(texts)[0]


def content_hash128(texts) -> tuple[np.ndarray, np.ndarray]:
    """(lo, hi) 64-bit halves of the sha1 content hash — one digest pass,
    two independent 64-bit views. Dedup groups on the PAIR, so two
    distinct documents merge only if 128 hash bits collide (~2^-128 per
    pair), closing the single-hash birthday merge at 10^9+ docs."""
    lo = np.empty(len(texts), dtype=np.uint64)
    hi = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(_strings_to_list(texts)):
        b = b"\x00" if t is None else t.encode("utf-8", "surrogatepass")
        d = hashlib.sha1(b).digest()
        pair = np.frombuffer(d[:16], dtype=np.uint64)
        lo[i], hi[i] = pair[0], pair[1]
    return lo, hi


def split_tokens(texts) -> tuple[pa.Array, np.ndarray]:
    """THE batch tokenizer (single home for the tokenization contract:
    lowercase, ``\\s+`` split, empties dropped — SQL parity
    ``list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <>
    '')``). One Arrow lower+split pass for the whole batch.

    Returns ``(flat_tokens, offsets)``: ``flat_tokens`` is one string
    Array, ``flat_tokens[offsets[i]:offsets[i+1]]`` are doc *i*'s tokens
    (null text ⇒ zero tokens)."""
    texts = _as_string_array(texts)
    toks = pc.split_pattern_regex(pc.utf8_lower(pc.fill_null(texts, "")),
                                  r"\s+")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    doc_offs = np.asarray(toks.offsets).astype(np.int64)
    doc_offs = doc_offs - doc_offs[0]
    flat = toks.flatten()
    # regex split keeps empty pieces at the edges — drop them like
    # str.split() does, remapping the per-doc offsets
    keep = np.asarray(pc.binary_length(flat)) > 0
    kept_cum = np.concatenate([[0], np.cumsum(keep)])
    return flat.filter(pa.array(keep)), kept_cum[doc_offs]


def batch_token_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-tokenize a whole batch and hash every token — the
    ``split_tokens`` pass followed by the position-wise FNV-1a kernel
    over the flat token array (O(total bytes), no per-token Python),
    finished with splitmix64 for uniform bits.

    Returns ``(hashes, offsets)``: ``hashes[offsets[i]:offsets[i+1]]``
    are doc *i*'s token hashes.
    """
    flat, offs = split_tokens(texts)
    return splitmix64(fnv1a64_strings(flat)), offs


def simhash64_batch(hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """SimHash fingerprint of every doc in one vectorized pass: unpack
    the flat token-hash array to a (tokens, 64) bit matrix, per-doc
    segment-sum via ``np.add.reduceat``, then set bit *b* where
    ``votes_b = 2·count_b − n_tokens > 0``. No per-doc or per-bit
    Python-level passes. Empty docs fingerprint to 0."""
    ntok = np.diff(offsets)
    nd = len(ntok)
    if len(hashes) == 0 or nd == 0:
        return np.zeros(nd, dtype=np.uint64)
    bits = np.unpackbits(hashes[:, None].view(np.uint8), axis=1,
                         bitorder="little")          # (tokens, 64)
    starts = np.minimum(offsets[:-1], len(hashes) - 1).astype(np.int64)
    cnt = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)
    pos = 2 * cnt > ntok[:, None]
    powers = np.uint64(1) << np.arange(64, dtype=np.uint64)
    out = (pos.astype(np.uint64) * powers).sum(axis=1, dtype=np.uint64)
    out[ntok == 0] = 0  # reduceat yields a stray row for empty segments
    return out


_EMPTY_TOKEN_HASH = splitmix64(np.uint64(1469598103934665603))  # FNV basis


def _rolling_ngram_hashes(hs: np.ndarray, n: int) -> np.ndarray:
    """Rolling word-n-gram hashes of one doc's token-hash sequence,
    padded with the empty-token hash when shorter than ``n``."""
    if len(hs) < n:
        hs = np.concatenate([hs, np.full(n - len(hs), _EMPTY_TOKEN_HASH,
                                         dtype=np.uint64)])
    m = len(hs) - n + 1
    prime = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        acc = hs[:m].copy()
        for j in range(1, n):
            acc = acc * prime ^ hs[j : m + j]
    return acc


def fingerprint64(texts, window: int = 4) -> np.ndarray:
    """Order-sensitive document fingerprint: min-of-rolling-hash over word
    ``window``-grams (a winnowing-style signature). Equal fingerprints ⇒
    likely shared passages; used as a cheap near-dup pre-cluster key.

    Token hashing is the batch-vectorized FNV kernel (one pass over the
    whole batch's bytes); only the tiny per-doc rolling-min remains a
    Python-level loop."""
    th, offs = batch_token_hashes(texts)
    is_empty = np.asarray(pc.binary_length(
        pc.fill_null(texts if isinstance(texts, (pa.Array, pa.ChunkedArray))
                     else pa.array(_strings_to_list(texts), type=pa.string()),
                     ""))) == 0
    out = np.empty(len(offs) - 1, dtype=np.uint64)
    for i in range(len(out)):
        if is_empty[i]:
            out[i] = 0
            continue
        acc = _rolling_ngram_hashes(th[offs[i]:offs[i + 1]], window)
        out[i] = acc.min() if acc.size else 0
    return out


def word_ngram_hashes(text: str | None, n: int = 3, *,
                      pad: bool = True) -> np.ndarray:
    """Word n-gram hash set (uint64) of one document — the right shingle
    granularity for small-vocabulary corpora where every character
    k-shingle is document-frequency-pruned away. Token hashing uses the
    vectorized FNV kernel (no per-token Python hashing). Single-doc view
    of ``word_ngram_hashes_batch`` (identical hashes by construction).
    ``pad=False`` gives strict-window semantics: a doc with fewer than
    ``n`` tokens yields NO n-grams (the decontamination contract —
    SQL-replicable without a pad sentinel)."""
    if not text:
        return np.empty(0, dtype=np.uint64)
    hs, _ = batch_token_hashes(pa.array([text], type=pa.string()))
    if not pad and len(hs) < n:
        return np.empty(0, dtype=np.uint64)
    return np.unique(_rolling_ngram_hashes(hs, n))


def word_ngram_hashes_batch(texts, n: int = 3, *,
                            pad: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc sorted-unique word n-gram hash sets for a WHOLE batch,
    fully vectorized: one Arrow tokenize+FNV pass
    (``batch_token_hashes``), one scatter of every doc's token hashes
    into a pad-filled flat buffer (docs shorter than ``n`` tokens pad
    with the empty-token hash, exactly like ``_rolling_ngram_hashes``),
    n rolling-hash passes over that single buffer with per-doc window
    starts, then one lexsort for per-doc sorted-unique sets — no per-doc
    Python loop.

    Returns ``(hashes, offsets)``: ``hashes[offsets[i]:offsets[i+1]]``
    is doc *i*'s set; empty/null docs get zero n-grams (matching
    ``word_ngram_hashes``); whitespace-only non-empty docs get the one
    all-pad n-gram. ``pad=False`` gives strict-window semantics: docs
    with fewer than ``n`` tokens yield NO n-grams."""
    texts = _as_string_array(texts)
    nd = len(texts)
    if nd == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(1, dtype=np.int64)
    th, offs = batch_token_hashes(texts)
    ntok = np.diff(offs)
    if pad:
        empty_text = np.asarray(pc.binary_length(pc.fill_null(texts, ""))) == 0
        pl = np.where(empty_text, 0, np.maximum(ntok, n))  # padded len per doc
    else:
        pl = np.where(ntok >= n, ntok, 0)         # strict: short docs drop out
    p = np.concatenate([[0], np.cumsum(pl)])
    total = int(p[-1])
    if total == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(nd + 1, dtype=np.int64)
    padded = np.full(total, _EMPTY_TOKEN_HASH, dtype=np.uint64)
    scatter = ntok if pad else np.where(pl > 0, ntok, 0)
    nflat = int(scatter.sum())
    if nflat:
        src = th if pad else th[np.repeat(pl > 0, ntok)]
        local = np.arange(nflat) - np.repeat(np.concatenate(
            [[0], np.cumsum(scatter)])[:-1], scatter)
        padded[np.repeat(p[:-1], scatter) + local] = src
    m = np.where(pl > 0, pl - n + 1, 0)                  # windows per doc
    W = int(m.sum())
    if W == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(nd + 1, dtype=np.int64)
    L = total - n + 1
    prime = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        acc = padded[:L].copy()
        for j in range(1, n):
            acc = acc * prime ^ padded[j : j + L]
    # per-doc window starts (windows never cross docs: start ≤ p[i]+pl−n)
    wlocal = np.arange(W) - np.repeat(np.concatenate([[0], np.cumsum(m)])[:-1], m)
    starts = np.repeat(p[:-1], m) + wlocal
    hashes = acc[starts]
    wseg = np.repeat(np.arange(nd), m)
    order = np.lexsort((hashes, wseg))
    hs, ws = hashes[order], wseg[order]
    uniq = np.empty(W, dtype=bool)
    uniq[0] = True
    uniq[1:] = (ws[1:] != ws[:-1]) | (hs[1:] != hs[:-1])
    counts = np.bincount(ws[uniq], minlength=nd)
    return hs[uniq], np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)


def shingle_hashes(text: str | None, k: int = 5) -> np.ndarray:
    """Character k-shingle hash set (uint64) of one document — the input
    universe for MinHash / exact Jaccard. Single-doc view of
    ``shingle_hashes_batch`` (identical hashes by construction)."""
    if not text:
        return np.empty(0, dtype=np.uint64)
    flat, _ = shingle_hashes_batch(pa.array([text], type=pa.string()), k)
    return flat


def shingle_hashes_batch(texts, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc char-k-shingle hash sets for a WHOLE batch, fully
    vectorized: one Arrow lowercase pass, one scatter of every doc's
    bytes into a zero-padded flat buffer (k−1 pad bytes between docs so
    windows never cross documents and short docs match the per-doc
    zero-padding), k rolling-FNV passes over that single buffer, then
    one lexsort for per-doc sorted-unique sets — no per-doc Python.

    Returns ``(hashes, offsets)``: ``hashes[offsets[i]:offsets[i+1]]``
    is doc *i*'s sorted unique shingle set; empty/null docs get zero
    shingles; docs shorter than ``k`` get exactly one zero-padded
    shingle (matching ``shingle_hashes``).
    """
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(_strings_to_list(texts), type=pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(1, dtype=np.int64)
    nulls = np.asarray(pc.is_null(texts))
    low = pc.utf8_lower(pc.fill_null(texts, "")).cast(pa.large_binary())
    if isinstance(low, pa.ChunkedArray):
        low = low.combine_chunks()
    offs = np.frombuffer(low.buffers()[1], dtype=np.int64)[
        low.offset : low.offset + n + 1]
    data_buf = low.buffers()[2]
    flat = (np.frombuffer(data_buf, dtype=np.uint8)
            if data_buf is not None else np.zeros(0, dtype=np.uint8))
    lens = np.diff(offs)
    lens[nulls] = 0  # null ⇒ no shingles (fill_null made them "")
    pad = k - 1
    p = np.concatenate([[0], np.cumsum(lens + pad)])
    total = int(p[-1])
    padded = np.zeros(total, dtype=np.uint8)
    nbytes = int(lens.sum())
    if nbytes:
        local = np.arange(nbytes) - np.repeat(
            np.concatenate([[0], np.cumsum(lens)])[:-1], lens)
        padded[np.repeat(p[:-1], lens) + local] = \
            flat[np.repeat(offs[:-1], lens) + local]
    # one rolling-hash window count per doc: len−k+1, min 1 (padded), 0 if empty
    m = np.where(lens > 0, np.maximum(lens - k + 1, 1), 0)
    W = int(m.sum())
    if W == 0 or total < k:
        return np.empty(0, dtype=np.uint64), np.zeros(n + 1, dtype=np.int64)
    with np.errstate(over="ignore"):
        h = np.full(total - k + 1, np.uint64(1469598103934665603))
        prime = np.uint64(1099511628211)
        for j in range(k):
            h = (h ^ padded[j : j + total - k + 1].astype(np.uint64)) * prime
    wlocal = np.arange(W) - np.repeat(np.concatenate([[0], np.cumsum(m)])[:-1], m)
    starts = np.repeat(p[:-1], m) + wlocal
    hashes = h[starts]
    wseg = np.repeat(np.arange(n), m)
    order = np.lexsort((hashes, wseg))
    hs, ws = hashes[order], wseg[order]
    uniq = np.empty(W, dtype=bool)
    uniq[0] = True
    uniq[1:] = (ws[1:] != ws[:-1]) | (hs[1:] != hs[:-1])
    out = hs[uniq]
    counts = np.bincount(ws[uniq], minlength=n)
    return out, np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)


def _per_doc_group_stats(seg: np.ndarray, h: np.ndarray):
    """Group the flat (doc-segment, value-hash) pairs and return per-GROUP
    arrays ``(gseg, gcount, first_sorted_idx)`` — one entry per distinct
    value within a doc. One C-level lexsort; no per-doc Python. 64-bit
    value hashes stand in for the values themselves (within-doc collision
    odds ~count²/2⁶⁵ — negligible at any real per-document size)."""
    if len(seg) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    order = np.lexsort((h, seg))
    s, hh = seg[order], h[order]
    new = np.empty(len(s), dtype=bool)
    new[0] = True
    new[1:] = (s[1:] != s[:-1]) | (hh[1:] != hh[:-1])
    gidx = np.cumsum(new) - 1
    gcount = np.bincount(gidx)
    return s[new], gcount.astype(np.int64), order[new]


def repetition_metrics(texts, *, ngram_n: int = 2) -> dict[str, pa.Array]:
    """Gopher-style repetition/quality signals per document (Rae et al.
    2021 §A1.1), each a single float64 column — all fully vectorized
    (Arrow split + FNV hash + one lexsort per signal class):

    - ``dup_line_frac``      — fraction of ``\\n``-lines that are repeats
      of an earlier line: ``(n_lines − n_unique) / n_lines``.
    - ``dup_line_char_frac`` — fraction of line characters inside lines
      occurring ≥ 2×: ``Σ_{c≥2}(len·c) / Σ(len·c)`` (0 when no chars).
    - ``top_token_frac``     — share of tokens taken by the single most
      frequent token (0 when no tokens).
    - ``dup_ngram_frac``     — fraction of word ``ngram_n``-grams that
      are repeats (strict windows, duplicates retained; 0 when a doc has
      fewer than ``ngram_n`` tokens).

    Null text counts as "" (matching the SQL oracle's ``coalesce``).
    Exactly SQL-expressible: every metric is integer arithmetic followed
    by ONE float64 division, so DuckDB reproduces the values bit-for-bit.
    """
    texts = _as_string_array(texts)
    nd = len(texts)
    if nd == 0:
        empty = pa.array([], type=pa.float64())
        return {"dup_line_frac": empty, "dup_line_char_frac": empty,
                "top_token_frac": empty, "dup_ngram_frac": empty}
    t = pc.fill_null(texts, "")

    # ---- line metrics (literal '\n' split — matches SQL string_split) ----
    lines = pc.split_pattern(t, pattern="\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    loffs = np.asarray(lines.offsets, dtype=np.int64)
    loffs = loffs - loffs[0]
    flat = lines.flatten()
    n_lines = np.diff(loffs)                       # ≥ 1 per doc ("" → [""])
    lh = splitmix64(fnv1a64_strings(flat))
    lchars = np.asarray(pc.utf8_length(flat), dtype=np.int64)
    lseg = np.repeat(np.arange(nd), n_lines)
    gseg, gcount, gfirst = _per_doc_group_stats(lseg, lh)
    n_unique = np.bincount(gseg, minlength=nd)
    dup_line_frac = (n_lines - n_unique) / n_lines
    glen = lchars[gfirst]                          # all group members equal
    total_chars = np.bincount(gseg, weights=(glen * gcount).astype(np.float64),
                              minlength=nd)
    dmask = gcount > 1
    dup_chars = np.bincount(gseg[dmask],
                            weights=(glen[dmask] * gcount[dmask])
                            .astype(np.float64), minlength=nd)
    dup_line_char_frac = np.where(total_chars > 0,
                                  dup_chars / np.maximum(total_chars, 1.0),
                                  0.0)

    # ---- token metric ----------------------------------------------------
    th, toffs = batch_token_hashes(texts)
    ntok = np.diff(toffs)
    tseg = np.repeat(np.arange(nd), ntok)
    gseg, gcount, _ = _per_doc_group_stats(tseg, th)
    maxc = np.zeros(nd, dtype=np.int64)
    if len(gseg):
        np.maximum.at(maxc, gseg, gcount)
    top_token_frac = np.where(ntok > 0, maxc / np.maximum(ntok, 1), 0.0)

    # ---- word n-gram metric (strict windows, duplicates retained) -------
    m = np.maximum(ntok - ngram_n + 1, 0)
    W = int(m.sum())
    if W and len(th) >= ngram_n:
        L = len(th) - ngram_n + 1
        prime = np.uint64(1099511628211)
        with np.errstate(over="ignore"):
            acc = th[:L].copy()
            for j in range(1, ngram_n):
                acc = acc * prime ^ th[j : j + L]
        wlocal = np.arange(W) - np.repeat(
            np.concatenate([[0], np.cumsum(m)])[:-1], m)
        starts = np.repeat(toffs[:-1], m) + wlocal
        gh = acc[starts]
        ngseg = np.repeat(np.arange(nd), m)
        gseg, gcount, _ = _per_doc_group_stats(ngseg, gh)
        ng_unique = np.bincount(gseg, minlength=nd)
        dup_ngram_frac = np.where(m > 0, (m - ng_unique) / np.maximum(m, 1),
                                  0.0)
    else:
        dup_ngram_frac = np.zeros(nd, dtype=np.float64)

    return {"dup_line_frac": pa.array(dup_line_frac, type=pa.float64()),
            "dup_line_char_frac": pa.array(dup_line_char_frac,
                                           type=pa.float64()),
            "top_token_frac": pa.array(top_token_frac, type=pa.float64()),
            "dup_ngram_frac": pa.array(dup_ngram_frac, type=pa.float64())}


def word_ngram_hashes_positional(texts, n: int = 3
                                 ) -> tuple[np.ndarray, np.ndarray,
                                            np.ndarray]:
    """EVERY strict word n-gram window with its token position (the
    positional sibling of ``word_ngram_hashes_batch(pad=False)``, same
    rolling-hash formula — window hashes agree across the two): one
    tokenize+FNV pass, n-1 rolling passes over the flat token-hash
    buffer, in-doc window starts selected by offset arithmetic. No
    per-doc dedupe, no sort.

    Returns ``(hashes, positions, offsets)``: doc *i*'s windows are
    ``hashes[offsets[i]:offsets[i+1]]`` at 0-based token positions
    ``positions[...]`` (window w covers tokens [w, w+n)); docs with
    fewer than ``n`` tokens yield no windows."""
    texts = _as_string_array(texts)
    nd = len(texts)
    empty = (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64),
             np.zeros(nd + 1, dtype=np.int64))
    if nd == 0:
        return empty
    th, offs = batch_token_hashes(texts)
    ntok = np.diff(offs)
    m = np.maximum(ntok - n + 1, 0)
    W = int(m.sum())
    L = len(th) - n + 1
    if W == 0 or L <= 0:
        return empty
    prime = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        acc = th[:L].copy()
        for j in range(1, n):
            acc = acc * prime ^ th[j:j + L]
    wlocal = np.arange(W) - np.repeat(
        np.concatenate([[0], np.cumsum(m)])[:-1], m)
    starts = np.repeat(offs[:-1], m) + wlocal
    return (acc[starts], wlocal.astype(np.int64),
            np.concatenate([[0], np.cumsum(m)]).astype(np.int64))
