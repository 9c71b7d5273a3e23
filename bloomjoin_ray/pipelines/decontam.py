"""Benchmark/test-set decontamination for training corpora.

The published recipe (GPT-3 appendix C, PaLM §7, Llama eval cards): a
training document is *contaminated* when it shares at least one word
n-gram with any held-out evaluation document; contaminated docs are
flagged or dropped before training. This is the canonical large-scale
use of the engine's own Bloom machinery — the evaluation side's n-gram
universe is tiny next to the corpus, so it broadcasts as a Bloom filter
and prunes the corpus-side n-gram stream IN the explode pass (one read
of the corpus, no shuffle of clean postings); only Bloom survivors pay
the exact semi-join that removes false positives.

Scale shape (100 TB corpus, GB-scale eval set):

* eval grams: one pass over the eval set → per-block-unique posting
  rows, materialized ONCE (bounded by the eval n-gram universe — the
  decontamination premise is that this side is small);
* corpus pass: ONE ``map_batches`` over (id, text) that tokenizes,
  forms strict word n-grams (``pad=False`` — sub-n docs yield nothing),
  and keeps only grams the broadcast Bloom may contain — emitted
  posting volume ≈ true contamination + fpr · corpus_grams;
* exact verify: engine ``hash_join`` semi of survivors × eval grams
  (broadcast when the eval side fits, partitioned otherwise);
* per-doc counts: packed grouped COUNT (order-independent, no
  sort-shuffle launch floor).

Gram keys travel as TWO int64 columns (low 53 / high 11 bits of the
64-bit gram hash): the canonical key hasher float64-canonicalizes int
columns and rejects full-range int64, so a single-column key would
crash the partitioned join path the moment the eval side outgrows the
broadcast limit — the split keeps every join path canonical-safe while
preserving all 64 bits of exactness.

Tokenization matches ``functions.text.batch_token_hashes`` (lowercase,
``\\s+`` split, empties dropped), so the oracle replicates it with
``regexp_split_to_array(lower(text), '\\s+')``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# single underscore: these survive the engine's hash_join (which rejects
# "__"-prefixed columns)
_NG_LO = "_ng_lo"
_NG_HI = "_ng_hi"
_GRAM_COLS = [_NG_LO, _NG_HI]
_LO_BITS = np.uint64(53)
_LO_MASK = np.uint64((1 << 53) - 1)


def _split64(flat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 gram hashes → (low-53-bit, high-11-bit) int64 halves, both
    inside the canonical hasher's ±2^53 float64-safe range."""
    return ((flat & _LO_MASK).astype(np.int64),
            (flat >> _LO_BITS).astype(np.int64))


def _gram_hash32(table: pa.Table, key_cols) -> np.ndarray:
    """int32 bloom keys: recombine the split halves to the original
    uniform 64-bit gram hash, then the same xor-fold ``hash_keys32``
    applies to its own 64-bit finalizer. Bypasses the canonical hasher
    (which would float64-canonicalize and reject full-range values)."""
    lo = np.asarray(table.column(key_cols[0])).view(np.uint64)
    hi = np.asarray(table.column(key_cols[1])).view(np.uint64)
    v = lo | (hi << _LO_BITS)
    return (v ^ (v >> np.uint64(32))).astype(np.uint32).view(np.int32)


def _posting_table(batch: pa.Table, id_col: str | None, text_col: str,
                   n: int) -> pa.Table:
    """THE posting builder (single home for the explode contract):
    strict-window per-doc-unique word n-gram hashes → split-key posting
    rows. ``id_col=None`` gives the eval-side shape — block-unique grams
    only, no id column."""
    from ..functions.text import word_ngram_hashes_batch

    flat, offs = word_ngram_hashes_batch(batch.column(text_col), n,
                                         pad=False)
    if id_col is None:
        lo, hi = _split64(np.unique(flat))
        return pa.table({_NG_LO: lo, _NG_HI: hi})
    counts = np.diff(offs)
    idx = np.repeat(np.arange(len(counts)), counts)
    ids = batch.column(id_col)
    ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    lo, hi = _split64(flat)
    return pa.table({id_col: ids.take(pa.array(idx)),
                     _NG_LO: lo, _NG_HI: hi})


def ngram_postings(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   n: int = 13) -> "ray.data.Dataset":  # noqa: F821
    """Explode documents into (id, gram-lo, gram-hi) posting rows —
    strict windows (a doc with < ``n`` tokens emits nothing), per-doc
    unique. The two gram columns are the split 64-bit hash (see module
    docstring); recombine as ``lo | hi << 53`` when a single value is
    needed."""
    return ds.select_columns([id_col, text_col]).map_batches(
        lambda b: _posting_table(b, id_col, text_col, n),
        batch_format="pyarrow")


def _eval_grams(ds_eval, *, text_col: str, n: int):
    """Per-block-unique eval-side gram postings, materialized (bounded
    by the eval n-gram universe)."""
    return ds_eval.select_columns([text_col]).map_batches(
        lambda b: _posting_table(b, None, text_col, n),
        batch_format="pyarrow").materialize()


def contaminated_counts(ds_train, ds_eval, *, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 13,
                        fpr: float = 1e-3,
                        max_filter_bits: int = 1 << 33,
                        broadcast_limit_rows: int | None = None):
    """Dataset[id_col, n_contaminated] — one row per contaminated train
    doc with its EXACT count of distinct n-grams shared with the eval
    set (Bloom prefilter inside the corpus explode pass; exact semi-join
    on the survivors removes Bloom false positives).

    ``max_filter_bits`` budgets the broadcast exactly like
    ``bloom_join``'s (default 2^33 bits = 1 GiB): an eval set whose
    filter would exceed it skips the Bloom pass and routes every posting
    to the exact semi-join — correct, just a heavier exchange.
    ``broadcast_limit_rows`` forwards to the semi-join (None = engine
    default); the partitioned path is split-key-safe by construction."""
    import ray

    from ..params import bloom_sizing
    from ..stages.bloom_stages import build_bloom_filter
    from .aggregate import grouped_assoc_agg
    from .asof import _schema_of
    from .join import hash_join

    if id_col in _GRAM_COLS:
        raise ValueError(f"id_col may not be named one of {_GRAM_COLS!r}")
    train_schema = _schema_of(ds_train)
    tg = _eval_grams(ds_eval, text_col=text_col, n=n)
    n_grams = tg.count()  # cheap: tg is materialized
    if n_grams == 0:      # eval side has no n-grams ⇒ nothing contaminated
        return _empty_counts(train_schema, id_col)
    m_bits, k = bloom_sizing(n_grams, fpr)
    if m_bits <= max_filter_bits:
        filt_ref = ray.put(build_bloom_filter(
            tg, _GRAM_COLS, n_grams, fpr, m_bits, k,
            key_hash_fn=_gram_hash32))
    else:  # over budget: no broadcast — every posting pays the exact join
        filt_ref = None

    def explode_and_probe(batch: pa.Table) -> pa.Table:
        """Fused corpus pass: tokenize → strict n-grams → Bloom prune.
        The filter ObjectRef resolves zero-copy per task (ray.put once,
        read everywhere — never re-shipped per batch)."""
        posts = _posting_table(batch, id_col, text_col, n)
        if filt_ref is None:
            return posts
        f = ray.get(filt_ref)
        keep = f.contains_batch(_gram_hash32(posts, _GRAM_COLS))
        return posts.filter(pa.array(keep))

    survivors = ds_train.select_columns([id_col, text_col]).map_batches(
        explode_and_probe, batch_format="pyarrow")
    # static schemas: don't pay a partial pipeline execution per join on
    # shapes that are already known
    gram_fields = [pa.field(_NG_LO, pa.int64()), pa.field(_NG_HI, pa.int64())]
    surv_schema = pa.schema(
        ([train_schema.field(id_col)] if id_col in train_schema.names else
         [pa.field(id_col, pa.int64())]) + gram_fields)
    join_kwargs = ({"broadcast_limit_rows": broadcast_limit_rows}
                   if broadcast_limit_rows is not None else {})
    confirmed = hash_join(survivors, tg,
                          dict(zip(_GRAM_COLS, _GRAM_COLS)), "semi",
                          x_schema=surv_schema,
                          y_schema=pa.schema(gram_fields), **join_kwargs)
    counts = grouped_assoc_agg(confirmed.select_columns([id_col]), [id_col],
                               count_col="n_contaminated")
    schema = counts.schema()  # packed reduce already executed; cheap
    if schema is None or not schema.names:
        # zero contaminated docs: Ray lost the fully-empty schema —
        # rebuild a TYPED empty result so downstream joins keep working
        return _empty_counts(train_schema, id_col)
    return counts


def _empty_counts(train_schema: pa.Schema, id_col: str):
    import ray.data as rd

    # an empty train side loses its own schema too — default the id type
    id_type = (train_schema.field(id_col).type
               if id_col in train_schema.names else pa.int64())
    return rd.from_arrow(pa.table({
        id_col: pa.array([], type=id_type),
        "n_contaminated": pa.array([], type=pa.int64())}))


def decontaminate(ds_train, ds_eval, *, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 13, fpr: float = 1e-3,
                  max_filter_bits: int = 1 << 33,
                  broadcast_limit_rows: int | None = None,
                  mode: str = "drop"):
    """Remove (``mode="drop"``) or annotate (``mode="flag"``) training
    documents sharing ≥ 1 word ``n``-gram with the eval set.

    ``drop`` returns the clean train subset (engine anti-join on
    ``id_col``); ``flag`` returns every train row plus ``n_contaminated``
    (int64, 0 for clean docs) and ``contaminated`` (bool).
    """
    from .asof import _schema_of
    from .join import hash_join

    if mode not in ("drop", "flag"):
        raise ValueError("mode must be 'drop' or 'flag'")
    counts = contaminated_counts(
        ds_train, ds_eval, text_col=text_col, id_col=id_col, n=n, fpr=fpr,
        max_filter_bits=max_filter_bits,
        broadcast_limit_rows=broadcast_limit_rows)
    train_schema = _schema_of(ds_train)
    x_schema = train_schema if train_schema.names else None
    counts_schema = _schema_of(counts)
    if mode == "drop":
        return hash_join(ds_train, counts.select_columns([id_col]),
                         {id_col: id_col}, "anti", x_schema=x_schema,
                         y_schema=pa.schema([counts_schema.field(id_col)]))

    flagged = hash_join(ds_train, counts, {id_col: id_col}, "left",
                        x_schema=x_schema, y_schema=counts_schema)

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cnt = pc.fill_null(batch.column("n_contaminated"), 0)
        idx = batch.schema.get_field_index("n_contaminated")
        batch = batch.set_column(idx, "n_contaminated", cnt)
        return batch.append_column("contaminated", pc.greater(cnt, 0))

    return flagged.map_batches(finish, batch_format="pyarrow")


def cross_doc_ngram_stats(ds, *, text_col: str = "text",
                          id_col: str = "doc_id", n: int = 5,
                          min_df: int = 2):
    """Per-document CROSS-document n-gram repetition score — the
    corpus-curation signal behind "boilerplate / templated page"
    filters (RefinedWeb/Gopher-style rules score how much of a doc is
    text that also appears elsewhere; unlike ``repetition_stats``,
    which is WITHIN-doc, the denominator here is the whole corpus).

    For each doc with ≥ ``n`` tokens: ``n_grams`` = distinct word
    n-grams in the doc, ``n_dup_grams`` = how many of those appear in
    ≥ ``min_df`` documents corpus-wide, ``dup_fraction`` = the ratio.
    Docs with < ``n`` tokens emit nothing (strict windows, matching
    ``ngram_postings``).

    Scale shape (ONE full exchange of posting rows + one small one):
    postings go through a packed exchange keyed on the gram hash; the
    per-gram reduce knows each gram's document frequency from its
    segment size (postings are per-doc unique) and collapses to ≤ one
    (doc, grams_seen, dup_grams) partial per doc PER TASK — the second
    exchange then sums ≤ docs × num_tasks small int rows per doc.
    Nothing joins the full df table back to the postings stream.
    """
    import pyarrow.compute as pc

    from .buckets import group_agg, packed_bucket_map_groups

    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    postings = ngram_postings(ds, text_col=text_col, id_col=id_col, n=n)

    def gram_reduce(group: pa.Table) -> pa.Table:
        id_type = group.schema.field(id_col).type

        def empty():
            return pa.table({id_col: pa.array([], type=id_type),
                             "n_grams": pa.array([], type=pa.int64()),
                             "n_dup_grams": pa.array([], type=pa.int64())})

        if group.num_rows == 0:
            return empty()
        # bucket-union-invariant: re-segment by the REAL 64-bit gram
        # (several buckets' rows may arrive concatenated)
        lo = np.asarray(group.column(_NG_LO)).view(np.uint64)
        hi = np.asarray(group.column(_NG_HI)).view(np.uint64)
        v = lo | (hi << _LO_BITS)
        order = np.argsort(v, kind="stable")
        vs = v[order]
        new = np.empty(len(vs), dtype=bool)
        new[0] = True
        new[1:] = vs[1:] != vs[:-1]
        seg = np.cumsum(new) - 1
        sizes = np.bincount(seg)
        dup = (sizes >= min_df)[seg]  # per sorted posting row
        ids = np.asarray(group.column(id_col))[order]
        uids, inv = np.unique(ids, return_inverse=True)
        tot = np.bincount(inv).astype(np.int64)
        dupc = np.bincount(inv, weights=dup).astype(np.int64)
        return pa.table({
            id_col: pa.array(uids).cast(id_type),
            "n_grams": pa.array(tot),
            "n_dup_grams": pa.array(dupc)})

    partials = packed_bucket_map_groups(postings, _GRAM_COLS, gram_reduce)

    def doc_reduce(group: pa.Table) -> pa.Table:
        sub = group.select([id_col, "n_grams", "n_dup_grams"])
        out = group_agg(sub, [id_col],
                        [("n_grams", "sum"), ("n_dup_grams", "sum")])
        return out.rename_columns([id_col, "n_grams", "n_dup_grams"])

    totals = packed_bucket_map_groups(partials, [id_col], doc_reduce)

    def frac(batch: pa.Table) -> pa.Table:
        nd = pc.cast(batch.column("n_dup_grams"), pa.float64())
        ng = pc.cast(batch.column("n_grams"), pa.float64())
        return batch.append_column("dup_fraction", pc.divide(nd, ng))

    return totals.map_batches(frac, batch_format="pyarrow")


def duplicate_spans(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    n: int = 13, min_count: int = 2):
    """Substring-level cross-document duplication (the span analogue of
    suffix-array corpus dedup, Lee et al. 2022 "Deduplicating Training
    Data Makes Language Models Better"): for every document, the merged
    token spans covered by word ``n``-grams occurring ≥ ``min_count``
    times in the WHOLE corpus (all occurrences count — within-doc
    repetition too, matching the substring-dedup definition). Returns
    one row per span: Dataset[id_col, span_start, span_end, n_windows]
    — tokens [span_start, span_end) (0-based, end-exclusive),
    ``n_windows`` = duplicated windows merged into the span. Feed the
    spans to a scrubber, or aggregate span lengths for a per-doc
    duplication budget.

    Scale shape: positional postings (one row per window) through ONE
    packed exchange keyed on the gram hash — the reduce KNOWS each
    gram's corpus count from its segment size and forwards only the
    duplicated (id, pos) rows; a second exchange on the doc id merges
    each doc's positions into spans with one lexsort + gap scan. No df
    table joins back; clean windows never leave their first exchange.
    """
    import pyarrow.compute as pc

    from ..functions.text import word_ngram_hashes_positional
    from .buckets import packed_bucket_map_groups

    if min_count < 2:
        raise ValueError("min_count must be >= 2")

    def postings(batch: pa.Table) -> pa.Table:
        h, pos, offs = word_ngram_hashes_positional(
            batch.column(text_col), n)
        counts = np.diff(offs)
        idx = np.repeat(np.arange(len(counts)), counts)
        ids = batch.column(id_col)
        ids = (ids.combine_chunks()
               if isinstance(ids, pa.ChunkedArray) else ids)
        lo, hi = _split64(h)
        return pa.table({id_col: ids.take(pa.array(idx)),
                         "_pos": pa.array(pos),
                         _NG_LO: lo, _NG_HI: hi})

    posts = ds.select_columns([id_col, text_col]).map_batches(
        postings, batch_format="pyarrow")

    def gram_reduce(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group.select([id_col, "_pos"])
        lo = np.asarray(group.column(_NG_LO)).view(np.uint64)
        hi = np.asarray(group.column(_NG_HI)).view(np.uint64)
        v = lo | (hi << _LO_BITS)
        order = np.argsort(v, kind="stable")
        vs = v[order]
        new = np.empty(len(vs), dtype=bool)
        new[0] = True
        new[1:] = vs[1:] != vs[:-1]
        seg = np.cumsum(new) - 1
        dup = (np.bincount(seg) >= min_count)[seg]
        keep = order[dup]
        keep.sort()  # original order back (cheap; not required)
        return group.select([id_col, "_pos"]).take(pa.array(keep))

    dups = packed_bucket_map_groups(posts, _GRAM_COLS, gram_reduce)

    def span_reduce(group: pa.Table) -> pa.Table:
        id_type = group.schema.field(id_col).type

        def empty():
            return pa.table({
                id_col: pa.array([], type=id_type),
                "span_start": pa.array([], type=pa.int64()),
                "span_end": pa.array([], type=pa.int64()),
                "n_windows": pa.array([], type=pa.int64())})

        r = group.num_rows
        if r == 0:
            return empty()
        order = np.asarray(pc.sort_indices(
            group, sort_keys=[(id_col, "ascending"),
                              ("_pos", "ascending")]))
        g = group.take(pa.array(order))
        ids = g.column(id_col).combine_chunks()
        pos = np.asarray(g.column("_pos"), dtype=np.int64)
        new_doc = np.empty(r, dtype=bool)
        new_doc[0] = True
        if r > 1:
            new_doc[1:] = ~np.asarray(
                pc.equal(ids.slice(1), ids.slice(0, r - 1)))
        # windows [p, p+n) merge while the next start is <= prev + n
        brk = new_doc.copy()
        if r > 1:
            brk[1:] |= (pos[1:] - pos[:-1]) > n
        starts = np.nonzero(brk)[0]
        ends = np.concatenate([starts[1:], [r]])
        return pa.table({
            id_col: ids.take(pa.array(starts)),
            "span_start": pa.array(pos[starts]),
            "span_end": pa.array(pos[ends - 1] + n),
            "n_windows": pa.array((ends - starts).astype(np.int64))})

    return packed_bucket_map_groups(dups, [id_col], span_reduce)


def scrub_duplicate_spans(ds, *, text_col: str = "text",
                          id_col: str = "doc_id", n: int = 13,
                          min_count: int = 2, out_col: str | None = None,
                          spans=None):
    """REMOVE the corpus-duplicated spans ``duplicate_spans`` finds —
    the scrubbing half of substring-level dedup (Lee et al. 2022 cut
    the duplicated bytes instead of dropping whole docs). Returns
    Dataset[id_col, out_col (default "text_scrubbed"), n_removed]:
    the document's tokens OUTSIDE every span, joined by single spaces
    (output is whitespace-normalized for all docs — spans are token
    intervals, so the rebuild is token-level; case is preserved), and
    the removed-token count. Null text scrubs to "". Pass ``spans`` to
    reuse an already-computed span table.

    Scale shape: span rows and doc rows union into ONE packed exchange
    keyed on the doc id (the cogroup wire, minus the per-key fn); each
    reduce task scrubs ALL its docs in one vectorized pass — one
    case-preserving split, spans aligned to docs via Arrow
    ``index_in``, one boolean coverage mask scattered from the span
    ranges, one Arrow ``binary_join``. No per-doc Python, and span
    tables never join against the corpus row-by-row."""
    import pyarrow.compute as pc

    from .asof import _schema_of
    from .buckets import packed_bucket_map_groups

    out_col = out_col or "text_scrubbed"
    if spans is None:
        spans = duplicate_spans(ds, text_col=text_col, id_col=id_col,
                                n=n, min_count=min_count)
    id_type = _schema_of(ds.select_columns([id_col])).field(id_col).type

    def doc_wire(batch: pa.Table) -> pa.Table:
        nr = batch.num_rows
        return pa.table({
            id_col: batch.column(id_col),
            text_col: batch.column(text_col),
            "_sp_s": pa.nulls(nr, pa.int64()),
            "_sp_e": pa.nulls(nr, pa.int64()),
            "_side": pa.array(np.zeros(nr, dtype=np.int8))})

    def span_wire(batch: pa.Table) -> pa.Table:
        nr = batch.num_rows
        return pa.table({
            id_col: batch.column(id_col),
            text_col: pa.nulls(nr, pa.string()),
            "_sp_s": batch.column("span_start"),
            "_sp_e": batch.column("span_end"),
            "_side": pa.array(np.ones(nr, dtype=np.int8))})

    wire = (ds.select_columns([id_col, text_col])
            .map_batches(doc_wire, batch_format="pyarrow")
            .union(spans.map_batches(span_wire, batch_format="pyarrow")))

    def scrub_reduce(group: pa.Table) -> pa.Table:
        def empty():
            return pa.table({id_col: pa.array([], type=id_type),
                             out_col: pa.array([], type=pa.string()),
                             "n_removed": pa.array([], type=pa.int64())})

        if group.num_rows == 0:
            return empty()
        side = np.asarray(group.column("_side"))
        docs = group.take(pa.array(np.nonzero(side == 0)[0]))
        if docs.num_rows == 0:
            return empty()
        sp = group.take(pa.array(np.nonzero(side == 1)[0]))
        texts = docs.column(text_col).combine_chunks()
        # case-PRESERVING split with the split_tokens empty-drop
        # contract (lowering never moves whitespace, so positions line
        # up with the gram pass)
        toks = pc.split_pattern_regex(pc.fill_null(texts, ""), r"\s+")
        toks = (toks.combine_chunks()
                if isinstance(toks, pa.ChunkedArray) else toks)
        doc_offs = np.asarray(toks.offsets).astype(np.int64)
        doc_offs = doc_offs - doc_offs[0]
        flat = toks.flatten()
        nonempty = np.asarray(pc.binary_length(flat)) > 0
        kept_cum = np.concatenate([[0], np.cumsum(nonempty)])
        offs = kept_cum[doc_offs]                  # per-doc token offsets
        flat = flat.filter(pa.array(nonempty))
        covered = np.zeros(len(flat), dtype=bool)
        if sp.num_rows:
            loc = pc.index_in(sp.column(id_col),
                              value_set=docs.column(id_col).combine_chunks())
            loc = np.asarray(loc.combine_chunks()
                             if isinstance(loc, pa.ChunkedArray) else loc)
            sf = np.asarray(sp.column("_sp_s"), dtype=np.int64)
            ef = np.asarray(sp.column("_sp_e"), dtype=np.int64)
            base = offs[loc] + sf
            lens = ef - sf
            idx = (np.repeat(base, lens)
                   + (np.arange(int(lens.sum()))
                      - np.repeat(np.concatenate(
                          [[0], np.cumsum(lens)])[:-1], lens)))
            covered[idx] = True
        keep = ~covered
        new_cum = np.concatenate([[0], np.cumsum(keep)])
        new_offs = new_cum[offs]
        kept_flat = flat.filter(pa.array(keep))
        rebuilt = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(new_offs, type=pa.int32()),
                                     kept_flat),
            pa.scalar(" "))
        removed = (np.diff(offs) - np.diff(new_offs)).astype(np.int64)
        return pa.table({id_col: docs.column(id_col),
                         out_col: rebuilt,
                         "n_removed": pa.array(removed)})

    return packed_bucket_map_groups(wire, [id_col], scrub_reduce)
