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

Tokenization matches ``functions.text.batch_token_hashes`` (lowercase,
``\\s+`` split, empties dropped), so the oracle replicates it with
``regexp_split_to_array(lower(text), '\\s+')``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_NGRAM_COL = "_ngram"  # single underscore: survives the engine's hash_join


def _gram_hash32(table: pa.Table, key_cols) -> np.ndarray:
    """int32 bloom keys from the already-uniform 64-bit gram hashes —
    the same xor-fold ``hash_keys32`` applies to its 64-bit finalizer.
    (The canonical hasher float64-canonicalizes int columns and rejects
    full-range int64, so gram hashes must bypass it.)"""
    v = np.asarray(table.column(key_cols[0])).view(np.uint64)
    return (v ^ (v >> np.uint64(32))).astype(np.uint32).view(np.int32)


def ngram_postings(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   n: int = 13) -> "ray.data.Dataset":  # noqa: F821
    """Explode documents into (id, n-gram hash) posting rows — strict
    windows (a doc with < ``n`` tokens emits nothing), per-doc unique."""
    from ..functions.text import word_ngram_hashes_batch

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        flat, offs = word_ngram_hashes_batch(batch.column(text_col), n,
                                             pad=False)
        counts = np.diff(offs)
        idx = np.repeat(np.arange(len(counts)), counts)
        return pa.table({id_col: ids.take(pa.array(idx)),
                         _NGRAM_COL: pa.array(flat.view(np.int64))})

    return ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow")


def _eval_grams(ds_eval, *, text_col: str, n: int):
    """Per-block-unique eval-side n-gram hashes, materialized (bounded by
    the eval n-gram universe)."""
    from ..functions.text import word_ngram_hashes_batch

    def explode(batch: pa.Table) -> pa.Table:
        flat, _ = word_ngram_hashes_batch(batch.column(text_col), n,
                                          pad=False)
        return pa.table({_NGRAM_COL: pa.array(np.unique(flat).view(np.int64))})

    return ds_eval.select_columns([text_col]).map_batches(
        explode, batch_format="pyarrow").materialize()


def contaminated_counts(ds_train, ds_eval, *, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 13,
                        fpr: float = 1e-3,
                        max_filter_bits: int = 1 << 33):
    """Dataset[id_col, n_contaminated] — one row per contaminated train
    doc with its EXACT count of distinct n-grams shared with the eval
    set (Bloom prefilter inside the corpus explode pass; exact semi-join
    on the survivors removes Bloom false positives).

    ``max_filter_bits`` budgets the broadcast exactly like
    ``bloom_join``'s (default 2^33 bits = 1 GiB): an eval set whose
    filter would exceed it skips the Bloom pass and routes every posting
    to the exact semi-join — correct, just a heavier exchange."""
    import ray

    from ..params import bloom_sizing
    from ..stages.bloom_stages import build_bloom_filter
    from .aggregate import grouped_assoc_agg
    from .join import hash_join

    if id_col == _NGRAM_COL:
        raise ValueError(f"id_col may not be named {_NGRAM_COL!r}")
    tg = _eval_grams(ds_eval, text_col=text_col, n=n)
    n_grams = tg.count()  # cheap: tg is materialized
    if n_grams == 0:      # eval side has no n-grams ⇒ nothing contaminated
        return _empty_counts(ds_train, id_col)
    m_bits, k = bloom_sizing(max(n_grams, 1), fpr)
    if m_bits <= max_filter_bits:
        filt_ref = ray.put(build_bloom_filter(
            tg, [_NGRAM_COL], max(n_grams, 1), fpr, m_bits, k,
            key_hash_fn=_gram_hash32))
    else:  # over budget: no broadcast — every posting pays the exact join
        filt_ref = None

    from ..functions.text import word_ngram_hashes_batch

    def explode_and_probe(batch: pa.Table) -> pa.Table:
        """Fused corpus pass: tokenize → strict n-grams → Bloom prune.
        The filter ObjectRef resolves zero-copy per task (ray.put once,
        read everywhere — never re-shipped per batch)."""
        ids = batch.column(id_col)
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        flat, offs = word_ngram_hashes_batch(batch.column(text_col), n,
                                             pad=False)
        counts = np.diff(offs)
        idx = np.repeat(np.arange(len(counts)), counts)
        posts = pa.table({id_col: ids.take(pa.array(idx)),
                          _NGRAM_COL: pa.array(flat.view(np.int64))})
        if filt_ref is None:
            return posts
        f = ray.get(filt_ref)
        keep = f.contains_batch(_gram_hash32(posts, [_NGRAM_COL]))
        return posts.filter(pa.array(keep))

    survivors = ds_train.select_columns([id_col, text_col]).map_batches(
        explode_and_probe, batch_format="pyarrow")
    confirmed = hash_join(survivors, tg, {_NGRAM_COL: _NGRAM_COL}, "semi")
    counts = grouped_assoc_agg(confirmed.select_columns([id_col]), [id_col],
                               count_col="n_contaminated")
    schema = counts.schema()  # packed reduce already executed; cheap
    if schema is None or not schema.names:
        # zero contaminated docs: Ray lost the fully-empty schema —
        # rebuild a TYPED empty result so downstream joins keep working
        return _empty_counts(ds_train, id_col)
    return counts


def _empty_counts(ds_train, id_col: str):
    import ray.data as rd

    from .asof import _schema_of

    id_type = _schema_of(ds_train).field(id_col).type
    return rd.from_arrow(pa.table({
        id_col: pa.array([], type=id_type),
        "n_contaminated": pa.array([], type=pa.int64())}))


def decontaminate(ds_train, ds_eval, *, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 13, fpr: float = 1e-3,
                  mode: str = "drop"):
    """Remove (``mode="drop"``) or annotate (``mode="flag"``) training
    documents sharing ≥ 1 word ``n``-gram with the eval set.

    ``drop`` returns the clean train subset (engine anti-join on
    ``id_col``); ``flag`` returns every train row plus ``n_contaminated``
    (int64, 0 for clean docs) and ``contaminated`` (bool).
    """
    from .join import hash_join

    if mode not in ("drop", "flag"):
        raise ValueError("mode must be 'drop' or 'flag'")
    counts = contaminated_counts(ds_train, ds_eval, text_col=text_col,
                                 id_col=id_col, n=n, fpr=fpr)
    if mode == "drop":
        return hash_join(ds_train, counts.select_columns([id_col]),
                         {id_col: id_col}, "anti")

    flagged = hash_join(ds_train, counts, {id_col: id_col}, "left")

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cnt = pc.fill_null(batch.column("n_contaminated"), 0)
        idx = batch.schema.get_field_index("n_contaminated")
        batch = batch.set_column(idx, "n_contaminated", cnt)
        return batch.append_column("contaminated", pc.greater(cnt, 0))

    return flagged.map_batches(finish, batch_format="pyarrow")
