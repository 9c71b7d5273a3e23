"""Text-analysis pipelines over a documents Dataset (training-data
curation: quality scoring, language ID, token counting, fingerprints)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.text import (
    detect_language,
    fingerprint64,
    quality_metrics,
    token_count,
)


def text_stats(ds, text_col: str = "text", *, concurrency=None):
    """Append n_chars / n_tokens / n_punct / avg_token_len / punct_ratio.
    Vectorized Arrow kernels; SQL-expressible for the oracle."""

    def fn(batch: pa.Table) -> pa.Table:
        for name, arr in quality_metrics(batch.column(text_col)).items():
            idx = batch.schema.get_field_index(name)
            if idx >= 0:  # overwrite an existing column of the same name
                batch = batch.set_column(idx, name, arr)
            else:
                batch = batch.append_column(name, arr)
        return batch

    kwargs = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(fn, batch_format="pyarrow", **kwargs)


class LangIdStage:
    """Actor-pool stage: language-ID heuristic (profiles bound once per
    actor in __init__, per the stateful-stage idiom)."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        from ..functions.text import _LANG_PROFILES  # compiled once per actor

        self.profiles = _LANG_PROFILES
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column(self.out_col,
                                   detect_language(batch.column(self.text_col)))


def language_id(ds, text_col: str = "text", *, out_col: str = "lang_pred",
                concurrency: int | tuple = 2):
    return ds.map_batches(LangIdStage(text_col, out_col),
                          batch_format="pyarrow", concurrency=concurrency)


def fingerprints(ds, text_col: str = "text", *, window: int = 4,
                 out_col: str = "fingerprint"):
    """Winnowing-style min-rolling-hash fingerprint per document."""

    def fn(batch: pa.Table) -> pa.Table:
        fp = fingerprint64(batch.column(text_col), window)
        return batch.append_column(out_col, pa.array(fp.view(np.int64)))

    return ds.map_batches(fn, batch_format="pyarrow")


def filter_by_quality(ds, text_col: str = "text", *, min_tokens: int = 5,
                      max_punct_ratio: float = 0.3):
    """Drop low-quality documents (too short / punctuation-heavy)."""

    def fn(batch: pa.Table) -> pa.Table:
        m = quality_metrics(batch.column(text_col))
        import pyarrow.compute as pc

        keep = pc.and_(
            pc.greater_equal(m["n_tokens"], min_tokens),
            pc.less_equal(m["punct_ratio"], max_punct_ratio),
        )
        return batch.filter(keep)

    return ds.map_batches(fn, batch_format="pyarrow")


def scrub_text(ds, patterns, text_col: str = "text",
               out_col: str | None = None):
    """Regex scrubbing/redaction over a text column — the PII-removal /
    normalization staple of a curation pipeline. ``patterns`` is an
    ordered list of ``(regex, replacement)`` pairs applied in sequence;
    each pass is ONE vectorized Arrow kernel over the whole batch
    (``pc.replace_substring_regex`` — RE2, all occurrences), so no
    per-document Python. RE2 is also DuckDB's regex engine, making the
    operator exactly SQL-expressible for the oracle
    (``regexp_replace(text, pat, repl, 'g')``). ``out_col`` defaults to
    overwriting ``text_col``."""
    import pyarrow.compute as pc

    patterns = list(patterns)
    target = out_col or text_col

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        for pat, repl in patterns:
            col = pc.replace_substring_regex(col, pattern=pat,
                                             replacement=repl)
        idx = batch.schema.get_field_index(target)
        if idx >= 0:
            return batch.set_column(idx, target, col)
        return batch.append_column(target, col)

    return ds.map_batches(fn, batch_format="pyarrow")
