"""Linear text-quality classifier over hashed bag-of-words features —
the GPT-3 / CCNet-style "looks like reference text" curation gate: a
logistic model trained on a positive corpus (curated/reference docs) vs
a negative one (raw crawl), then streamed over the full corpus to score
every document; the gate composes with ``filter_by_quantile`` (keep the
top fraction) or a fixed threshold.

Scale shape (matches this engine's k-means convention): TRAINING runs
on a bounded, deterministic content-hash sample of each side gathered
to the driver — a linear model saturates at ~10⁴–10⁵ docs, so the 100
TB corpus never trains distributed — while SCORING is one streamed
``map_batches`` pass with the (dim+1)-float model shipped once via
``ray.put``. Features are the same signed hashing-trick vectors
``hashed_doc_vectors`` builds (Weinberger et al. 2009): one
``np.bincount`` per batch, L2-normalized, zero per-token Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hashed_matrix(texts, dim: int) -> np.ndarray:
    """Signed, L2-normalized hashed-BoW feature matrix (n, dim) — the
    exact math of ``pipelines.text.hashed_doc_vectors`` (shared kernel
    so train- and score-time features can never drift)."""
    from ..functions.text import batch_token_hashes

    n = len(texts)
    h, offs = batch_token_hashes(texts)
    doc = np.repeat(np.arange(n, dtype=np.int64),
                    np.diff(offs).astype(np.int64))
    bucket = (h % np.uint64(dim)).astype(np.int64)
    sign = 1.0 - 2.0 * ((h >> np.uint64(32)) & np.uint64(1)
                        ).astype(np.float64)
    M = np.bincount(doc * dim + bucket, weights=sign,
                    minlength=n * dim).reshape(n, dim)
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return M / norms


def _sample_texts(ds, text_col: str, rows: int) -> list[str]:
    """Bounded deterministic corpus-wide text sample: every doc enters
    with equal probability via a content-hash Bernoulli draw (same
    scheme as ``ann._even_sample_matrix`` — a ``limit()`` head sample
    would see only the first blocks of a sorted corpus). Overshoots the
    rate slightly and caps at exactly ``rows`` bottom-k by hash."""
    from ..functions.text import content_hash128

    n = ds.count()
    frac = min(1.0, (rows * 1.15 + 64) / max(n, 1))
    cut = np.uint64(int(frac * float(1 << 32)))

    def take_some(b: pa.Table) -> pa.Table:
        col = b.column(text_col)
        if b.num_rows == 0:
            return pa.table({text_col: col, "__h": pa.array(
                [], type=pa.int64())})
        lo, _hi = content_hash128(col)
        if frac < 1.0:
            m = (lo >> np.uint64(32)) < cut
            col = col.filter(pa.array(m))
            lo = lo[m]
        return pa.table({text_col: col,
                         "__h": pa.array(lo.view(np.int64))})

    got = (ds.select_columns([text_col])
             .map_batches(take_some, batch_format="pyarrow").take_all())
    got.sort(key=lambda r: np.uint64(np.int64(r["__h"])))
    return [r[text_col] for r in got[:rows]]


def train_text_classifier(ds_pos, ds_neg, *, text_col: str = "text",
                          dim: int = 4096, sample_rows: int = 8192,
                          iters: int = 300, lr: float = 2.0,
                          l2: float = 1e-4) -> dict:
    """Fit the logistic quality model: positives = docs that look like
    the target distribution (reference text), negatives = raw/junk.
    Full-batch gradient descent on the driver sample — deterministic
    (no SGD shuffling), a few seconds at the default 2×8k × 4096.
    Returns ``{"weights": (dim,) float64, "bias": float, "dim": dim}``.
    """
    pos = _sample_texts(ds_pos, text_col, sample_rows)
    neg = _sample_texts(ds_neg, text_col, sample_rows)
    if not pos or not neg:
        raise ValueError("train_text_classifier: both corpora must be "
                         "non-empty")
    X = np.vstack([_hashed_matrix(pa.array(pos), dim),
                   _hashed_matrix(pa.array(neg), dim)])
    y = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
    n = len(y)
    w = np.zeros(dim)
    b = 0.0
    for _ in range(int(iters)):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g / n + l2 * w)
        b -= lr * float(g.mean())
    return {"weights": w, "bias": float(b), "dim": int(dim)}


class _ScoreStage:
    """map_batches actor: hashed features → sigmoid(w·x + b); the model
    ships once per actor via ray.put."""

    def __init__(self, model_ref, text_col: str, out_col: str):
        import ray

        model = ray.get(model_ref)
        self.w = np.asarray(model["weights"], dtype=np.float64)
        self.b = float(model["bias"])
        self.dim = int(model["dim"])
        self.text_col, self.out_col = text_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(self.out_col,
                                       pa.array([], type=pa.float64()))
        X = _hashed_matrix(batch.column(self.text_col), self.dim)
        z = X @ self.w + self.b
        return batch.append_column(
            self.out_col, pa.array(1.0 / (1.0 + np.exp(-z))))


def score_text_classifier(ds, model: dict, *, text_col: str = "text",
                          out_col: str = "quality_score"):
    """Append the model's quality probability per doc — one streamed
    vectorized pass, no shuffle. Compose downstream with
    ``filter_by_quantile(scored, out_col, q, keep="ge")`` (keep the
    best fraction) or a fixed-threshold filter."""
    import ray

    ref = ray.put({"weights": np.asarray(model["weights"],
                                         dtype=np.float64),
                   "bias": float(model["bias"]), "dim": int(model["dim"])})
    return ds.map_batches(_ScoreStage(ref, text_col, out_col),
                          batch_format="pyarrow")
