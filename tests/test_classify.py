"""Hashed-feature logistic quality classifier: separation on synthetic
corpora, determinism, score partition invariance, gate composition."""

import numpy as np
import pyarrow as pa
import pytest

from bloomjoin_ray.pipelines.classify import (score_text_classifier,
                                              train_text_classifier)

_GOOD = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
         "science", "history", "article", "reference", "chapter", "figure"]
_JUNK = ["zzz", "click", "buy", "now", "free", "winner", "xxx", "casino",
         "qqq", "lol", "spam", "deal", "offer", "cheap"]


def _docs(vocab, n, seed, id_base=0, mix=None, mix_frac=0.0):
    rng = np.random.default_rng(seed)
    texts = []
    for _ in range(n):
        toks = [vocab[int(i)] for i in rng.integers(0, len(vocab), 30)]
        if mix is not None:
            k = int(mix_frac * 30)
            for p in rng.integers(0, 30, k):
                toks[int(p)] = mix[int(rng.integers(0, len(mix)))]
        texts.append(" ".join(toks))
    return pa.table({
        "doc_id": pa.array(np.arange(id_base, id_base + n, dtype=np.int64)),
        "text": pa.array(texts)})


@pytest.fixture(scope="module")
def model(ray_session):
    import ray.data as rd

    pos = rd.from_arrow(_docs(_GOOD, 400, 1)).repartition(4)
    neg = rd.from_arrow(_docs(_JUNK, 400, 2, id_base=1000)).repartition(4)
    return train_text_classifier(pos, neg, dim=512, sample_rows=400,
                                 iters=200)


def test_separates_held_out_corpora(ray_session, model):
    import ray.data as rd

    pos_h = _docs(_GOOD, 200, 11, id_base=5000)
    neg_h = _docs(_JUNK, 200, 12, id_base=9000)
    sp = score_text_classifier(rd.from_arrow(pos_h), model).to_pandas()
    sn = score_text_classifier(rd.from_arrow(neg_h), model).to_pandas()
    acc = ((sp["quality_score"] > 0.5).mean()
           + (sn["quality_score"] < 0.5).mean()) / 2
    assert acc >= 0.98, acc
    assert sp["quality_score"].between(0, 1).all()
    # mixed docs land between the pure distributions
    mixed = _docs(_GOOD, 200, 13, id_base=7000, mix=_JUNK, mix_frac=0.5)
    sm = score_text_classifier(rd.from_arrow(mixed), model).to_pandas()
    assert sn["quality_score"].mean() < sm["quality_score"].mean() \
        < sp["quality_score"].mean()


def test_training_is_deterministic(ray_session):
    import ray.data as rd

    pos = rd.from_arrow(_docs(_GOOD, 300, 21)).repartition(3)
    neg = rd.from_arrow(_docs(_JUNK, 300, 22, id_base=800)).repartition(5)
    m1 = train_text_classifier(pos, neg, dim=256, sample_rows=300,
                               iters=50)
    m2 = train_text_classifier(pos.repartition(7), neg, dim=256,
                               sample_rows=300, iters=50)
    assert np.array_equal(m1["weights"], m2["weights"])
    assert m1["bias"] == m2["bias"]


def test_scores_partition_invariant(ray_session, model):
    import ray.data as rd

    t = _docs(_GOOD, 300, 31, mix=_JUNK, mix_frac=0.3)
    s2 = (score_text_classifier(rd.from_arrow(t).repartition(2), model)
          .to_pandas().sort_values("doc_id")["quality_score"].to_numpy())
    s9 = (score_text_classifier(rd.from_arrow(t).repartition(9), model)
          .to_pandas().sort_values("doc_id")["quality_score"].to_numpy())
    # BLAS picks shape-dependent blocking for X @ w, so a row's dot
    # product can differ by 1 ULP across batch heights — semantically
    # invariant, bit-identity not guaranteed
    assert np.allclose(s2, s9, rtol=0, atol=1e-12)


def test_gate_composition_with_quantile_filter(ray_session, model):
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import filter_by_quantile

    pos = _docs(_GOOD, 150, 41)
    neg = _docs(_JUNK, 150, 42, id_base=500)
    both = rd.from_arrow(pa.concat_tables([pos, neg])).repartition(4)
    scored = score_text_classifier(both, model)
    kept, thr = filter_by_quantile(scored, "quality_score", 0.5, keep="ge")
    ids = set(kept.to_pandas()["doc_id"])
    # the kept half is (almost entirely) the good half
    assert len(ids & set(range(150))) >= 145
    assert 0.0 < thr < 1.0


def test_empty_corpus_raises(ray_session):
    import ray.data as rd

    pos = rd.from_arrow(_docs(_GOOD, 50, 51))
    empty = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                    "text": pa.array([], pa.string())}))
    with pytest.raises(ValueError, match="non-empty"):
        train_text_classifier(pos, empty, sample_rows=50)
