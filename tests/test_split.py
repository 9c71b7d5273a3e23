"""Deterministic hash splits: disjoint + exhaustive, partition-invariant,
stable under corpus growth, salt-independent assignments."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from bloomjoin_ray.pipelines.split import split_by_hash


def _docs(n, start=0):
    return pa.table({"doc_id": pa.array(range(start, start + n),
                                        type=pa.int64()),
                     "v": pa.array(np.arange(start, start + n) * 0.5)})


def test_split_disjoint_exhaustive_and_sized(ray_session):
    import ray.data as rd

    n = 20_000
    ds = rd.from_arrow(_docs(n)).repartition(8)
    splits = split_by_hash(ds, "doc_id",
                           {"train": 0.8, "val": 0.1, "test": 0.1})
    frames = {k: v.to_pandas() for k, v in splits.items()}
    ids = [set(f["doc_id"]) for f in frames.values()]
    assert sum(len(s) for s in ids) == n          # disjoint + exhaustive
    assert set().union(*ids) == set(range(n))
    assert abs(len(frames["train"]) / n - 0.8) < 0.02
    assert abs(len(frames["val"]) / n - 0.1) < 0.01


def test_split_partition_invariant_and_growth_stable(ray_session):
    import ray.data as rd

    fr = {"train": 0.9, "test": 0.1}
    a = split_by_hash(rd.from_arrow(_docs(5000)).repartition(2),
                      "doc_id", fr)["test"].to_pandas()
    b = split_by_hash(rd.from_arrow(_docs(5000)).repartition(11),
                      "doc_id", fr)["test"].to_pandas()
    assert set(a["doc_id"]) == set(b["doc_id"])   # partition invariance
    # growing the corpus never moves an existing row between splits
    big = split_by_hash(rd.from_arrow(_docs(8000)), "doc_id",
                        fr)["test"].to_pandas()
    assert set(a["doc_id"]) == {i for i in big["doc_id"] if i < 5000}


def test_split_salt_and_subsample(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs(5000))
    t1 = split_by_hash(ds, "doc_id", {"h": 0.2})["h"].to_pandas()
    t2 = split_by_hash(ds, "doc_id", {"h": 0.2},
                       seed_salt="epoch2")["h"].to_pandas()
    s1, s2 = set(t1["doc_id"]), set(t2["doc_id"])
    # independent assignments: overlap ≈ 20% of 20%, far from identical
    assert len(s1 & s2) < 0.5 * len(s1)
    # fractions summing under 1 subsample (remainder dropped)
    sub = split_by_hash(ds, "doc_id", {"keep": 0.3})
    assert abs(sub["keep"].count() / 5000 - 0.3) < 0.03

    with pytest.raises(ValueError, match="sum"):
        split_by_hash(ds, "doc_id", {"a": 0.8, "b": 0.4})


def _strat_docs(n):
    src = np.array(["web", "wiki", "code", "books"])[
        np.arange(n) % 4]
    return pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                     "source": pa.array(src)})


def test_stratified_sample_fractions_and_invariance(ray_session):
    import ray.data as rd

    from bloomjoin_ray.pipelines.split import stratified_sample

    n = 20_000
    fr = {"web": 0.1, "wiki": 1.0, "code": 0.0}
    a = stratified_sample(rd.from_arrow(_strat_docs(n)).repartition(3),
                          "source", fr, "doc_id").to_pandas()
    b = stratified_sample(rd.from_arrow(_strat_docs(n)).repartition(13),
                          "source", fr, "doc_id").to_pandas()
    assert set(a["doc_id"]) == set(b["doc_id"])   # partition invariance

    per = a.groupby("source").size()
    assert per.get("wiki", 0) == n // 4           # fraction 1.0 exact
    assert "code" not in per.index                # fraction 0.0 exact
    assert abs(per["web"] / (n // 4) - 0.1) < 0.03
    assert per.get("books", 0) == n // 4          # default keeps unlisted

    # default=0.0 drops unlisted strata
    d0 = stratified_sample(rd.from_arrow(_strat_docs(n)), "source", fr,
                           "doc_id", default=0.0).to_pandas()
    assert set(d0["source"]) == {"web", "wiki"}

    # the kept web rows are the SAME rows split_by_hash keeps at the
    # same fraction (shared Bernoulli contract)
    from bloomjoin_ray.pipelines.split import split_by_hash

    web = rd.from_arrow(_strat_docs(n)).filter(
        lambda r: r["source"] == "web")
    want = set(split_by_hash(web, "doc_id", {"keep": 0.1})["keep"]
               .to_pandas()["doc_id"])
    assert set(a[a["source"] == "web"]["doc_id"]) == want

    # salt derives an independent resample
    s2 = stratified_sample(rd.from_arrow(_strat_docs(n)), "source", fr,
                           "doc_id", seed_salt="epoch2").to_pandas()
    w1 = set(a[a["source"] == "web"]["doc_id"])
    w2 = set(s2[s2["source"] == "web"]["doc_id"])
    assert len(w1 & w2) < 0.5 * len(w1)

    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(rd.from_arrow(_strat_docs(8)), "source",
                          {"web": 1.5}, "doc_id")


def test_mix_corpora(ray_session):
    """Weighted mixture: per-corpus kept fraction ~ requested,
    partition-invariant, independent draws across corpora over shared
    keys, source tagging, and validation."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.split import mix_corpora

    n = 4000
    a, b = _docs(n), _docs(n)  # same keys in both corpora
    parts = [("web", rd.from_arrow(a).repartition(4), 0.3),
             ("wiki", rd.from_arrow(b).repartition(4), 1.0)]
    out = mix_corpora(parts, "doc_id", source_col="src").to_pandas()
    web = out[out["src"] == "web"]
    wiki = out[out["src"] == "wiki"]
    assert len(wiki) == n  # fraction 1.0 keeps everything
    assert abs(len(web) / n - 0.3) < 0.03
    # independent draws: web's kept set is NOT the hash-prefix subset
    # wiki would give at 0.3 (same keys, different corpus salt)
    out2 = mix_corpora([("wiki", rd.from_arrow(b), 0.3)],
                       "doc_id").to_pandas()
    ov = len(set(web["doc_id"]) & set(out2["doc_id"]))
    assert ov < 0.5 * len(web)
    # partition invariance
    out3 = mix_corpora(
        [("web", rd.from_arrow(a).repartition(13), 0.3)],
        "doc_id").to_pandas()
    assert set(out3["doc_id"]) == set(web["doc_id"])

    with pytest.raises(ValueError, match="fraction"):
        mix_corpora([("x", rd.from_arrow(a), 1.2)], "doc_id")
    with pytest.raises(ValueError, match="duplicate"):
        mix_corpora([("x", rd.from_arrow(a), 0.5),
                     ("x", rd.from_arrow(b), 0.5)], "doc_id")
    with pytest.raises(ValueError, match="non-empty"):
        mix_corpora([], "doc_id")
