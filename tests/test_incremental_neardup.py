"""Incremental NEAR-DUP dedup against a persisted MinHash index:
parity with the in-memory minhash pipelines, documented survivor
policy, idempotent re-ingest, generation gating, bloom growth,
compaction."""

import os

import numpy as np
import pyarrow as pa
import pytest

from bloomjoin_ray.pipelines.incremental import (
    compact_neardup_index, incremental_dedup, incremental_neardup_dedup,
    init_corpus_index, init_neardup_index, read_index_spec,
    rebuild_neardup_bloom)

PARAMS = dict(num_perm=64, bands=16, shingle_k=5)
THRESH = 0.7

_WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
          "hotel", "india", "juliet", "kilo", "lima", "mike", "november"]


def _doc(rng, n_words=60):
    return " ".join(_WORDS[int(i)] for i in rng.integers(0, len(_WORDS),
                                                         n_words))


def _perturb(rng, text):
    """Light edit: swap one word — near-dup at shingle_k=5."""
    toks = text.split()
    toks[int(rng.integers(0, len(toks)))] = _WORDS[int(rng.integers(
        0, len(_WORDS)))]
    return " ".join(toks)


def _corpus(seed, n, id_base=0, near_of=None, rng=None):
    """n docs; if near_of given (list of texts), half are perturbed
    copies of those, half novel."""
    rng = rng or np.random.default_rng(seed)
    texts, kinds = [], []
    for i in range(n):
        if near_of is not None and i % 2 == 0 and i // 2 < len(near_of):
            texts.append(_perturb(rng, near_of[i // 2]))
            kinds.append("near")
        else:
            texts.append(_doc(rng))
            kinds.append("novel")
    return pa.table({
        "doc_id": pa.array(np.arange(id_base, id_base + n, dtype=np.int64)),
        "text": pa.array(texts), "kind": pa.array(kinds)})


def _ingest(tbl, d, **kw):
    import ray.data as rd
    return incremental_neardup_dedup(
        rd.from_arrow(tbl).repartition(4), d, threshold=THRESH, **kw)


def _expected_survivors(indexed_tbl, new_tbl):
    """The documented policy, computed from the ENGINE'S in-memory
    pipelines (a different code path: no index files, no bloom):
    cross pairs via minhash_join, within pairs via minhash_lsh_pairs,
    then drop corpus-dups, discard pairs touching them, keep min id
    per remaining cluster."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.dedup import (_union_find_clusters,
                                               minhash_join,
                                               minhash_lsh_pairs)

    cross = (minhash_join(rd.from_arrow(indexed_tbl), rd.from_arrow(new_tbl),
                          threshold=THRESH, **PARAMS).to_pandas()
             if indexed_tbl.num_rows else None)
    corpus_dup = (set(cross["id_b"])
                  if cross is not None and len(cross) else set())
    within = minhash_lsh_pairs(rd.from_arrow(new_tbl), threshold=THRESH,
                               **PARAMS).to_pandas()
    edges = ([(a, b) for a, b in zip(within["id_a"], within["id_b"])
              if a not in corpus_dup and b not in corpus_dup]
             if len(within) else [])
    cluster = _union_find_clusters(edges)
    losers = {x for x, root in cluster.items() if root != x}
    ids = set(new_tbl.column("doc_id").to_pylist())
    return ids - corpus_dup - losers


@pytest.fixture()
def nd_dir(ray_session, tmp_path):
    d = str(tmp_path / "nd_idx")
    init_neardup_index(d, num_buckets=16, bloom_capacity=65536, **PARAMS)
    return d


def test_matches_in_memory_pipelines(nd_dir):
    rng = np.random.default_rng(101)
    b0 = _corpus(0, 80, rng=rng)
    s0 = _ingest(b0, nd_dir).to_pandas()
    # batch 0: no index yet — must equal plain within-batch policy
    assert set(s0["doc_id"]) == _expected_survivors(
        b0.slice(0, 0), b0)

    indexed = b0.filter(pa.array(
        np.isin(np.asarray(b0.column("doc_id")), np.array(sorted(
            set(s0["doc_id"]))))))
    b1 = _corpus(1, 60, id_base=1000,
                 near_of=indexed.column("text").to_pylist(), rng=rng)
    s1 = _ingest(b1, nd_dir).to_pandas()
    want = _expected_survivors(indexed, b1)
    assert set(s1["doc_id"]) == want
    # the perturbed copies were detected as corpus near-dups
    kinds = dict(zip(b1.column("doc_id").to_pylist(),
                     b1.column("kind").to_pylist()))
    dropped = set(b1.column("doc_id").to_pylist()) - set(s1["doc_id"])
    assert any(kinds[i] == "near" for i in dropped)
    spec = read_index_spec(nd_dir)
    assert spec["generation"] == 2
    assert spec["rows"] == len(s0) + len(s1)


def test_reingest_drops_everything(nd_dir):
    b0 = _corpus(7, 50)
    s0 = _ingest(b0, nd_dir)
    n0 = s0.count()
    assert n0 > 0
    # identical content → signature est 1.0 ≥ threshold on every doc
    again = _ingest(b0, nd_dir, update_index=False)
    assert again.count() == 0
    # query mode never bumped the generation
    assert read_index_spec(nd_dir)["generation"] == 1


def test_chain_policy_survivor(nd_dir):
    """a~corpus, b~a but b!~corpus → b SURVIVES (the documented
    policy: corpus-dup endpoints never cluster). Unique-word sliding
    windows give controlled shingle Jaccards (minhash estimates at
    these params, deterministic: a–base 0.73, b–a 0.80, b–base
    0.58 — threshold 0.7 splits exactly the chain shape)."""
    words = [f"w{i:03d}" for i in range(100)]
    base = " ".join(words[0:80])
    a = " ".join(words[6:86])
    b = " ".join(words[16:96])
    b0 = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                   "text": pa.array([base])})
    _ingest(b0, nd_dir).materialize()

    b1 = pa.table({"doc_id": pa.array([10, 11], type=pa.int64()),
                   "text": pa.array([a, b])})
    got_ds = _ingest(b1, nd_dir).to_pandas()
    got = set(got_ds["doc_id"]) if len(got_ds) else set()
    want = _expected_survivors(b0, b1)
    assert got == want
    assert 10 not in got                   # the direct near-dup dropped
    assert 11 in got                       # chained-but-not-corpus kept


def test_novel_content_skips_index_io(nd_dir, monkeypatch):
    """Bloom sidecar: an increment sharing no shingles with the corpus
    never reads a bucket file."""
    b0 = pa.table({"doc_id": pa.array(np.arange(30, dtype=np.int64)),
                   "text": pa.array([f"shared prefix words {i} " + "x y z w v " * 6
                                     for i in range(30)])})
    _ingest(b0, nd_dir).materialize()

    import bloomjoin_ray.pipelines.incremental as inc
    calls = []
    orig = inc._read_bucket_band_rows
    monkeypatch.setattr(inc, "_read_bucket_band_rows",
                        lambda *a, **k: calls.append(a) or orig(*a, **k))
    rng = np.random.default_rng(9)
    b1 = _corpus(9, 20, id_base=500, rng=rng)
    got = _ingest(b1, nd_dir, update_index=False)
    assert got.count() == len(_expected_survivors(b0, b1))
    # monkeypatch only affects driver-side code; the probe runs in Ray
    # workers — so instead assert via the bloom itself: no band hash of
    # b1 may hit the sidecar (all content disjoint from b0's shingles)
    from bloomjoin_ray.pipelines.dedup import _MinHashStage
    from bloomjoin_ray.state.base import sketch_from_bytes
    spec = read_index_spec(nd_dir)
    stage = _MinHashStage("text", "doc_id", spec["num_perm"],
                          spec["bands"], spec["shingle_k"])
    rows = stage(b1)
    blob = open(os.path.join(
        nd_dir, f"_bloom_gen{spec['generation']:08d}.bin"), "rb").read()
    filt = sketch_from_bytes(blob)
    hits = filt.contains_batch(inc._fold32(
        np.asarray(rows.column("bhash")).view(np.uint64)))
    assert hits.mean() <= 0.05             # FPR-level only


def test_compact_and_rebuild_preserve_answers(nd_dir):
    rng = np.random.default_rng(55)
    b0, b1 = _corpus(50, 40, rng=rng), _corpus(51, 40, id_base=200, rng=rng)
    _ingest(b0, nd_dir).materialize()
    _ingest(b1, nd_dir).materialize()
    spec0 = read_index_spec(nd_dir)

    compact_neardup_index(nd_dir)
    for b in range(spec0["num_buckets"]):
        d = os.path.join(nd_dir, f"__kbucket={b}")
        assert len([f for f in os.listdir(d) if f.endswith(".parquet")]) <= 1
    rebuild_neardup_bloom(nd_dir, capacity=200_000)
    assert read_index_spec(nd_dir)["bloom_capacity"] == 200_000

    # both batches still fully recognized as corpus content
    assert _ingest(b0, nd_dir, update_index=False).count() == 0
    assert _ingest(b1, nd_dir, update_index=False).count() == 0


def test_bloom_saturation_rebuild(ray_session, tmp_path):
    d = str(tmp_path / "tiny_nd")
    init_neardup_index(d, num_buckets=4, bloom_capacity=64, **PARAMS)
    m0 = read_index_spec(d)["bloom_m"]
    rng = np.random.default_rng(77)
    _ingest(_corpus(77, 120, rng=rng), d).materialize()
    spec = read_index_spec(d)
    assert spec["bloom_m"] > m0


def test_kind_guards(ray_session, tmp_path):
    nd = str(tmp_path / "a"); ex = str(tmp_path / "b")
    init_neardup_index(nd, num_buckets=2, **PARAMS)
    init_corpus_index(ex, num_buckets=2)
    import ray.data as rd
    t = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                  "text": pa.array(["hello world " * 10])})
    with pytest.raises(ValueError, match="not a near-dup index"):
        incremental_neardup_dedup(rd.from_arrow(t), ex)
    with pytest.raises(ValueError, match="not an exact index"):
        incremental_dedup(rd.from_arrow(t), nd)
