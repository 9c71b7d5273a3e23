"""Product quantization: codebook determinism, encode invariance, ADC
score fidelity, recall vs the exact brute-force path, error envelopes."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def emb(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.01/embeddings.parquet")
    t = pq.read_table("/root/testdata/sf0.01/embeddings.parquet")
    V = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    ids = np.asarray(t.column("vec_id"))
    return ds, V, ids


def _recall(got_df, want: dict, k: int) -> float:
    hits = tot = 0
    for qi, ids in want.items():
        g = set(got_df[got_df["query_id"] == qi]["vec_id"])
        hits += len(g & set(ids))
        tot += k
    return hits / tot


def _oracle_topk(V, ids, Q, k):
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sims = Vn @ Qn.T
    return {qi: list(ids[np.lexsort((ids, -sims[:, qi]))[:k]])
            for qi in range(Q.shape[0])}


def test_pq_fit_shape_and_determinism(emb):
    from bloomjoin_ray.pipelines.ann import pq_fit

    ds, V, _ = emb
    m1 = pq_fit(ds, m=8, sample_rows=500)
    m2 = pq_fit(ds, m=8, sample_rows=500)
    assert m1["codebook"].shape == (8, 256, V.shape[1] // 8)
    assert np.array_equal(m1["codebook"], m2["codebook"])


def test_pq_encode_partition_invariant(emb):
    from bloomjoin_ray.pipelines.ann import pq_encode, pq_fit
    import ray.data as rd

    ds, V, ids = emb
    model = pq_fit(ds, m=16, sample_rows=500)

    def codes_of(repart):
        df = (pq_encode(rd.read_parquet(
            "/root/testdata/sf0.01/embeddings.parquet").repartition(repart),
            model).to_pandas().sort_values("vec_id"))
        return {i: bytes(c) for i, c in zip(df["vec_id"], df["code"])}

    c2, c9 = codes_of(2), codes_of(9)
    assert c2 == c9
    assert all(len(c) == 16 for c in c2.values())


def test_pq_adc_scores_approximate_cosine(emb):
    """ADC score = query · (quantized vector); on the real embeddings at
    m=16 the error vs true cosine stays small for every candidate."""
    from bloomjoin_ray.pipelines.ann import pq_ann_topk, pq_encode, pq_fit

    ds, V, ids = emb
    model = pq_fit(ds, m=16, sample_rows=500)
    codes = pq_encode(ds, model).materialize()
    Q = V[:5]
    got = pq_ann_topk(codes, Q, model, k=10).to_pandas()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    true = Vn @ Qn.T
    pos = {int(i): p for p, i in enumerate(ids)}
    errs = [abs(r.score - true[pos[int(r.vec_id)], int(r.query_id)])
            for r in got.itertuples()]
    assert max(errs) < 0.15
    assert np.mean(errs) < 0.05


def test_pq_recall_vs_bruteforce(emb):
    """Recall@10 against the exact path: fine quantization (m=16,
    dsub=4) must recover most true neighbors; scalar-fine m=32 must
    dominate m=8 (more subspaces → less quantization error)."""
    from bloomjoin_ray.pipelines.ann import pq_ann_topk, pq_encode, pq_fit

    ds, V, ids = emb
    Q = V[:10]
    want = _oracle_topk(V, ids, Q, 10)
    recalls = {}
    for m in (8, 16, 32):
        model = pq_fit(ds, m=m, sample_rows=500)
        got = pq_ann_topk(pq_encode(ds, model), Q, model, k=10).to_pandas()
        recalls[m] = _recall(got, want, 10)
    assert recalls[16] >= 0.6, recalls
    assert recalls[32] >= recalls[8], recalls
    assert recalls[32] >= 0.8, recalls


def test_pq_error_envelopes(emb):
    from bloomjoin_ray.pipelines.ann import pq_ann_topk, pq_encode, pq_fit

    ds, V, _ = emb
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(ds, m=7, sample_rows=500)
    with pytest.raises(ValueError, match="nbits"):
        pq_fit(ds, m=8, nbits=4, sample_rows=500)
    with pytest.raises(ValueError, match="sample"):
        pq_fit(ds, m=8, sample_rows=100)  # < 256 centroids
    model = pq_fit(ds, m=8, sample_rows=500)
    codes = pq_encode(ds, model)
    with pytest.raises(ValueError, match="dim"):
        pq_ann_topk(codes, np.zeros((2, 32), dtype=np.float32), model)


def test_rerank_recovers_exact_head(emb):
    """Two-stage retrieval: PQ proposes top-50, exact re-rank of the
    candidate union recovers (at least) the PQ recall and, on this
    corpus, the full exact top-10."""
    from bloomjoin_ray.pipelines.ann import (pq_ann_topk, pq_encode,
                                             pq_fit, rerank_topk)

    ds, V, ids = emb
    Q = V[:10]
    want = _oracle_topk(V, ids, Q, 10)
    model = pq_fit(ds, m=8, sample_rows=500)
    codes = pq_encode(ds, model).materialize()

    pq10 = pq_ann_topk(codes, Q, model, k=10).to_pandas()
    cand = pq_ann_topk(codes, Q, model, k=50)
    rr = rerank_topk(ds, cand, Q, k=10).to_pandas()

    r_pq, r_rr = _recall(pq10, want, 10), _recall(rr, want, 10)
    assert r_rr >= r_pq
    assert r_rr >= 0.9, (r_pq, r_rr)
    # re-ranked scores are TRUE cosines (bit-exact vs numpy)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    true = Vn @ Qn.T
    pos = {int(i): p for p, i in enumerate(ids)}
    for r in rr.itertuples():
        assert abs(r.score - true[pos[int(r.vec_id)], int(r.query_id)]) < 1e-5


def test_ivfpq_full_probe_equals_pq(emb):
    """n_probe = n_centroids makes the cell routing a no-op: IVF-PQ
    must return exactly pq_ann_topk's answer (same codebook)."""
    from bloomjoin_ray.pipelines.ann import (ivfpq_ann_topk, ivfpq_encode,
                                             kmeans_fit, pq_ann_topk,
                                             pq_encode, pq_fit)

    ds, V, ids = emb
    Q = V[:8]
    model = pq_fit(ds, m=16, sample_rows=500)
    cents = kmeans_fit(ds, n_clusters=8, sample_rows=500)
    codes = ivfpq_encode(ds, model, cents).materialize()

    full = ivfpq_ann_topk(codes, Q, model, cents, k=10,
                          n_probe=8).to_pandas()
    plain = pq_ann_topk(pq_encode(ds, model), Q, model, k=10).to_pandas()
    key = ["query_id", "vec_id"]
    assert (full.sort_values(key).reset_index(drop=True)[key + ["score"]]
            .equals(plain.sort_values(key).reset_index(drop=True)
                    [key + ["score"]]))


def test_ivfpq_recall_monotone_in_n_probe(emb):
    from bloomjoin_ray.pipelines.ann import (ivfpq_ann_topk, ivfpq_encode,
                                             kmeans_fit, pq_fit)

    ds, V, ids = emb
    Q = V[:10]
    want = _oracle_topk(V, ids, Q, 10)
    model = pq_fit(ds, m=16, sample_rows=500)
    cents = kmeans_fit(ds, n_clusters=8, sample_rows=500)
    codes = ivfpq_encode(ds, model, cents).materialize()
    r = {p: _recall(ivfpq_ann_topk(codes, Q, model, cents, k=10,
                                   n_probe=p).to_pandas(), want, 10)
         for p in (1, 3, 8)}
    assert r[1] <= r[3] <= r[8], r
    assert r[3] >= 0.5, r     # embeddings are label-clustered: few cells
    assert r[8] >= 0.6, r     # == plain PQ at m=16


def test_ivfpq_single_probe_scores_only_probed_cells(emb):
    """Every returned (query, id) pair must lie in the query's probed
    cell set — the prune is real, not advisory."""
    import numpy as np

    from bloomjoin_ray.pipelines.ann import (ivfpq_ann_topk, ivfpq_encode,
                                             kmeans_fit, pq_fit)
    from bloomjoin_ray.stages.ann_stages import _normalize

    ds, V, ids = emb
    Q = V[:6]
    model = pq_fit(ds, m=8, sample_rows=500)
    cents = kmeans_fit(ds, n_clusters=8, sample_rows=500)
    codes = ivfpq_encode(ds, model, cents).materialize()
    cells_df = codes.select_columns(["vec_id", "cell"]).to_pandas()
    cell_of = dict(zip(cells_df["vec_id"], cells_df["cell"]))
    got = ivfpq_ann_topk(codes, Q, model, cents, k=10,
                         n_probe=2).to_pandas()
    Qn = _normalize(np.asarray(Q, dtype=np.float32))
    aff = Qn @ np.asarray(cents, dtype=np.float32).T
    probed = np.argsort(-aff, axis=1)[:, :2]
    for r in got.itertuples():
        assert cell_of[r.vec_id] in probed[int(r.query_id)], r


def test_ivfpq_persisted_cell_layout_pruned_scan(emb, tmp_path):
    """The documented serving layout end-to-end: IVF-PQ codes persisted
    hive-partitioned by cell, a query reads ONLY its probed cells'
    directories, and the ADC answer matches ivfpq_ann_topk over the
    full in-memory dataset at the same probes."""
    import os

    import ray.data as rd

    from bloomjoin_ray.pipelines.ann import (ivfpq_ann_topk, ivfpq_encode,
                                             kmeans_fit, pq_fit)
    from bloomjoin_ray.pipelines.materialize import write_partitioned_by
    from bloomjoin_ray.stages.ann_stages import _normalize

    ds, V, ids = emb
    Q = V[:4]
    model = pq_fit(ds, m=16, sample_rows=500)
    cents = kmeans_fit(ds, n_clusters=8, sample_rows=500)
    codes = ivfpq_encode(ds, model, cents).materialize()
    out = str(tmp_path / "ivfpq_idx")
    dirs = write_partitioned_by(codes, out, "cell")
    assert dirs and all(d.startswith("cell=") for d in dirs)

    want = ivfpq_ann_topk(codes, Q, model, cents, k=10,
                          n_probe=2).to_pandas()

    # probe-side: load ONLY the probed cells' directories
    Qn = _normalize(np.asarray(Q, dtype=np.float32))
    aff = Qn @ np.asarray(cents, dtype=np.float32).T
    probed_cells = sorted({int(c) for q in range(len(Q))
                           for c in np.argsort(-aff[q])[:2]})
    import pyarrow.compute as pc

    def add_cell(c):
        # the hive read restores `cell` (as the partition value's type);
        # normalize it to the int32 the scan stage expects
        return lambda t: (t.drop_columns(["cell"])
                          if "cell" in t.column_names else t).append_column(
            "cell", pa.array(np.full(t.num_rows, c, dtype=np.int32)))

    parts = None
    n_loaded = 0
    for c in probed_cells:
        d = os.path.join(out, f"cell={c}")
        if not os.path.isdir(d):
            continue
        p = rd.read_parquet(d).map_batches(add_cell(c),
                                           batch_format="pyarrow")
        n_loaded += 1
        parts = p if parts is None else parts.union(p)
    assert n_loaded < 8          # the prune is real
    got = ivfpq_ann_topk(parts, Q, model, cents, k=10,
                         n_probe=2).to_pandas()

    key = ["query_id", "vec_id"]
    assert (got.sort_values(key).reset_index(drop=True)[key + ["score"]]
            .equals(want.sort_values(key).reset_index(drop=True)
                    [key + ["score"]]))
