"""Dedup pipelines on corpora with planted exact and near duplicates."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def corpus(ray_session):
    """120 base docs + planted exact dups + near dups."""
    import ray.data as rd

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(200)]
    texts, ids = [], []
    for i in range(120):
        words = [vocab[j] for j in rng.integers(0, 200, size=40)]
        texts.append(" ".join(words))
        ids.append(i)
    # exact duplicates of docs 0..9 (ids 200..209)
    for i in range(10):
        texts.append(texts[i])
        ids.append(200 + i)
    # near duplicates of docs 10..19: change last 2 words (ids 300..309)
    for i in range(10):
        words = texts[10 + i].split()
        words[-2:] = ["changed", "tail"]
        texts.append(" ".join(words))
        ids.append(300 + i)
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    t = pa.Table.from_pandas(df)
    return df, rd.from_arrow(t).repartition(4)


def test_exact_dedup_vs_oracle(corpus):
    from bloomjoin_ray.pipelines.dedup import exact_dedup

    df, ds = corpus
    out = exact_dedup(ds, "text", "doc_id").to_pandas()
    con = duckdb.connect()
    con.register("docs", df)
    want = con.sql(
        "SELECT * FROM docs WHERE doc_id IN "
        "(SELECT min(doc_id) FROM docs GROUP BY text)").df()
    assert sorted(out["doc_id"]) == sorted(want["doc_id"])
    assert len(out) == 130  # 140 - 10 exact dups


def test_minhash_finds_planted_near_dups(corpus):
    from bloomjoin_ray.pipelines.dedup import minhash_dedup, minhash_lsh_pairs

    df, ds = corpus
    pairs = minhash_lsh_pairs(ds, threshold=0.6).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    for i in range(10):  # exact dup pairs must surface (jaccard 1.0)
        assert (i, 200 + i) in found
    near_found = sum((10 + i, 300 + i) in found for i in range(10))
    assert near_found >= 8  # near dups (high but <1 jaccard)

    survivors = minhash_dedup(ds, threshold=0.6).to_pandas()
    assert not (survivors["doc_id"] >= 200).any()  # all planted dups removed
    assert (survivors["doc_id"] < 200).sum() >= 110


def test_simhash_finds_exact_and_near(corpus):
    from bloomjoin_ray.pipelines.dedup import simhash_pairs

    df, ds = corpus
    pairs = simhash_pairs(ds, max_hamming=3).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    hits = sum((i, 200 + i) in found for i in range(10))
    assert hits == 10  # identical docs → hamming 0
    assert (pairs["hamming"] <= 3).all()


def test_ngram_jaccard_exact_values(corpus):
    from bloomjoin_ray.functions.text import shingle_hashes
    from bloomjoin_ray.pipelines.dedup import ngram_jaccard_pairs

    df, ds = corpus
    pairs = ngram_jaccard_pairs(ds, threshold=0.5, max_df=64).to_pandas()
    found = {(a, b): j for a, b, j in
             zip(pairs["id_a"], pairs["id_b"], pairs["jaccard"])}
    assert all(found.get((i, 200 + i)) == pytest.approx(1.0) for i in range(10))
    # verify one near-dup jaccard against a direct computation
    a = set(shingle_hashes(df.loc[df.doc_id == 10, "text"].iloc[0]).tolist())
    b = set(shingle_hashes(df.loc[df.doc_id == 300, "text"].iloc[0]).tolist())
    true_j = len(a & b) / len(a | b)
    if true_j >= 0.5:
        assert found[(10, 300)] == pytest.approx(true_j)


def test_ngram_jaccard_word_kernel_routes_and_matches(corpus):
    """ngram='word' (batch kernel) == shingle_fn=word_ngram_hashes
    (detected and routed to the same batch kernel) == the old per-doc
    loop semantics; the driver config must not run per-doc Python
    (verdict r3 #5)."""
    from bloomjoin_ray.functions.text import word_ngram_hashes
    from bloomjoin_ray.pipelines.dedup import ngram_jaccard_pairs

    df, ds = corpus

    def norm(pairs):
        return (pairs.to_pandas()
                .sort_values(["id_a", "id_b"]).reset_index(drop=True))

    via_kind = norm(ngram_jaccard_pairs(ds, threshold=0.5, max_df=64,
                                        ngram="word", shingle_k=3))
    via_fn = norm(ngram_jaccard_pairs(ds, threshold=0.5, max_df=64,
                                      shingle_fn=word_ngram_hashes))
    assert len(via_kind) > 0
    assert via_kind["id_a"].tolist() == via_fn["id_a"].tolist()
    assert via_kind["id_b"].tolist() == via_fn["id_b"].tolist()
    assert np.allclose(via_kind["jaccard"], via_fn["jaccard"])
    # a genuinely custom fn still works through the per-doc fallback
    via_custom = norm(ngram_jaccard_pairs(
        ds, threshold=0.5, max_df=64,
        shingle_fn=lambda t: word_ngram_hashes(t, 3)))
    assert via_kind["id_a"].tolist() == via_custom["id_a"].tolist()
    assert np.allclose(via_kind["jaccard"], via_custom["jaccard"])


def test_embedding_dedup_pairs(ray_session):
    import ray.data as rd

    from bloomjoin_ray.pipelines.ann import embedding_dedup_pairs

    rng = np.random.default_rng(31)
    base = rng.standard_normal((60, 16)).astype(np.float32)
    # plant near-identical copies of vectors 0..4
    near = base[:5] + rng.standard_normal((5, 16)).astype(np.float32) * 0.01
    vecs = np.vstack([base, near])
    ids = list(range(60)) + list(range(100, 105))
    t = pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        type=pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(3)
    pairs = embedding_dedup_pairs(ds, threshold=0.99, n_bits=4).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    hits = sum((i, 100 + i) in found for i in range(5))
    assert hits >= 4  # LSH may miss rarely; near-identical should collide
    assert (pairs["cosine"] >= 0.99).all()


# ----------------------------------------- distributed connected components


def _cc_oracle(pairs):
    from bloomjoin_ray.pipelines.dedup import _union_find_clusters

    roots = _union_find_clusters(pairs)
    return {x for x, r in roots.items() if r != x}


def test_connected_components_matches_union_find(ray_session):
    """chains + cliques + bridges: labels == union-find component minima."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.dedup import connected_components

    rng = np.random.default_rng(7)
    pairs = []
    # a 100-node chain (diameter 99 — exercises pointer jumping)
    pairs += [(i, i + 1) for i in range(1000, 1099)]
    # a 40-clique
    pairs += [(2000 + i, 2000 + j) for i in range(40) for j in range(i + 1, 40)]
    # random small components
    for base in range(3000, 3300, 10):
        k = int(rng.integers(2, 6))
        pairs += [(base, base + m) for m in range(1, k)]
    t = pa.table({"id_a": pa.array([a for a, _ in pairs], type=pa.int64()),
                  "id_b": pa.array([b for _, b in pairs], type=pa.int64())})
    labels = (connected_components(rd.from_arrow(t).repartition(4))
              .to_pandas())
    got_drop = set(labels.loc[labels["node"] != labels["label"], "node"])
    assert got_drop == _cc_oracle(pairs)
    # fixpoint labels ARE component minima (the union-find dict omits
    # self-rooted minima; fill those in)
    from bloomjoin_ray.pipelines.dedup import _union_find_clusters

    roots = _union_find_clusters(pairs)
    nodes = {x for p in pairs for x in p}
    want = {x: roots.get(x, x) for x in nodes}
    got = dict(zip(labels["node"], labels["label"]))
    assert got == want


def test_dedup_by_pairs_distributed_matches_driver(ray_session):
    """Force the distributed path (limit=0) and compare with the
    driver union-find path on the same data."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.dedup import dedup_by_pairs

    rng = np.random.default_rng(11)
    n = 1200
    docs = pa.table({"doc_id": pa.array(np.arange(n), type=pa.int64()),
                     "val": pa.array(rng.integers(0, 100, n))})
    a = rng.integers(0, n, 350)
    b = rng.integers(0, n, 350)
    keep = a != b
    pairs = pa.table({"id_a": pa.array(a[keep], type=pa.int64()),
                      "id_b": pa.array(b[keep], type=pa.int64())})
    ds = rd.from_arrow(docs).repartition(4)
    pds = rd.from_arrow(pairs).repartition(4)
    drv = sorted(dedup_by_pairs(ds, pds, "doc_id").to_pandas()["doc_id"])
    dist = sorted(dedup_by_pairs(ds, pds, "doc_id",
                                 driver_pair_limit=0).to_pandas()["doc_id"])
    assert drv == dist


def test_dedup_by_pairs_planted_clique_over_threshold(ray_session):
    """A 700-member near-dup clique → ~245k pairs, over the default
    200k driver limit: the distributed path runs (verdict r2 #1) and
    keeps exactly the min id."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.dedup import DRIVER_PAIR_LIMIT, dedup_by_pairs

    m = 700
    iu, ju = np.triu_indices(m, 1)
    assert len(iu) > DRIVER_PAIR_LIMIT
    base = 10_000
    pairs = pa.table({"id_a": pa.array(base + iu, type=pa.int64()),
                      "id_b": pa.array(base + ju, type=pa.int64())})
    n = 12_000
    docs = pa.table({"doc_id": pa.array(np.arange(n), type=pa.int64())})
    out = dedup_by_pairs(rd.from_arrow(docs).repartition(8),
                         rd.from_arrow(pairs).repartition(8),
                         "doc_id").to_pandas()
    got = set(out["doc_id"])
    want = set(range(n)) - set(range(base + 1, base + m))
    assert got == want


def test_dedup_by_pairs_keep_best_score(ray_session):
    """score_col keeps the argmax-score member per cluster (min id on
    ties, null scores lose to any real score); unpaired rows survive.
    Driver and distributed paths agree with a brute-force expectation."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.dedup import (_union_find_clusters,
                                               dedup_by_pairs)

    rng = np.random.default_rng(7)
    n = 1500
    scores = rng.integers(0, 50, n).astype("float64")
    # null score: must lose to any real-scored member
    docs = pa.table({"doc_id": pa.array(np.arange(n), type=pa.int64()),
                     "quality": pa.array(scores,
                                         mask=(np.arange(n) == 3))})
    scores[3] = -np.inf
    a = rng.integers(0, n, 400)
    b = rng.integers(0, n, 400)
    keep = a != b
    pairs = pa.table({"id_a": pa.array(a[keep], type=pa.int64()),
                      "id_b": pa.array(b[keep], type=pa.int64())})

    edges = list(zip(a[keep].tolist(), b[keep].tolist()))
    cluster = _union_find_clusters(edges)
    members = {x for e in edges for x in e}
    by_root: dict = {}
    for i in members:
        root = cluster.get(i, i)
        s = scores[i]
        cur = by_root.get(root)
        if cur is None or s > cur[0] or (s == cur[0] and i < cur[1]):
            by_root[root] = (s, i)
    winners = {i for _, i in by_root.values()}
    want = sorted((set(range(n)) - members) | winners)

    ds = rd.from_arrow(docs).repartition(4)
    pds = rd.from_arrow(pairs).repartition(4)
    drv = sorted(dedup_by_pairs(ds, pds, "doc_id",
                                score_col="quality").to_pandas()["doc_id"])
    dist = sorted(dedup_by_pairs(
        ds, pds, "doc_id", score_col="quality",
        driver_pair_limit=0).to_pandas()["doc_id"])
    assert drv == want
    assert dist == want


def test_minhash_dedup_score_col_keeps_longest(corpus):
    """minhash_dedup(score_col=) keeps the LONGEST member of each planted
    near-dup cluster rather than the min id."""
    import pyarrow.compute as pc

    from bloomjoin_ray.pipelines.dedup import minhash_dedup, minhash_lsh_pairs

    df, ds = corpus
    ds = ds.map_batches(
        lambda t: t.append_column(
            "n_chars", pc.utf8_length(t.column("text"))),
        batch_format="pyarrow")
    kept = minhash_dedup(ds, score_col="n_chars").to_pandas()
    pairs = minhash_lsh_pairs(ds).to_pandas()
    assert len(pairs) > 0
    docs = df.assign(n_chars=df["text"].str.len()).set_index(
        "doc_id")["n_chars"]
    from bloomjoin_ray.pipelines.dedup import _union_find_clusters
    edges = list(zip(pairs["id_a"], pairs["id_b"]))
    cluster = _union_find_clusters(edges)
    roots: dict = {}
    for i in {x for e in edges for x in e}:
        roots.setdefault(cluster.get(i, i), []).append(i)
    kept_ids = set(kept["doc_id"])
    for members in roots.values():
        surv = [i for i in members if i in kept_ids]
        assert len(surv) == 1
        best = max(members, key=lambda i: (docs[i], -i))
        assert surv[0] == best


def test_dedup_by_pairs_distributed_string_ids(ray_session):
    """String doc ids flow through Min/Max label aggregation, pointer
    jumping, and the anti-join drop."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.dedup import dedup_by_pairs

    docs = pa.table({"doc_id": pa.array([f"d{i:03d}" for i in range(40)])})
    pairs = pa.table({
        "id_a": pa.array(["d005", "d006", "d010", "d030"]),
        "id_b": pa.array(["d006", "d007", "d011", "d005"]),
    })
    out = dedup_by_pairs(rd.from_arrow(docs).repartition(2),
                         rd.from_arrow(pairs).repartition(2),
                         "doc_id", driver_pair_limit=0).to_pandas()
    got = set(out["doc_id"])
    # component {d005,d006,d007,d030} keeps d005; {d010,d011} keeps d010
    dropped = {"d006", "d007", "d030", "d011"}
    assert got == {f"d{i:03d}" for i in range(40)} - dropped


def _dedup_lines_oracle(con, tbl_name: str, threshold: int):
    return con.sql(f"""
        WITH ex AS (
          SELECT doc_id,
                 unnest(str_split(text, chr(10))) AS line,
                 unnest(range(len(str_split(text, chr(10))))) AS idx
          FROM {tbl_name} WHERE text IS NOT NULL),
        freq AS (SELECT line, count(*) AS n FROM ex GROUP BY line),
        kept AS (SELECT e.doc_id, e.idx, e.line FROM ex e
                 JOIN freq f USING (line) WHERE f.n <= {threshold})
        SELECT d.doc_id,
               CASE WHEN d.text IS NULL THEN NULL
                    ELSE coalesce(string_agg(k.line, chr(10)
                                             ORDER BY k.idx), '')
               END AS text
        FROM {tbl_name} d LEFT JOIN kept k USING (doc_id)
        GROUP BY d.doc_id, d.text
        ORDER BY d.doc_id
    """).df()


def test_dedup_lines_matches_sql(ray_session):
    """Both rebuild paths (broadcast and partitioned) == the SQL line-
    frequency replica: cross-doc dups, within-doc dups, empty lines,
    empty/null text, threshold > 1."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from bloomjoin_ray.pipelines.dedup import dedup_lines

    texts = [
        "keep me\nboilerplate\nunique line one",
        "boilerplate\nunique line two",
        "repeated\nrepeated\nrare",          # within-doc duplicate
        "",                                   # empty text: one '' line
        "\n\n",                               # three '' lines
        None,                                 # null stays null
        "solo document with no newline",
        "boilerplate",                        # a doc that IS the dup line
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    con = duckdb.connect()
    con.register("docs", t)

    for threshold in (1, 2):
        want = _dedup_lines_oracle(con, "docs", threshold)
        for limit in (4_000_000, 0):   # broadcast path, partitioned path
            ds = rd.from_arrow(t).repartition(3)
            got = (dedup_lines(ds, threshold=threshold,
                               broadcast_limit_rows=limit)
                   .to_pandas().sort_values("doc_id")
                   .reset_index(drop=True))
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False), (threshold, limit)


def test_dedup_lines_no_duplicates_is_identity(ray_session):
    import ray.data as rd

    from bloomjoin_ray.pipelines.dedup import dedup_lines

    texts = ["alpha\nbeta", "gamma", "delta\nepsilon\nzeta"]
    t = pa.table({"doc_id": pa.array(range(3), type=pa.int64()),
                  "text": pa.array(texts)})
    got = (dedup_lines(rd.from_arrow(t)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["text"].tolist() == texts

    with pytest.raises(ValueError, match="threshold"):
        dedup_lines(rd.from_arrow(t), threshold=0)


def test_semdedup_drops_planted_semantic_dups(ray_session):
    """semdedup keeps all mutually-dissimilar rows and exactly one
    representative (min id, or best score_col) per planted near-dup
    group; result is partition-invariant."""
    import numpy as np
    import ray.data as rd

    from bloomjoin_ray.pipelines.dedup import semdedup

    rng = np.random.default_rng(23)
    dim = 32
    uniq = rng.standard_normal((120, dim)).astype(np.float32)
    # 3 planted groups of 5 near-identical vectors each
    groups = []
    for g in range(3):
        base = rng.standard_normal(dim).astype(np.float32)
        groups.append(np.tile(base, (5, 1)) +
                      1e-3 * rng.standard_normal((5, dim)).astype(np.float32))
    V = np.concatenate([uniq] + groups)
    n = len(V)
    ids = np.arange(n)
    quality = rng.random(n)
    t = pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array(list(V), type=pa.list_(pa.float32())),
        "quality": pa.array(quality),
    })

    kept = (semdedup(rd.from_arrow(t).repartition(6), threshold=0.95,
                     n_clusters=6, sample_rows=n)
            .to_pandas().sort_values("vec_id").reset_index(drop=True))
    # uniques survive (random 32-d gaussians are far below 0.95 cosine)
    assert set(range(120)) <= set(kept["vec_id"])
    # exactly one survivor per planted group — the min id
    for g in range(3):
        lo = 120 + 5 * g
        members = kept[(kept.vec_id >= lo) & (kept.vec_id < lo + 5)]
        assert members["vec_id"].tolist() == [lo]

    kept2 = (semdedup(rd.from_arrow(t).repartition(2), threshold=0.95,
                      n_clusters=6, sample_rows=n)
             .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert kept["vec_id"].tolist() == kept2["vec_id"].tolist()

    best = (semdedup(rd.from_arrow(t), threshold=0.95, n_clusters=6,
                     sample_rows=n, score_col="quality")
            .to_pandas().sort_values("vec_id").reset_index(drop=True))
    for g in range(3):
        lo = 120 + 5 * g
        members = best[(best.vec_id >= lo) & (best.vec_id < lo + 5)]
        assert members["vec_id"].tolist() == [lo + int(np.argmax(
            quality[lo:lo + 5]))]


def test_minhash_join_cross_corpus(ray_session):
    """Cross-corpus near-dup join: planted A↔B near-dups are found,
    same-side near-dups are NOT emitted, id_a always comes from A."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.dedup import minhash_join

    rng = np.random.default_rng(31)
    words = [f"w{i}" for i in range(400)]

    def doc(seed, mutate=0):
        r = np.random.default_rng(seed)
        toks = list(r.choice(words, 60))
        for j in range(mutate):
            toks[j] = f"mut{seed}_{j}"
        return " ".join(toks)

    # A: docs 0..19; B: near-dups of A's 0..4 (2 tokens changed),
    # plus 15 unrelated docs. A also contains an internal near-dup
    # pair (10, 11) that must NOT appear in the join output.
    a_rows = [{"doc_id": i, "text": doc(i)} for i in range(20)]
    a_rows[11]["text"] = doc(10, mutate=1)
    b_rows = [{"doc_id": 100 + i, "text": doc(i, mutate=2)}
              for i in range(5)]
    b_rows += [{"doc_id": 200 + i, "text": doc(1000 + i)}
               for i in range(15)]
    da = rd.from_items(a_rows).repartition(3)
    db = rd.from_items(b_rows).repartition(2)

    got = minhash_join(da, db, threshold=0.5).to_pandas()
    assert (got["id_a"] < 100).all() and (got["id_b"] >= 100).all()
    found = set(zip(got["id_a"], got["id_b"]))
    for i in range(5):
        assert (i, 100 + i) in found, f"planted pair {i} missed"
    # no unrelated B doc pairs with anything in A
    assert (got["id_b"] < 200).all()
    assert (got["est_jaccard"] >= 0.5).all()


def test_minhash_join_matches_pairs_on_split_corpus(ray_session):
    """Splitting one corpus in two and joining finds exactly the
    cross-split subset of minhash_lsh_pairs (same signatures, same
    bands — identical estimates)."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.dedup import minhash_join, minhash_lsh_pairs

    rng = np.random.default_rng(17)
    words = [f"t{i}" for i in range(300)]
    texts = []
    for i in range(30):
        r = np.random.default_rng(i % 12)  # groups of near-identical docs
        toks = list(r.choice(words, 50))
        toks[0] = f"v{i}"
        texts.append(" ".join(toks))
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ds = rd.from_items(rows)
    allp = minhash_lsh_pairs(ds, threshold=0.4).to_pandas()
    cross_exp = {(a, b) for a, b in zip(allp["id_a"], allp["id_b"])
                 if (a < 15) != (b < 15)}
    da = rd.from_items(rows[:15])
    db = rd.from_items(rows[15:])
    j = minhash_join(da, db, threshold=0.4).to_pandas()
    got = {(min(a, b), max(a, b)) for a, b in zip(j["id_a"], j["id_b"])}
    exp = {(min(a, b), max(a, b)) for a, b in cross_exp}
    assert got == exp
