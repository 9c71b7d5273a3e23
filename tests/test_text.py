"""Text-analysis kernels and pipelines, with duckdb oracle for the
SQL-expressible metrics."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from bloomjoin_ray.functions.text import (
    content_hash64,
    detect_language,
    fingerprint64,
    quality_metrics,
    shingle_hashes,
    token_count,
)


def test_token_count_matches_sql():
    texts = ["hello world", "  padded   spaces  ", "", "one", "a b c d e"]
    arr = pa.array(texts)
    got = token_count(arr).to_pylist()
    con = duckdb.connect()
    con.register("t", pa.table({"text": arr}))
    want = [r[0] for r in con.sql(
        "SELECT len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))"
        " FROM t").fetchall()]
    assert got == want == [2, 2, 0, 1, 5]


def test_quality_metrics_vs_sql():
    texts = ["Hello, world! How are you?", "no punct here", "!!!", ""]
    arr = pa.array(texts)
    m = quality_metrics(arr)
    con = duckdb.connect()
    con.register("t", pa.table({"text": arr}))
    want_chars = [r[0] for r in con.sql("SELECT length(text) FROM t").fetchall()]
    want_punct = [r[0] for r in con.sql(
        "SELECT length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) FROM t").fetchall()]
    assert m["n_chars"].to_pylist() == want_chars
    assert m["n_punct"].to_pylist() == want_punct
    assert m["punct_ratio"].to_pylist()[2] == 1.0
    assert m["avg_token_len"].to_pylist()[3] == 0.0


def test_language_id_heuristic():
    samples = {
        "en": "the cat sat on the mat and it was happy with the sun",
        "de": "der hund ist nicht in dem haus und die katze ist auf dem dach",
        "fr": "le chat est dans la maison et il ne veut pas sortir pour le moment",
        "es": "el perro está en la casa y no quiere salir porque es muy tarde",
    }
    preds = detect_language(pa.array(list(samples.values()))).to_pylist()
    assert preds == list(samples.keys())
    assert detect_language(pa.array(["zzz qqq xxx"])).to_pylist() == ["und"]
    assert detect_language(pa.array([None], type=pa.string())).to_pylist() == [None]


def test_content_hash_and_fingerprint():
    texts = ["alpha beta gamma delta", "alpha beta gamma delta",
             "totally different words here", None]
    h = content_hash64(pa.array(texts, type=pa.string()))
    assert h[0] == h[1] and h[0] != h[2]
    fp = fingerprint64(pa.array([t or "" for t in texts]))
    assert fp[0] == fp[1]

    # shared long passage → shared min rolling hash (likely equal fingerprint)
    a = "one two three four five six seven eight nine ten eleven twelve"
    b = "zzz " + a
    fpa = fingerprint64(pa.array([a, b]))
    assert fpa[0] == fpa[1]


def test_word_ngrams():
    from bloomjoin_ray.functions.text import word_ngram_hashes

    a = word_ngram_hashes("one two three four five", 3)
    b = word_ngram_hashes("one two three four five", 3)
    np.testing.assert_array_equal(a, b)
    assert len(a) == 3  # 5 words → 3 trigrams
    c = word_ngram_hashes("zero one two three four five", 3)
    # shifted text shares 3 of its 4 trigrams with `a`
    assert len(np.intersect1d(a, c)) == 3
    assert word_ngram_hashes(None).size == 0
    assert word_ngram_hashes("one", 3).size == 1  # padded


def test_word_ngram_batch_matches_per_doc():
    """Batch word-n-gram kernel == per-doc word_ngram_hashes on every
    edge case (verdict r3 #5): null, empty, whitespace-only, shorter
    than n, exactly n, long."""
    from bloomjoin_ray.functions.text import (word_ngram_hashes,
                                              word_ngram_hashes_batch)

    texts = [None, "", "   ", "one", "one two", "one two three",
             "one two three four five six seven", "one one one one",
             "a b c d e f g h i j k l m n o p q r s t u v w x y z"]
    for n in (2, 3, 4):
        flat, offs = word_ngram_hashes_batch(
            pa.array(texts, type=pa.string()), n)
        assert len(offs) == len(texts) + 1
        for i, t in enumerate(texts):
            got = flat[offs[i]:offs[i + 1]]
            want = word_ngram_hashes(t, n)
            np.testing.assert_array_equal(np.sort(got), np.sort(want)), (i, n)
            # per-doc sets arrive sorted unique
            assert (np.diff(got.astype(np.uint64)) > 0).all() if len(got) > 1 else True
    # empty batch
    flat, offs = word_ngram_hashes_batch(pa.array([], type=pa.string()), 3)
    assert len(flat) == 0 and list(offs) == [0]


def test_shingles():
    s1 = shingle_hashes("abcdefgh", 5)
    s2 = shingle_hashes("abcdefgh", 5)
    np.testing.assert_array_equal(s1, s2)
    assert len(s1) == 4
    assert shingle_hashes(None).size == 0
    assert shingle_hashes("ab", 5).size == 1  # padded


def test_text_stats_pipeline(ray_session):
    import ray.data as rd

    from bloomjoin_ray.pipelines.text import filter_by_quality, language_id, text_stats

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    out = text_stats(docs).to_pandas()
    con = duckdb.connect()
    want = con.sql(
        "SELECT doc_id, length(text) AS n_chars FROM "
        "'/root/testdata/sf0.001/documents.parquet'").df()
    m = out.merge(want, left_on="doc_id", right_on="doc_id", suffixes=("", "_sql"))
    assert (m["n_chars"] == m["n_chars_sql"]).all()
    assert (out["n_tokens"] > 0).all()

    lid = language_id(docs, concurrency=2).to_pandas()
    assert set(lid["lang_pred"]) <= {"en", "de", "fr", "es", "it", "und"}

    filtered = filter_by_quality(docs, min_tokens=5)
    assert filtered.count() <= docs.count()


def test_scrub_text_matches_python_re(ray_session):
    """scrub_text (vectorized RE2 passes) == per-doc Python re.sub, and
    overwrites vs appends correctly."""
    import re

    import pandas as pd
    import ray.data as rd

    from bloomjoin_ray.pipelines.text import scrub_text

    texts = ["call me at 555-0199 or e-mail bob@example.com now",
             "spark table spark", "  lots   of   space  ", "", None]
    pats = [(r"[\w.]+@[\w.]+", "<EMAIL>"), (r"\d[\d-]+\d", "<PHONE>"),
            (r"\s+", " ")]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string())}))
    got = (scrub_text(ds, pats).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    for i, t in enumerate(texts):
        if t is None:
            assert got.loc[i, "text"] is None or pd.isna(got.loc[i, "text"])
            continue
        want = t
        for p, r in pats:
            want = re.sub(p, r, want)
        assert got.loc[i, "text"] == want, (i, got.loc[i, "text"], want)
    # out_col appends instead of overwriting
    out = scrub_text(ds, pats, out_col="clean").to_pandas()
    assert {"doc_id", "text", "clean"} <= set(out.columns)
    assert (out.sort_values("doc_id")["text"].fillna("x").tolist()
            == pd.Series(texts).fillna("x").tolist())


def test_pack_documents_invariants(ray_session):
    """Sequence packing: every doc exactly once, per-pack token sums ≤
    max_tokens except single overlong docs, sequential pack_seq, unique
    pack ids, and the token-budget waste stays sane."""
    import pandas as pd
    import ray.data as rd

    from bloomjoin_ray.pipelines.text import pack_documents

    rng = np.random.default_rng(4)
    n = 3000
    texts = [" ".join(["tok"] * k) for k in rng.integers(1, 300, n)]
    texts[0] = " ".join(["tok"] * 900)           # overlong doc
    t = pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                  "text": pa.array(texts)})
    ds = rd.from_arrow(t).repartition(6)
    out = pack_documents(ds, 512).to_pandas()
    assert len(out) == n
    assert out["doc_id"].nunique() == n          # exactly once
    sums = out.groupby("pack_id").agg(tot=("n_tokens", "sum"),
                                      cnt=("n_tokens", "size"),
                                      mx=("n_tokens", "max"))
    over = sums[sums["tot"] > 512]
    assert (over["cnt"] == 1).all() and (over["mx"] > 512).all()
    # pack_seq is 0..len-1 within each pack
    for _, grp in out.groupby("pack_id"):
        assert sorted(grp["pack_seq"]) == list(range(len(grp)))
    # token counts match the whitespace tokenizer
    want = pd.Series([len(x.split()) for x in texts])
    got = out.sort_values("doc_id")["n_tokens"].reset_index(drop=True)
    assert (got.values == want.values).all()
    # packing is reasonably tight: ≥ 60% average fill on multi-doc packs
    multi = sums[sums["cnt"] > 1]
    assert multi["tot"].mean() >= 0.6 * 512

    # precomputed token column path gives the same packs
    t2 = t.append_column("ntk", pa.array(
        np.array([len(x.split()) for x in texts], dtype=np.int64)))
    out2 = pack_documents(rd.from_arrow(t2).repartition(6), 512,
                          token_col="ntk").to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert (a["n_tokens"].values == b["n_tokens"].values).all()


def test_pack_documents_overlong_doc_is_alone(ray_session):
    """Over-budget docs form TRUE single-doc packs even when zero-token
    docs are present (review finding: zero-token docs must not ride
    along on the lone-doc invariant)."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.text import pack_documents

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "text": pa.array([" ".join(["t"] * 900), None, "",
                                    "a b c"], type=pa.string())})
    out = pack_documents(rd.from_arrow(t), 512).to_pandas()
    big_pack = out.loc[out["doc_id"] == 1, "pack_id"].iloc[0]
    assert (out["pack_id"] == big_pack).sum() == 1   # truly alone
    assert len(out) == 4


def test_chunk_documents_matches_reference(ray_session):
    import ray

    from bloomjoin_ray.pipelines.text import chunk_documents

    rng = np.random.default_rng(7)
    vocab = ["Alpha", "beta", "GAMMA", "delta,", "x"]
    docs = [(i, " ".join(rng.choice(vocab, rng.integers(0, 40))))
            for i in range(50)] + [(50, ""), (51, None), (52, "one"),
                                   (53, "  two   three  ")]
    size, overlap = 7, 3
    stride = size - overlap
    ds = ray.data.from_items([{"doc_id": i, "text": t} for i, t in docs])
    got = sorted(chunk_documents(ds, size, overlap=overlap)
                 .to_pandas().itertuples(index=False, name=None))

    exp = []
    for i, t in docs:
        toks = (t or "").lower().split()
        if not toks:
            continue
        nc = 1 if len(toks) <= size else -(-(len(toks) - size) // stride) + 1
        for c in range(nc):
            w = toks[c * stride:c * stride + size]
            exp.append((i, c, " ".join(w), len(w)))
    assert got == sorted(exp)

    # invariants: every chunk within budget; consecutive chunks of a doc
    # overlap by exactly `overlap`; full token coverage per doc
    per_doc = {}
    for doc_id, ci, text, clen in got:
        assert clen <= size and clen == len(text.split())
        per_doc.setdefault(doc_id, []).append((ci, text.split()))
    for doc_id, chunks in per_doc.items():
        chunks.sort()
        toks = dict(docs)[doc_id].lower().split()
        rebuilt = chunks[0][1][:]
        for (_, prev), (_, cur) in zip(chunks, chunks[1:]):
            assert prev[stride:] == cur[:len(prev) - stride]
            rebuilt.extend(cur[len(prev) - stride:])
        assert rebuilt == toks


def test_chunk_documents_validates_params(ray_session):
    import ray

    from bloomjoin_ray.pipelines.text import chunk_documents

    ds = ray.data.from_items([{"doc_id": 1, "text": "a"}])
    with pytest.raises(ValueError):
        chunk_documents(ds, 0)
    with pytest.raises(ValueError):
        chunk_documents(ds, 4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(ds, 4, overlap=-1)


def test_doc_frequency_matches_counter(ray_session):
    from collections import Counter

    import ray

    from bloomjoin_ray.pipelines.text import doc_frequency

    docs = ["the the THE cat", "the dog", "", None, "cat cat", "bird the"]
    ds = ray.data.from_items([{"text": t} for t in docs]).repartition(3)
    got = sorted(doc_frequency(ds).to_pandas()
                 .itertuples(index=False, name=None))
    c = Counter()
    for t in docs:
        for tok in set((t or "").lower().split()):
            c[tok] += 1
    assert got == sorted(c.items())


def test_tfidf_topk_matches_sql(ray_session):
    """tfidf_topk (rational idf (N+1)/(df+1)) == the SQL window-function
    replica, score bit-exact, ranks 1-based and dense per doc."""
    import pandas as pd
    import ray.data as rd

    from bloomjoin_ray.pipelines.text import tfidf_topk

    path = "/root/testdata/sf0.001/documents.parquet"
    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    got = tfidf_topk(docs, 3).to_pandas()
    con = duckdb.connect()
    want = con.sql(f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(regexp_split_to_array(lower(text),
                     '\\s+'), x -> x <> '')) AS token
          FROM '{path}'),
        tf AS (SELECT doc_id, token, count(*) AS tf
               FROM toks GROUP BY doc_id, token),
        df AS (SELECT token, count(DISTINCT doc_id) AS df
               FROM toks GROUP BY token),
        n AS (SELECT count(*) AS nd FROM '{path}'),
        s AS (SELECT t.doc_id, t.token, t.tf, d.df,
                     CAST(t.tf * (nd + 1) AS DOUBLE) / (d.df + 1) AS score,
                     row_number() OVER (PARTITION BY t.doc_id
                         ORDER BY CAST(t.tf * (nd + 1) AS DOUBLE)
                                  / (d.df + 1) DESC, t.token) AS rank
              FROM tf t JOIN df d USING (token), n)
        SELECT doc_id, token, tf, df, score, rank FROM s WHERE rank <= 3
    """).df()
    key = ["doc_id", "rank"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False)


def test_hashed_doc_vectors(ray_session):
    """Feature-hashed vectors: deterministic, unit-norm, near-dups more
    similar than unrelated docs, empty doc is the zero vector, and the
    output feeds embeddings_to_matrix unchanged."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.text import hashed_doc_vectors
    from bloomjoin_ray.stages.ann_stages import embeddings_to_matrix

    a = "the quick brown fox jumps over the lazy dog near the river bank"
    a_near = "the quick brown fox jumps over the lazy dog near the river"
    b = "stochastic gradient descent converges under convex loss surfaces"
    docs = pa.table({"doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                     "text": [a, a_near, b, ""]})
    out = hashed_doc_vectors(
        rd.from_arrow(docs).repartition(2), dim=128).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    M = np.stack(out["embedding"].to_numpy()).astype(np.float64)
    assert M.shape == (4, 128)
    # unit norm for non-empty docs; zero vector for the empty doc
    np.testing.assert_allclose(np.linalg.norm(M[:3], axis=1), 1.0,
                               rtol=1e-6)
    assert np.linalg.norm(M[3]) == 0.0
    # near-dup pair far more similar than unrelated pair
    assert M[0] @ M[1] > 0.9 > abs(M[0] @ M[2])
    # deterministic across a second run with different partitioning
    out2 = hashed_doc_vectors(
        rd.from_arrow(docs).repartition(4), dim=128).to_pandas()
    out2 = out2.sort_values("doc_id").reset_index(drop=True)
    M2 = np.stack(out2["embedding"].to_numpy())
    np.testing.assert_array_equal(M.astype(np.float32), M2)
    # round-trips through the ANN matrix extractor
    t = pa.Table.from_pandas(out)
    assert embeddings_to_matrix(t.column("embedding")).shape == (4, 128)


def test_ngram_perplexity(ray_session):
    """Bigram perplexity: in-distribution docs score lower than
    token-shuffled gibberish; <2-token docs are null; scoring is
    partition-invariant."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.text import ngram_perplexity

    rng = np.random.default_rng(5)
    # a corpus with strong bigram structure: fixed phrases repeated
    phrases = ["the cat sat on the mat", "a dog ran in the park",
               "the sun rose over the hill"]
    fluent = [phrases[i % 3] + " " + phrases[(i + 1) % 3]
              for i in range(60)]
    # gibberish: same unigram distribution, shuffled order
    def shuffle_words(s):
        w = s.split()
        rng.shuffle(w)
        return " ".join(w)
    gibberish = [shuffle_words(t) for t in fluent[:20]]
    docs = pa.table({
        "doc_id": pa.array(range(len(fluent) + len(gibberish) + 2),
                           type=pa.int64()),
        "text": fluent + gibberish + ["", "single"],
    })
    ds = rd.from_arrow(docs).repartition(3)
    out = ngram_perplexity(ds, buckets=1 << 14).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    nf = len(fluent)
    fl = out["ppl"][:nf]
    gb = out["ppl"][nf:nf + 20]
    assert fl.notna().all() and gb.notna().all()
    assert fl.mean() < 0.7 * gb.mean()
    # degenerate docs → null
    assert out["ppl"].iloc[-2:].isna().all()
    # partition invariance (same training corpus, different blocks)
    out2 = ngram_perplexity(rd.from_arrow(docs).repartition(7),
                            buckets=1 << 14).to_pandas()
    out2 = out2.sort_values("doc_id").reset_index(drop=True)
    np.testing.assert_allclose(out["ppl"].to_numpy(),
                               out2["ppl"].to_numpy(), rtol=1e-12)


def test_ngram_perplexity_counts_injection(ray_session):
    """counts=(uni, bi) from train_ngram_counts reproduces the
    self-trained scores exactly (train once, score many)."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.text import (ngram_perplexity,
                                              train_ngram_counts)

    docs = pa.table({
        "doc_id": pa.array(range(6), type=pa.int64()),
        "text": ["the cat sat on the mat"] * 3
                + ["a dog ran in the park"] * 3,
    })
    ds = rd.from_arrow(docs).repartition(2)
    auto = ngram_perplexity(ds, buckets=1 << 12).to_pandas()
    uni, bi, total = train_ngram_counts(ds, buckets=1 << 12)
    assert total == uni.sum() > 0
    inj = ngram_perplexity(ds, buckets=1 << 12,
                           counts=(uni, bi)).to_pandas()
    a = auto.sort_values("doc_id")["ppl"].to_numpy()
    b = inj.sort_values("doc_id")["ppl"].to_numpy()
    np.testing.assert_array_equal(a, b)

    with pytest.raises(ValueError, match="buckets"):
        ngram_perplexity(ds, buckets=1 << 13, counts=(uni, bi))


def test_json_extract_scalar_matches_sql(ray_session):
    """Vectorized flat-JSON field extraction vs DuckDB json_extract:
    strings (incl. \\" and \\\\ escapes), ints, floats, bools, null
    literals, and missing keys."""
    import json

    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.text import json_extract_scalar

    rng = np.random.default_rng(23)
    rows = []
    pool = ["plain", 'with "quotes"', "back\\slash", 'mix \\ then "q"',
            "", "unicode é·ü"]
    for i in range(600):
        d = {"other": int(rng.integers(0, 9))}
        r = rng.integers(0, 6)
        if r == 0:
            d["k"] = pool[int(rng.integers(0, len(pool)))]
        elif r == 1:
            d["k"] = int(rng.integers(-1000, 1000))
        elif r == 2:
            d["k"] = round(float(rng.normal()) * 100, 3)
        elif r == 3:
            d["k"] = bool(rng.integers(0, 2))
        elif r == 4:
            d["k"] = None
        # r == 5: key absent
        rows.append(json.dumps(d, ensure_ascii=False))
    t = pa.table({"id": pa.array(range(len(rows)), pa.int64()),
                  "props": pa.array(rows, pa.string())})
    con = duckdb.connect()
    con.register("t", t)

    got = (json_extract_scalar(rd.from_arrow(t).repartition(4),
                               "props", "k", out_col="v")
           .to_pandas().sort_values("id").reset_index(drop=True))
    want = con.sql("""
        SELECT id, json_extract_string(props, '$.k') AS v
        FROM t ORDER BY id
    """).df()
    # duckdb renders bools as 'true'/'false' strings — ours match raw
    pd.testing.assert_series_equal(got["v"], want["v"], check_names=False)

    # numeric cast path
    t2 = pa.table({"id": pa.array(range(50), pa.int64()),
                   "props": pa.array(
                       [json.dumps({"k": int(i) * 7}) for i in range(50)])})
    con.register("t2", t2)
    g2 = (json_extract_scalar(rd.from_arrow(t2), "props", "k",
                              out_col="v", cast=pa.int64())
          .to_pandas()[["id", "v"]]
          .sort_values("id").reset_index(drop=True))
    w2 = con.sql("""
        SELECT id, CAST(json_extract(props, '$.k') AS BIGINT) AS v
        FROM t2 ORDER BY id
    """).df()
    pd.testing.assert_frame_equal(g2, w2, check_dtype=False)


def test_regex_extract_matches_sql(ray_session):
    """Named-group extraction vs DuckDB regexp_extract (both RE2):
    multi-group patterns, unmatched rows → null, optional groups,
    nulls in, and drop_unmatched filtering."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from bloomjoin_ray.pipelines.text import regex_extract

    rows = ["GET /api/v1/users 200", "POST /login 403", "garbage line",
            None, "PUT /api/v1/items 201 extra", "get /lower 500"]
    t = pa.table({"id": pa.array(range(len(rows)), pa.int64()),
                  "line": pa.array(rows, pa.string())})
    pat = r"^(?P<verb>[A-Z]+) (?P<path>\S+) (?P<code>[0-9]{3})"

    got = (regex_extract(rd.from_arrow(t).repartition(3), "line", pat)
           .to_pandas().sort_values("id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql(r"""
        SELECT id, line,
               CASE WHEN regexp_matches(line, '^([A-Z]+) (\S+) ([0-9]{3})')
                    THEN regexp_extract(line, '^([A-Z]+) (\S+) ([0-9]{3})', 1)
               END AS verb,
               CASE WHEN regexp_matches(line, '^([A-Z]+) (\S+) ([0-9]{3})')
                    THEN regexp_extract(line, '^([A-Z]+) (\S+) ([0-9]{3})', 2)
               END AS path,
               CASE WHEN regexp_matches(line, '^([A-Z]+) (\S+) ([0-9]{3})')
                    THEN regexp_extract(line, '^([A-Z]+) (\S+) ([0-9]{3})', 3)
               END AS code
        FROM t ORDER BY id
    """).df()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)

    got2 = (regex_extract(rd.from_arrow(t), "line", pat,
                          drop_unmatched=True).to_pandas())
    assert got2["id"].tolist() == [0, 1, 4]

    with pytest.raises(ValueError):
        regex_extract(rd.from_arrow(t), "line", "[A-Z]+")


def test_canonicalize_text_matches_sql(ray_session):
    """NFC + lower + whitespace collapse vs DuckDB's
    nfc_normalize/lower/regexp_replace chain; punct strip and nulls."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.text import canonicalize_text

    rows = ["  Hello\t\tWORLD \n", "Café vs Café",  # é composed vs combining
            "a  b   c", None, "MiXeD CaSe!", ""]
    t = pa.table({"id": pa.array(range(len(rows)), pa.int64()),
                  "s": pa.array(rows, pa.string())})
    got = (canonicalize_text(rd.from_arrow(t).repartition(2), "s",
                             out_col="c")
           .to_pandas().sort_values("id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql(r"""
        SELECT id, s,
               trim(regexp_replace(lower(nfc_normalize(s)),
                                   '\s+', ' ', 'g')) AS c
        FROM t ORDER BY id
    """).df()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    # the two Café spellings now collide
    assert got.loc[1, "c"] == "café vs café"

    got2 = (canonicalize_text(rd.from_arrow(t), "s", strip_punct=True)
            .to_pandas().sort_values("id"))
    assert got2.loc[4, "s"] == "mixed case"


def test_add_time_parts_matches_sql(ray_session):
    """Calendar extraction vs DuckDB date_part incl. ISO dow/week,
    nulls, and multi-year timestamps."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from bloomjoin_ray.pipelines.text import add_time_parts

    rng = np.random.default_rng(37)
    us = rng.integers(0, 4 * 365 * 86400, 3000) * 10**6
    vals = [None if i % 97 == 0 else int(x) for i, x in enumerate(us)]
    t = pa.table({"id": pa.array(range(3000), pa.int64()),
                  "ts": pa.array(vals, pa.timestamp("us"))})
    got = (add_time_parts(rd.from_arrow(t).repartition(3), "ts",
                          ["year", "month", "day", "hour",
                           "day_of_week", "iso_week"])
           .to_pandas().sort_values("id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql("""
        SELECT id, ts,
               date_part('year', ts) AS ts_year,
               date_part('month', ts) AS ts_month,
               date_part('day', ts) AS ts_day,
               date_part('hour', ts) AS ts_hour,
               date_part('isodow', ts) AS ts_day_of_week,
               date_part('week', ts) AS ts_iso_week
        FROM t ORDER BY id
    """).df()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)

    with pytest.raises(ValueError):
        add_time_parts(rd.from_arrow(t), "ts", ["century"])


def test_ngram_counts_save_load_roundtrip(tmp_path):
    """save_ngram_counts/load_ngram_counts: atomic persistence with
    signature + buckets guards (stale or foreign counts never load)."""
    import numpy as np

    from bloomjoin_ray.pipelines.text import (load_ngram_counts,
                                              save_ngram_counts)

    rng = np.random.default_rng(7)
    uni = rng.random(1 << 10)
    bi = rng.random(1 << 10)
    path = str(tmp_path / "counts.npz")
    sig = [["a.parquet", 123, 456], 1 << 10]
    save_ngram_counts(path, uni, bi, float(uni.sum()), signature=sig)

    got = load_ngram_counts(path, buckets=1 << 10, signature=sig)
    assert got is not None
    np.testing.assert_array_equal(got[0], uni)
    np.testing.assert_array_equal(got[1], bi)
    assert got[2] == float(uni.sum())

    # tuples normalize to JSON lists — same logical signature loads
    assert load_ngram_counts(path, signature=[("a.parquet", 123, 456),
                                              1 << 10]) is not None
    assert load_ngram_counts(path, signature=["other"]) is None
    assert load_ngram_counts(path, buckets=1 << 11, signature=sig) is None
    assert load_ngram_counts(str(tmp_path / "missing.npz"),
                             signature=sig) is None
    # a torn write never surfaces: garbage at the path → None, not raise
    bad = str(tmp_path / "torn.npz")
    with open(bad, "wb") as f:
        f.write(b"\x00\x01 not a zip")
    assert load_ngram_counts(bad, signature=sig) is None


def test_bm25_topk_matches_brute_force_bit_exact(ray_session):
    """BM25 scores equal a Python oracle computing the same fixed-order
    float64 expression BIT-EXACTLY, invariant under repartitioning;
    ties break on doc_id; zero-score docs fill out short results."""
    import math

    import ray.data as rd

    from bloomjoin_ray.pipelines.text import bm25_topk

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(40)] + ["query", "terms", "here"]
    docs = [" ".join(rng.choice(vocab, int(rng.integers(4, 30))))
            for _ in range(50)]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(docs)]

    k1, b = 1.2, 0.75
    tok = [d.lower().split() for d in docs]
    n = len(tok)
    avgdl = float(sum(len(t) for t in tok)) / float(n)
    terms = ["query", "terms", "here"]
    idf = [math.log(1.0 + (n - sum(1 for t in tok if q in t) + 0.5)
                    / (sum(1 for t in tok if q in t) + 0.5))
           for q in terms]
    sc = []
    for i, t in enumerate(tok):
        norm = k1 * (1.0 - b + b * (float(len(t)) / avgdl))
        s = 0.0
        for j, q in enumerate(terms):
            tf = float(t.count(q))
            s = s + idf[j] * ((tf * (k1 + 1.0)) / (tf + norm))
        sc.append((i, s))
    sc.sort(key=lambda x: (-x[1], x[0]))

    for parts in (1, 4):
        got = bm25_topk(rd.from_items(rows).repartition(parts),
                        "query terms here", k=8).to_pandas()
        assert [(r.doc_id, r.score) for r in got.itertuples()] == sc[:8]
        assert got["rank"].tolist() == list(range(1, 9))

    # k > positive-score docs: zero-score docs pad, ordered by doc_id
    tiny = [{"doc_id": i, "text": t}
            for i, t in enumerate(["query q", "x y", "a b", "c d"])]
    got = bm25_topk(rd.from_items(tiny), "query", k=4).to_pandas()
    assert got.doc_id.tolist() == [0, 1, 2, 3]
    assert (got.score.values[1:] == 0.0).all()


def test_bm25_topk_matches_sql(ray_session):
    """DuckDB oracle parity — same left-to-right float64 expression
    written in SQL reproduces ids, ranks AND score bits."""
    import duckdb
    import ray.data as rd

    from bloomjoin_ray.pipelines.text import bm25_topk

    rng = np.random.default_rng(21)
    vocab = [f"v{i}" for i in range(30)] + ["alpha", "beta"]
    docs = [" ".join(rng.choice(vocab, int(rng.integers(3, 25))))
            for _ in range(60)]
    tbl = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    got = bm25_topk(rd.from_arrow(tbl).repartition(3), "alpha beta",
                    k=10).to_pandas()
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = con.execute(r"""
        WITH toks AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text),
                 '\s+'), x -> x <> '') AS ws FROM documents),
        stats AS (SELECT count(*) AS n, CAST(sum(len(ws)) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) AS avgdl FROM toks),
        dfs AS (SELECT
          (SELECT count(*) FROM toks WHERE list_contains(ws, 'alpha')) AS df0,
          (SELECT count(*) FROM toks WHERE list_contains(ws, 'beta'))  AS df1),
        feat AS (SELECT doc_id,
          CAST(len(list_filter(ws, x -> x = 'alpha')) AS DOUBLE) AS tf0,
          CAST(len(list_filter(ws, x -> x = 'beta'))  AS DOUBLE) AS tf1,
          1.2 * (1.0 - 0.75 + 0.75 * (CAST(len(ws) AS DOUBLE) / avgdl))
            AS norm
          FROM toks, stats),
        scored AS (SELECT doc_id,
            ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5))
              * ((tf0 * (1.2 + 1.0)) / (tf0 + norm))
          + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5))
              * ((tf1 * (1.2 + 1.0)) / (tf1 + norm)) AS score
          FROM feat, dfs, stats)
        SELECT doc_id, score, CAST(row_number() OVER
               (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        FROM scored ORDER BY score DESC, doc_id LIMIT 10
    """).df()
    assert got.doc_id.tolist() == exp.doc_id.tolist()
    assert got["rank"].tolist() == exp["rank"].tolist()
    assert (got.score.values.view(np.uint64)
            == exp.score.values.view(np.uint64)).all()


def test_count_tokens_bpe_matches_sql(ray_session):
    """Arrow and DuckDB share re2 — counts match exactly, incl.
    contractions, unicode letters/digits, punctuation runs, nulls."""
    import duckdb
    import ray.data as rd

    from bloomjoin_ray.pipelines.text import (
        BPE_TOKEN_PATTERN,
        count_tokens_bpe,
    )

    texts = ["Hello world, it's 2026!  Isn't it?", "", None,
             "naïve café №42", "  spaces   everywhere  ",
             "don't you'll we're i'm he'd they've o't", "a1b2c3", "!!!"]
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = (count_tokens_bpe(rd.from_arrow(tbl).repartition(3))
           .to_pandas().sort_values("doc_id"))
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = con.execute(
        "SELECT doc_id, CAST(len(regexp_extract_all(coalesce(text, ''),"
        " ?)) AS BIGINT) AS n_tokens_bpe FROM documents ORDER BY doc_id",
        [BPE_TOKEN_PATTERN]).df()
    assert got.n_tokens_bpe.tolist() == exp.n_tokens_bpe.tolist()
    # sanity: contraction-heavy text counts more than whitespace tokens
    assert got.n_tokens_bpe[got.doc_id == 5].iloc[0] > len(texts[5].split())
