"""Decontamination: exact parity with a brute-force Python oracle
(token n-gram sets), strict-window kernel semantics, drop/flag modes,
edge inputs (short / empty / null / whitespace docs, empty eval set)."""

import numpy as np
import pyarrow as pa
import pytest

from bloomjoin_ray.functions.text import (
    word_ngram_hashes,
    word_ngram_hashes_batch,
)
from bloomjoin_ray.pipelines.decontam import (
    contaminated_counts,
    decontaminate,
    ngram_postings,
)

RNG = np.random.default_rng(7)
VOCAB = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
         "kilo lima mike november oscar papa").split()


def _doc(n_tok):
    return " ".join(RNG.choice(VOCAB, size=n_tok))


def _corpus(n_docs, lo=3, hi=30):
    return [_doc(int(RNG.integers(lo, hi))) for _ in range(n_docs)]


def _grams(text, n):
    toks = (text or "").lower().split()
    return {tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _brute_counts(train, test, n):
    eval_grams = set().union(*(_grams(t, n) for t in test)) if test else set()
    return {i: len(_grams(t, n) & eval_grams)
            for i, t in enumerate(train) if _grams(t, n) & eval_grams}


# ------------------------------------------------ strict-window kernel ----

def test_strict_kernel_matches_single_doc():
    texts = pa.array(["a b c d", "x y", "", None, "   ", "q q q"],
                     type=pa.string())
    flat, offs = word_ngram_hashes_batch(texts, 3, pad=False)
    for i, t in enumerate(texts.to_pylist()):
        single = word_ngram_hashes(t, 3, pad=False)
        assert np.array_equal(np.sort(single), flat[offs[i]:offs[i + 1]])
    # docs with < n tokens yield NOTHING under strict windows
    assert offs[2] == offs[1]          # 2-token doc
    assert offs[-1] - offs[-2] == 1    # "q q q" → one gram


def test_strict_kernel_never_pads():
    # a short doc must not share a gram with another short doc via padding
    texts = pa.array(["foo bar", "baz qux"], type=pa.string())
    flat, offs = word_ngram_hashes_batch(texts, 3, pad=False)
    assert len(flat) == 0 and offs.tolist() == [0, 0, 0]


def test_ngram_postings_per_doc_unique(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"doc_id": 0, "text": "w w w w w"},
                        {"doc_id": 1, "text": "a b a b a b"}])
    posts = ngram_postings(ds, n=2).to_pandas()
    # per-doc unique: doc 0 has ONE distinct 2-gram, doc 1 has two
    assert posts.groupby("doc_id").size().to_dict() == {0: 1, 1: 2}


# ------------------------------------------------ end-to-end parity -------

@pytest.mark.parametrize("n", [2, 3])
def test_counts_match_bruteforce(ray_session, n):
    import ray.data as rd

    train = _corpus(120)
    test = _corpus(15)
    expected = _brute_counts(train, test, n)
    ds_train = rd.from_items([{"doc_id": i, "text": t}
                              for i, t in enumerate(train)]).repartition(7)
    ds_test = rd.from_items([{"text": t} for t in test]).repartition(3)
    got = contaminated_counts(ds_train, ds_test, n=n).to_pandas()
    assert dict(zip(got.doc_id, got.n_contaminated)) == expected


def test_drop_and_flag_modes(ray_session):
    import ray.data as rd

    train = _corpus(80)
    test = _corpus(10)
    expected = _brute_counts(train, test, 3)
    ds_train = rd.from_items([{"doc_id": i, "text": t}
                              for i, t in enumerate(train)]).repartition(5)
    ds_test = rd.from_items([{"text": t} for t in test])

    dropped = decontaminate(ds_train, ds_test, n=3, mode="drop").to_pandas()
    assert set(dropped.doc_id) == set(range(len(train))) - set(expected)

    flagged = decontaminate(ds_train, ds_test, n=3, mode="flag").to_pandas()
    assert len(flagged) == len(train)
    by_id = flagged.set_index("doc_id")
    for i in range(len(train)):
        assert by_id.loc[i, "n_contaminated"] == expected.get(i, 0)
        assert bool(by_id.loc[i, "contaminated"]) == (i in expected)
    # schema: counts int64, flag bool, original columns preserved
    assert str(flagged.dtypes["n_contaminated"]) == "int64"
    assert "text" in flagged.columns

    with pytest.raises(ValueError):
        decontaminate(ds_train, ds_test, mode="purge")


def test_edge_docs_and_empty_eval(ray_session):
    import ray.data as rd

    ds_train = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["alpha bravo charlie delta",
                          "al br",  # < n tokens: never flagged
                          "", None, "   "], type=pa.string())}))
    ds_test = rd.from_items([{"text": "alpha bravo charlie"}])
    got = contaminated_counts(ds_train, ds_test, n=3).to_pandas()
    assert dict(zip(got.doc_id, got.n_contaminated)) == {0: 1}

    # eval set with no documents ⇒ nothing contaminated, drop is identity
    empty = rd.from_items([{"text": ""}])
    kept = decontaminate(ds_train, empty, n=3, mode="drop").to_pandas()
    assert set(kept.doc_id) == {0, 1, 2, 3, 4}


def test_bloom_prefilter_prunes(ray_session):
    """The corpus-side posting stream must shrink to ~matches + fpr·grams
    (the whole point of the Bloom pass): with a disjoint eval set and a
    tight fpr, the survivor count is a tiny fraction of total grams."""
    import ray.data as rd

    train = _corpus(200, lo=10, hi=40)
    # disjoint vocabulary ⇒ zero true contamination
    test = [" ".join(RNG.choice(["zz", "yy", "xx", "ww"], size=12))
            for _ in range(10)]
    ds_train = rd.from_items([{"doc_id": i, "text": t}
                              for i, t in enumerate(train)])
    ds_test = rd.from_items([{"text": t} for t in test])
    got = contaminated_counts(ds_train, ds_test, n=3, fpr=1e-4).to_pandas()
    assert len(got) == 0  # exact verify removes every Bloom false positive


def test_filter_budget_fallback(ray_session):
    """An eval set whose Bloom would exceed max_filter_bits skips the
    broadcast and still returns exact counts via the plain semi-join."""
    import ray.data as rd

    train = _corpus(60)
    test = _corpus(8)
    expected = _brute_counts(train, test, 3)
    ds_train = rd.from_items([{"doc_id": i, "text": t}
                              for i, t in enumerate(train)]).repartition(4)
    ds_test = rd.from_items([{"text": t} for t in test])
    got = contaminated_counts(ds_train, ds_test, n=3,
                              max_filter_bits=1).to_pandas()
    assert dict(zip(got.doc_id, got.n_contaminated)) == expected


def test_partitioned_join_path(ray_session):
    """Force the semi-join's partitioned (non-broadcast) path: the split
    gram keys must survive the canonical bucketing hasher (a single
    full-range int64 key column would crash it)."""
    import ray.data as rd

    train = _corpus(100)
    test = _corpus(12)
    expected = _brute_counts(train, test, 3)
    ds_train = rd.from_items([{"doc_id": i, "text": t}
                              for i, t in enumerate(train)]).repartition(6)
    ds_test = rd.from_items([{"text": t} for t in test])
    got = contaminated_counts(ds_train, ds_test, n=3,
                              broadcast_limit_rows=0).to_pandas()
    assert dict(zip(got.doc_id, got.n_contaminated)) == expected


def _brute_cross_doc(docs, n, min_df):
    gsets = {i: _grams(t, n) for i, t in enumerate(docs)}
    from collections import Counter
    df = Counter()
    for s in gsets.values():
        df.update(s)
    out = {}
    for i, s in gsets.items():
        if not s:
            continue
        nd = sum(1 for g in s if df[g] >= min_df)
        out[i] = (len(s), nd, nd / len(s))
    return out


def test_cross_doc_ngram_stats_matches_brute_force(ray_session):
    """Exact parity with a Python oracle on a corpus with planted
    boilerplate (a shared sentence injected into a third of the docs),
    at min_df 2 and 3, invariant under repartitioning."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.decontam import cross_doc_ngram_stats

    docs = _corpus(40, lo=2, hi=25)  # lo=2: some docs emit nothing at n=3
    boiler = "all rights reserved contact us for details"
    docs = [d + " " + boiler if i % 3 == 0 else d
            for i, d in enumerate(docs)]
    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(docs)])
    for min_df in (2, 3):
        exp = _brute_cross_doc(docs, 3, min_df)
        for parts in (1, 5):
            got = cross_doc_ngram_stats(
                ds.repartition(parts), n=3, min_df=min_df).to_pandas()
            gd = {r.doc_id: (r.n_grams, r.n_dup_grams, r.dup_fraction)
                  for r in got.itertuples()}
            assert set(gd) == set(exp)
            for k in exp:
                assert gd[k] == exp[k], (min_df, parts, k)


def test_cross_doc_ngram_stats_matches_sql(ray_session):
    """DuckDB oracle parity (string grams vs 64-bit hashed grams —
    identical absent hash collisions) including exact dup_fraction."""
    import duckdb
    import ray.data as rd

    from bloomjoin_ray.pipelines.decontam import cross_doc_ngram_stats

    docs = _corpus(50, lo=3, hi=20)
    tbl = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    got = (cross_doc_ngram_stats(rd.from_arrow(tbl).repartition(4),
                                 n=3, min_df=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = con.execute(r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '') AS ws
          FROM documents),
        grams AS (
          SELECT DISTINCT doc_id,
                 ws[i] || chr(31) || ws[i+1] || chr(31) || ws[i+2] AS g
          FROM toks, UNNEST(range(1, len(ws) - 1)) AS t(i)
          WHERE len(ws) >= 3),
        df AS (SELECT g, count(*) AS df FROM grams GROUP BY g),
        per AS (
          SELECT doc_id, count(*) AS n_grams,
                 CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_grams
          FROM grams JOIN df USING (g) GROUP BY doc_id)
        SELECT doc_id, n_grams, n_dup_grams,
               CAST(n_dup_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)
                 AS dup_fraction
        FROM per ORDER BY doc_id
    """).df()
    assert len(got) == len(exp)
    assert (got.doc_id.values == exp.doc_id.values).all()
    assert (got.n_grams.values == exp.n_grams.values).all()
    assert (got.n_dup_grams.values == exp.n_dup_grams.values).all()
    assert (got.dup_fraction.values == exp.dup_fraction.values).all()


def _brute_spans(docs: dict, n: int, min_count: int):
    from collections import Counter

    toks = {d: (t or "").lower().split() for d, t in docs.items()}
    cnt = Counter()
    for t in toks.values():
        for i in range(len(t) - n + 1):
            cnt[tuple(t[i:i + n])] += 1
    out = []
    for d in sorted(toks):
        t = toks[d]
        dup = [i for i in range(len(t) - n + 1)
               if cnt[tuple(t[i:i + n])] >= min_count]
        spans = []
        for p in dup:
            if spans and p - spans[-1][1] <= n:
                spans[-1] = (spans[-1][0], p, spans[-1][2] + 1)
            else:
                spans.append((p, p, 1))
        out += [(d, s, e + n, c) for (s, e, c) in spans]
    return out


def test_duplicate_spans_matches_brute_force(ray_session):
    """Merged duplicated-span extraction == brute force (planted shared
    sentences, within-doc repetition, overlapping spans), partition
    invariant, min_count 2 and 3."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.decontam import duplicate_spans

    docs = {i: _doc(int(RNG.integers(3, 25))) for i in range(30)}
    shared = "one shared boilerplate sentence across many documents"
    for i in range(0, 30, 4):
        docs[i] = docs[i] + " " + shared
    docs[50] = "rep rep rep rep rep rep rep"           # self-repetition
    docs[51] = shared + " middle bits " + shared        # two spans, merged?
    ds = rd.from_items([{"doc_id": d, "text": t} for d, t in docs.items()])
    for min_count in (2, 3):
        exp = _brute_spans(docs, 3, min_count)
        for parts in (1, 6):
            got = (duplicate_spans(ds.repartition(parts), n=3,
                                   min_count=min_count)
                   .to_pandas().sort_values(["doc_id", "span_start"]))
            gl = [tuple(r) for r in got[["doc_id", "span_start",
                                         "span_end", "n_windows"]].values]
            assert gl == exp, (min_count, parts)


def test_duplicate_spans_matches_sql(ray_session):
    """DuckDB gaps-and-islands oracle parity on a random corpus."""
    import duckdb
    import ray.data as rd

    from bloomjoin_ray.pipelines.decontam import duplicate_spans

    docs = [_doc(int(RNG.integers(3, 30))) for _ in range(60)]
    tbl = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    got = (duplicate_spans(rd.from_arrow(tbl).repartition(4), n=3,
                           min_count=2)
           .to_pandas().sort_values(["doc_id", "span_start"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = con.execute(r"""
        WITH toks AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text),
                 '\s+'), x -> x <> '') AS ws FROM documents),
        grams AS (
          SELECT doc_id, i - 1 AS pos,
                 ws[i] || chr(31) || ws[i+1] || chr(31) || ws[i+2] AS g
          FROM toks, UNNEST(range(1, len(ws) - 1)) AS t(i)
          WHERE len(ws) >= 3),
        cnt AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
        dup AS (SELECT doc_id, pos FROM grams JOIN cnt USING (g)
                WHERE c >= 2),
        flag AS (SELECT doc_id, pos,
                 CASE WHEN pos - lag(pos) OVER
                      (PARTITION BY doc_id ORDER BY pos) <= 3
                      THEN 0 ELSE 1 END AS brk FROM dup),
        isl AS (SELECT doc_id, pos, sum(brk) OVER
                (PARTITION BY doc_id ORDER BY pos) AS grp FROM flag)
        SELECT doc_id, min(pos) AS span_start,
               CAST(max(pos) + 3 AS BIGINT) AS span_end,
               count(*) AS n_windows
        FROM isl GROUP BY doc_id, grp
        ORDER BY doc_id, span_start
    """).df()
    assert len(got) == len(exp) > 0
    for c in ["doc_id", "span_start", "span_end", "n_windows"]:
        assert (got[c].values == exp[c].values).all(), c


def test_scrub_duplicate_spans_matches_sql(ray_session):
    """Token-level scrub == DuckDB rebuild (case preserved, whitespace
    normalized, nulls → ''), partition invariant; n_removed exact."""
    import duckdb
    import ray.data as rd

    from bloomjoin_ray.pipelines.decontam import scrub_duplicate_spans

    docs = [_doc(int(RNG.integers(3, 25))) for _ in range(40)]
    shared = "alpha bravo charlie delta echo"
    docs = [d + " " + shared if i % 3 == 0 else d
            for i, d in enumerate(docs)]
    docs[7] = docs[7].upper()           # case must survive the rebuild
    tbl = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = con.execute(r"""
        WITH toks AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                 x -> x <> '') AS ws FROM documents),
        grams AS (
          SELECT doc_id, i - 1 AS pos,
                 lower(ws[i]) || chr(31) || lower(ws[i+1]) || chr(31)
                   || lower(ws[i+2]) AS g
          FROM toks, UNNEST(range(1, len(ws) - 1)) AS t(i)
          WHERE len(ws) >= 3),
        cnt AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
        dup AS (SELECT doc_id, pos FROM grams JOIN cnt USING (g)
                WHERE c >= 2),
        flag AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER
                 (PARTITION BY doc_id ORDER BY pos) <= 3
                 THEN 0 ELSE 1 END AS brk FROM dup),
        isl AS (SELECT doc_id, pos, sum(brk) OVER
                (PARTITION BY doc_id ORDER BY pos) AS grp FROM flag),
        spans AS (SELECT doc_id, min(pos) AS s, max(pos) + 3 AS e
                  FROM isl GROUP BY doc_id, grp),
        toku AS (SELECT doc_id, i - 1 AS pos, ws[i] AS tok
                 FROM toks, UNNEST(range(1, len(ws) + 1)) AS t(i)),
        keep AS (SELECT doc_id, pos, tok FROM toku u
                 WHERE NOT EXISTS (SELECT 1 FROM spans s
                   WHERE s.doc_id = u.doc_id
                     AND u.pos >= s.s AND u.pos < s.e))
        SELECT d.doc_id,
               coalesce(k.txt, '') AS text_scrubbed,
               CAST(len(t.ws) - coalesce(k.cnt, 0) AS BIGINT) AS n_removed
        FROM documents d
        JOIN toks t USING (doc_id)
        LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS txt,
                          count(*) AS cnt FROM keep GROUP BY doc_id) k
          USING (doc_id)
        ORDER BY doc_id
    """).df()
    for parts in (1, 5):
        got = (scrub_duplicate_spans(rd.from_arrow(tbl).repartition(parts),
                                     n=3, min_count=2)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert got.doc_id.tolist() == exp.doc_id.tolist()
        assert got.text_scrubbed.tolist() == exp.text_scrubbed.tolist()
        assert got.n_removed.tolist() == exp.n_removed.tolist()
    # spot semantics: scrubbed docs no longer contain the shared run
    assert all(shared not in t for t in got.text_scrubbed)
