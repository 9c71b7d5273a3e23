"""Edit-distance join: Myers kernel fuzzed against classic DP and
DuckDB's (byte-level) levenshtein; deletion-variant blocking equals
brute-force variant sets; the join matches all-pairs brute force and a
DuckDB inequality oracle in both self and cross modes."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

from bloomjoin_ray.functions.editdist import (
    deletion_variant_hashes,
    levenshtein_batch,
)

RNG = np.random.default_rng(77)
ALPHA = list("abcdef") + ["é"]  # include a multi-byte codepoint


def _dp(a: str, b: str) -> int:
    a, b = a.encode(), b.encode()
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[len(b)]


def _rand_str(lo, hi):
    return "".join(RNG.choice(ALPHA, int(RNG.integers(lo, hi))))


def test_levenshtein_batch_matches_dp_and_duckdb():
    """3k+ fuzz pairs incl. empty strings, multibyte, the 64-byte
    pattern edge, and text sides far beyond 64 bytes."""
    import duckdb

    cases = [(_rand_str(0, 15), _rand_str(0, 15)) for _ in range(3000)]
    cases += [(_rand_str(0, 25), _rand_str(65, 150)) for _ in range(150)]
    cases += [("a" * 64, "b" * 100), ("a" * 64, "a" * 64), ("", ""),
              ("", "xyz"), ("héllo", "hello")]
    a = [c[0] for c in cases]
    b = [c[1] for c in cases]
    got = levenshtein_batch(a, b)
    assert got.tolist() == [_dp(x, y) for x, y in cases]
    con = duckdb.connect()
    con.register("t", pa.table({"a": a, "b": b}))
    dd = con.execute("SELECT levenshtein(a, b) AS d FROM t").fetchnumpy()["d"]
    assert (dd == got).all()


def test_levenshtein_batch_rejects_long_pattern():
    with pytest.raises(ValueError, match="<= 64 bytes"):
        levenshtein_batch(["a" * 65], ["b" * 70])


def _brute_variants(s: str, d: int) -> set:
    frontier = {s.encode()}
    out = set(frontier)
    for _ in range(d):
        nxt = {v[:i] + v[i + 1:] for v in frontier for i in range(len(v))}
        out |= nxt
        frontier = nxt
    return out


def test_deletion_variant_hashes_match_brute_sets():
    """Sharing a variant HASH is equivalent to sharing a brute-force
    variant byte-string (so blocking is complete: ed ≤ d ⇒ collide)."""
    strs = [_rand_str(0, 10) for _ in range(200)]
    for d in (0, 1, 2):
        h, idx = deletion_variant_hashes(strs, d)
        sets: dict[int, set] = {}
        for hh, ii in zip(h.tolist(), idx.tolist()):
            sets.setdefault(ii, set()).add(hh)
        for i, j in itertools.combinations(range(80), 2):
            share = bool(sets.get(i, set()) & sets.get(j, set()))
            bshare = bool(_brute_variants(strs[i], d)
                          & _brute_variants(strs[j], d))
            assert share == bshare, (d, strs[i], strs[j])
            if _dp(strs[i], strs[j]) <= d:
                assert share


def test_edit_distance_join_matches_brute_force(ray_session):
    """Cross-mode and self-mode vs all-pairs brute force, d ∈ {0,1,2};
    nulls never match; id_a always from side A / id_a < id_b in self."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.fuzzy import edit_distance_join

    names_a = [_rand_str(1, 12) for _ in range(70)]
    names_b = [n[:-1] + "x" if len(n) > 2 else n for n in names_a[:30]]
    names_b += [_rand_str(1, 12) for _ in range(30)]
    rows_a = [{"id": i, "name": n} for i, n in enumerate(names_a)]
    rows_a.append({"id": 900, "name": None})
    da = rd.from_items(rows_a).repartition(3)
    db = rd.from_items([{"id": 1000 + i, "name": n}
                        for i, n in enumerate(names_b)]).repartition(2)
    for d in (0, 1, 2):
        got = edit_distance_join(da, db, col="name", id_col="id",
                                 max_dist=d).to_pandas()
        gset = {(r.id_a, r.id_b, r.dist) for r in got.itertuples()}
        exp = {(i, 1000 + j, _dp(a, b))
               for i, a in enumerate(names_a)
               for j, b in enumerate(names_b) if _dp(a, b) <= d}
        assert gset == exp, d
        assert (got.id_a < 1000).all() and (got.id_b >= 1000).all()

    got = edit_distance_join(da, col="name", id_col="id",
                             max_dist=1).to_pandas()
    gset = {(r.id_a, r.id_b, r.dist) for r in got.itertuples()}
    exp = {(i, j, _dp(names_a[i], names_a[j]))
           for i, j in itertools.combinations(range(len(names_a)), 2)
           if _dp(names_a[i], names_a[j]) <= 1}
    assert gset == exp
    assert (got.id_a < got.id_b).all()


def test_edit_distance_join_matches_sql(ray_session):
    """DuckDB inequality-join oracle on a customer-name-shaped column,
    keep_strings round-trip included."""
    import duckdb
    import ray.data as rd

    from bloomjoin_ray.pipelines.fuzzy import edit_distance_join

    names = [f"Cust#{i:05d}" for i in range(300)]
    tbl = pa.table({"id": list(range(300)), "name": names})
    ds = rd.from_arrow(tbl).repartition(4)
    got = (edit_distance_join(ds, col="name", id_col="id", max_dist=1,
                              keep_strings=True)
           .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("c", tbl)
    exp = con.execute("""
        SELECT a.id AS id_a, b.id AS id_b,
               levenshtein(a.name, b.name) AS dist
        FROM c a, c b
        WHERE a.id < b.id AND levenshtein(a.name, b.name) <= 1
        ORDER BY id_a, id_b
    """).df()
    assert len(got) == len(exp) > 0
    assert (got.id_a.values == exp.id_a.values).all()
    assert (got.id_b.values == exp.id_b.values).all()
    assert (got.dist.values == exp.dist.values).all()
    assert (got.str_a == got.id_a.map(lambda i: names[i])).all()


def test_edit_distance_join_rejects_long_strings(ray_session):
    import ray.data as rd

    from bloomjoin_ray.pipelines.fuzzy import edit_distance_join

    ds = rd.from_items([{"id": 0, "name": "x" * 80}])
    with pytest.raises(Exception, match="64 bytes"):
        edit_distance_join(ds, col="name", id_col="id",
                           max_dist=1).to_pandas()


def test_fuzzy_dedup_keeps_one_per_cluster(ray_session):
    """Transitive ed≤1 clusters collapse to their min-id (or best-score)
    member; unique names survive; matches a brute-force union-find."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.fuzzy import fuzzy_dedup

    names = ["alpha", "alphA", "alphX",        # chain: one cluster
             "bravo", "bravoo",                # pair
             "charlie", "delta"]               # singletons
    rows = [{"id": i, "name": n, "q": float(len(n))}
            for i, n in enumerate(names)]
    ds = rd.from_items(rows).repartition(3)

    got = fuzzy_dedup(ds, col="name", id_col="id",
                      max_dist=1).to_pandas().sort_values("id")
    # brute force
    parent = list(range(len(names)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            if _dp(names[i], names[j]) <= 1:
                parent[find(i)] = find(j)
    keep = {min(k for k in range(len(names)) if find(k) == r)
            for r in {find(i) for i in range(len(names))}}
    assert set(got.id) == keep

    # score policy: keep the longest name of each cluster
    got = fuzzy_dedup(ds, col="name", id_col="id", max_dist=1,
                      score_col="q").to_pandas()
    assert "bravoo" in set(got.name)
    assert "bravo" not in set(got.name)
