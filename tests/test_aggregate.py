"""Sketch-aggregation pipelines over Ray Datasets: global (no shuffle),
grouped (partials shuffle), salted two-stage == unsalted (merge
associativity under repartitioning), exact aggregates vs duckdb."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def events_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet("/root/testdata/sf0.01/events.parquet")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql("CREATE VIEW events AS SELECT * FROM '/root/testdata/sf0.01/events.parquet'")
    return c


def test_hll_distinct_global(events_ds, con):
    from bloomjoin_ray.pipelines.aggregate import hll_distinct

    true = con.sql("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    est = hll_distinct(events_ds, "user_id", p=14)
    assert abs(est - true) / true < 4 * (1.04 / np.sqrt(2**14))


def test_hll_distinct_grouped_and_salted(events_ds, con):
    from bloomjoin_ray.pipelines.aggregate import hll_distinct

    true = con.sql(
        "SELECT user_id, count(DISTINCT event_type) d FROM events GROUP BY 1"
    ).df().sort_values("user_id").reset_index(drop=True)
    got = hll_distinct(events_ds, "event_type", key="user_id").to_pandas()
    got = got.sort_values("user_id").reset_index(drop=True)
    assert len(got) == len(true)
    # tiny per-group cardinalities → linear counting is exact
    np.testing.assert_array_equal(got["distinct_est"].round().astype(int), true["d"])

    salted = hll_distinct(events_ds, "event_type", key="user_id", salt=4).to_pandas()
    salted = salted.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, salted)  # salting must not change results


def test_quantiles_global(events_ds, con):
    from bloomjoin_ray.pipelines.aggregate import approx_quantiles

    true = np.array(con.sql(
        "SELECT quantile_cont(value, [0.1, 0.5, 0.9]) FROM events").fetchone()[0])
    for method in ("tdigest", "kll"):
        est = approx_quantiles(events_ds, "value", [0.1, 0.5, 0.9], method=method)
        # rank-error check via duckdb cdf
        for q, e in zip((0.1, 0.5, 0.9), est):
            r = con.sql(f"SELECT avg(CASE WHEN value <= {e} THEN 1.0 ELSE 0 END) FROM events").fetchone()[0]
            assert abs(r - q) < 0.03, (method, q, r)


def test_quantiles_grouped(events_ds, con):
    from bloomjoin_ray.pipelines.aggregate import approx_quantiles

    got = approx_quantiles(events_ds, "value", [0.5], key="event_type").to_pandas()
    true = con.sql(
        "SELECT event_type, median(value) m FROM events GROUP BY 1").df()
    m = got.merge(true, on="event_type")
    assert len(m) == len(true)
    # per-group n≈2000 → median within a few percent rank error
    for _, row in m.iterrows():
        r = con.sql(
            f"SELECT avg(CASE WHEN value <= {row['q50']} THEN 1.0 ELSE 0 END) "
            f"FROM events WHERE event_type = '{row['event_type']}'").fetchone()[0]
        assert abs(r - 0.5) < 0.05


def test_filter_by_quantile(events_ds, con):
    from bloomjoin_ray.pipelines.aggregate import filter_by_quantile

    n = con.sql("SELECT count(*) FROM events").fetchone()[0]
    kept, thr = filter_by_quantile(events_ds, "value", 0.9, keep="ge")
    t = kept.to_pandas()
    # every survivor satisfies the cut, and the kept fraction is within
    # the sketch's rank error of 1 - q
    assert (t["value"] >= thr).all()
    assert abs(len(t) / n - 0.1) < 0.03
    # exact survivor set given the threshold (the filter pass is exact)
    true = con.sql(f"SELECT count(*) FROM events WHERE value >= {thr}").fetchone()[0]
    assert len(t) == true

    kept_lt, thr_lt = filter_by_quantile(events_ds, "value", 0.25, keep="lt")
    t_lt = kept_lt.to_pandas()
    assert (t_lt["value"] < thr_lt).all()
    assert abs(len(t_lt) / n - 0.25) < 0.03

    with pytest.raises(ValueError):
        filter_by_quantile(events_ds, "value", 0.5, keep="between")
    with pytest.raises(ValueError):
        filter_by_quantile(events_ds, "value", 1.5)


def test_filter_by_quantile_grouped(events_ds, con):
    from bloomjoin_ray.pipelines.aggregate import filter_by_quantile

    kept, thr_tbl = filter_by_quantile(events_ds, "value", 0.75,
                                       key="event_type", keep="ge")
    t = kept.to_pandas()
    thr = thr_tbl.to_pandas().set_index("event_type")["threshold"]
    true_counts = con.sql(
        "SELECT event_type, count(*) n FROM events GROUP BY 1"
    ).df().set_index("event_type")["n"]
    assert set(thr.index) == set(true_counts.index)
    for et, g in t.groupby("event_type"):
        # every survivor clears ITS group's threshold...
        assert (g["value"] >= thr[et]).all()
        # ...the survivor set is exact given the threshold...
        exact = con.sql(
            f"SELECT count(*) FROM events WHERE event_type = '{et}' "
            f"AND value >= {thr[et]}").fetchone()[0]
        assert len(g) == exact
        # ...and the per-group kept fraction is ~1-q within rank error
        assert abs(len(g) / true_counts[et] - 0.25) < 0.05


def test_grouped_vector_mean(ray_session):
    """Per-label centroids match numpy brute force (to float64 merge
    tolerance) and are invariant to the number of partitions."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import grouped_vector_mean

    emb = pd.read_parquet("/root/testdata/sf0.01/embeddings.parquet")
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    want = {int(lbl): M[emb["label"].to_numpy() == lbl].mean(axis=0)
            for lbl in emb["label"].unique()}

    for parts in (2, 9):
        ds = rd.read_parquet(
            "/root/testdata/sf0.01/embeddings.parquet").repartition(parts)
        got = grouped_vector_mean(ds, "embedding", "label").to_pandas()
        assert len(got) == len(want)
        assert got["n"].sum() == len(emb)
        for _, row in got.iterrows():
            np.testing.assert_allclose(
                np.asarray(row["centroid"]), want[int(row["label"])],
                rtol=1e-9, atol=1e-12)


def test_bucketize_by_quantile(events_ds, con):
    from bloomjoin_ray.pipelines.aggregate import bucketize_by_quantile

    labeled, bounds = bucketize_by_quantile(events_ds, "value", 4)
    t = labeled.to_pandas()
    assert list(bounds) == sorted(bounds) and len(bounds) == 3
    # bucket is exactly searchsorted(bounds, value) given the boundaries
    want = np.searchsorted(bounds, t["value"].to_numpy(), side="right")
    assert (t["bucket"].to_numpy() == want).all()
    # equal-frequency within rank error
    frac = t["bucket"].value_counts(normalize=True)
    assert set(frac.index) == {0, 1, 2, 3}
    assert (np.abs(frac - 0.25) < 0.04).all()

    with pytest.raises(ValueError):
        bucketize_by_quantile(events_ds, "value", 1)


def test_filter_by_quantile_empty(ray_session):
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import filter_by_quantile

    empty = rd.from_arrow(pa.table({"v": pa.array([], type=pa.float64())}))
    kept, thr = filter_by_quantile(empty, "v", 0.5)
    assert np.isnan(thr) and kept.count() == 0


def test_cms_heavy_hitters_match_exact(events_ds, con):
    from bloomjoin_ray.pipelines.aggregate import cms_heavy_hitters

    hh = cms_heavy_hitters(events_ds, "event_type", topk=5, width=8192)
    true = con.sql(
        "SELECT event_type, count(*) n FROM events GROUP BY 1 ORDER BY n DESC, event_type"
    ).df()
    got = hh.to_pandas()
    assert set(got["event_type"]) == set(true["event_type"][:5])
    m = got.merge(true, on="event_type")
    # CMS never undercounts; with width >> distincts the estimates are exact
    assert (m["est_count"] >= m["n"]).all()
    assert ((m["est_count"] - m["n"]) <= np.e / 8192 * len(m) * 10000).all()


def test_topk_and_distinct_exact(events_ds, con):
    from bloomjoin_ray.pipelines.aggregate import distinct_exact, topk_exact

    true_n = con.sql("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert distinct_exact(events_ds, "user_id") == true_n

    got = topk_exact(events_ds, "event_type", 3).to_pandas()
    true = con.sql(
        "SELECT event_type, count(*) n FROM events GROUP BY 1 ORDER BY n DESC LIMIT 3").df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), true, check_dtype=False)


def test_multi_column_distinct(events_ds, con):
    from bloomjoin_ray.pipelines.aggregate import distinct_exact, hll_distinct

    true = con.sql(
        "SELECT count(DISTINCT (user_id, event_type)) FROM events").fetchone()[0]
    assert distinct_exact(events_ds, ["user_id", "event_type"]) == true
    est = hll_distinct(events_ds, ["user_id", "event_type"])
    assert abs(est - true) / true < 4 * (1.04 / np.sqrt(2**14))


def test_empty_dataset(ray_session):
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import approx_quantiles, hll_distinct

    empty = rd.from_arrow(pa.table({"k": pa.array([], type=pa.int64()),
                                    "v": pa.array([], type=pa.float64())}))
    assert hll_distinct(empty, "k") == 0.0
    assert np.isnan(approx_quantiles(empty, "v", [0.5])).all()


def test_split_refs_by_group_slices_only_own_buckets(ray_session, monkeypatch):
    """Per-bucket exchange contract (cluster mode): a reducer's task
    arguments reference ONLY objects holding its bucket set — the split
    stage must route each packed row to exactly one group slice."""
    import ray

    from bloomjoin_ray.pipelines.exchange import split_refs_by_group

    monkeypatch.setenv("BLOOMJOIN_EXCHANGE_SPLIT", "always")

    num_buckets, num_groups = 64, 32
    rng = np.random.default_rng(7)
    blocks = []
    for _ in range(3):
        buckets = rng.integers(0, num_buckets, size=40).astype(np.int32)
        blocks.append(pa.table({
            "__gbucket": pa.array(buckets),
            "pack": pa.array([bytes([b]) for b in buckets],
                             type=pa.large_binary()),
        }))
    refs = [ray.put(b) for b in blocks]
    parts = split_refs_by_group(refs, "__gbucket", num_groups)
    assert len(parts) == num_groups
    total = 0
    for g, group_refs in enumerate(parts):
        assert len(group_refs) == len(blocks)  # one slice per map block
        for sl in ray.get(list(group_refs)):
            gb = np.asarray(sl.column("__gbucket"))
            assert (gb % num_groups == g).all()
            total += sl.num_rows
    assert total == sum(b.num_rows for b in blocks)  # nothing dropped/duped


def test_hll_grouped_empty_schema(ray_session):
    """Empty input → empty Dataset with the proper [key, out_col] schema
    (not the internal packed columns)."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import hll_distinct

    empty = rd.from_arrow(pa.table({"k": pa.array([], type=pa.int64()),
                                    "v": pa.array([], type=pa.string())}))
    out = hll_distinct(empty, "v", key="k")
    assert out.schema().names == ["k", "distinct_est"]
    assert out.count() == 0


def test_cluster_split_mode_parity(events_ds, con, monkeypatch):
    """Forced cluster-mode split (per-reducer objects) produces the same
    grouped results as the local zero-copy path."""
    from bloomjoin_ray.pipelines.aggregate import hll_distinct

    local = hll_distinct(events_ds, "event_type", key="user_id").to_pandas()
    monkeypatch.setenv("BLOOMJOIN_EXCHANGE_SPLIT", "always")
    split = hll_distinct(events_ds, "event_type", key="user_id").to_pandas()
    key = "user_id"
    pd.testing.assert_frame_equal(
        local.sort_values(key).reset_index(drop=True),
        split.sort_values(key).reset_index(drop=True))


def test_gather_bucket_packs_streams_refs(ray_session):
    """The reducer-side gather takes ObjectRefs and fetches them one at
    a time (streaming contract, verdict r2 #5); output equals a direct
    bulk unpack."""
    import ray

    from bloomjoin_ray.pipelines.aggregate import _gather_bucket_packs

    def pack_block(seed, bucket):
        rng = np.random.default_rng(seed)
        inner = pa.table({"k": rng.integers(0, 50, 1000),
                          "v": rng.standard_normal(1000)})
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, inner.schema) as w:
            w.write_table(inner)
        return inner, pa.table({
            "__gbucket": pa.array([bucket], type=pa.int32()),
            "pack": pa.array([sink.getvalue().to_pybytes()],
                             type=pa.large_binary())})

    inners, blocks = zip(*[pack_block(i, i % 4) for i in range(8)])
    refs = [ray.put(b) for b in blocks]
    got = _gather_bucket_packs(2, 4, refs)       # buckets ≡ 2 (mod 4)
    want = pa.concat_tables([inners[i] for i in range(8) if i % 4 == 2])
    assert got.num_rows == want.num_rows
    assert np.array_equal(np.asarray(got.column("k")),
                          np.asarray(want.column("k")))
    assert _gather_bucket_packs(3, 4, []) is None


def test_theta_grouped_exact_and_partition_invariant(ray_session):
    """Per-key theta set algebra (verdict r3 #8): below sketch capacity
    the estimates are exact, and merging partials in ANY partition
    order gives the identical result (the merge law)."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import theta_set_estimates_grouped

    rng = np.random.default_rng(7)
    keys = np.array(["k%d" % (i % 6) for i in range(4000)])
    va = rng.integers(0, 300, 4000)
    vb = rng.integers(150, 450, 4000)           # overlapping value range
    ta = pa.table({"g": keys, "u": va})
    tb = pa.table({"g": keys, "u": vb})

    def run(parts):
        a = rd.from_arrow(ta).repartition(parts)
        b = rd.from_arrow(tb).repartition(parts)
        return (theta_set_estimates_grouped(a, b, "u", "g")
                .to_pandas().sort_values("g").reset_index(drop=True))

    got1, got8 = run(1), run(8)
    pd.testing.assert_frame_equal(got1, got8)   # partition invariance

    df_a = ta.to_pandas()
    df_b = tb.to_pandas()
    for _, row in got1.iterrows():
        sa = set(df_a[df_a["g"] == row["g"]]["u"])
        sb = set(df_b[df_b["g"] == row["g"]]["u"])
        assert row["distinct_a"] == len(sa)
        assert row["distinct_b"] == len(sb)
        assert row["n_union"] == len(sa | sb)
        assert row["n_intersection"] == len(sa & sb)
        assert row["jaccard"] == pytest.approx(len(sa & sb) / len(sa | sb))


def test_theta_grouped_one_sided_key(ray_session):
    """A key present on only one side gets the empty-sketch semantics."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import theta_set_estimates_grouped

    a = rd.from_arrow(pa.table({"g": ["x", "x", "only_a"], "u": [1, 2, 9]}))
    b = rd.from_arrow(pa.table({"g": ["x"], "u": [2]}))
    df = (theta_set_estimates_grouped(a, b, "u", "g")
          .to_pandas().set_index("g"))
    assert df.loc["only_a", "distinct_a"] == 1
    assert df.loc["only_a", "distinct_b"] == 0
    assert df.loc["only_a", "n_intersection"] == 0
    assert df.loc["only_a", "jaccard"] == 0.0
    assert df.loc["x", "n_intersection"] == 1
    assert df.loc["x", "n_union"] == 2


def test_topk_rows_per_key_matches_sql(events_ds, con):
    """topk_rows_per_key == SQL row_number() OVER (PARTITION BY ...
    ORDER BY ...) <= k, including the 1-based rank column, and is
    invariant under repartitioning (per-block prune is mergeable)."""
    from bloomjoin_ray.pipelines.aggregate import topk_rows_per_key

    order = [("value", "descending"), ("event_id", "ascending")]
    proj = events_ds.select_columns(["user_id", "event_id", "value"])
    got = topk_rows_per_key(proj, "user_id", order, 3).to_pandas()
    true = con.sql("""
        SELECT user_id, event_id, value, rank FROM (
          SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id
                     ORDER BY value DESC, event_id) AS rank
          FROM events) WHERE rank <= 3
    """).df()
    key = ["user_id", "rank"]
    got = got.sort_values(key).reset_index(drop=True)
    true = true.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[true.columns.tolist()], true, check_dtype=False)

    many = topk_rows_per_key(proj.repartition(16), "user_id", order, 3)
    got16 = (many.to_pandas().sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(got16[true.columns.tolist()], got,
                                  check_dtype=False)


def test_topk_rows_per_key_validates_direction(events_ds):
    from bloomjoin_ray.pipelines.aggregate import topk_rows_per_key

    with pytest.raises(ValueError, match="ascending/"):
        topk_rows_per_key(events_ds, "user_id", [("value", "desc")], 3)


def test_rank_all_rows_per_key(events_ds, con):
    """k=None == the plain row_number() window over every row."""
    from bloomjoin_ray.pipelines.aggregate import topk_rows_per_key

    got = topk_rows_per_key(
        events_ds.select_columns(["user_id", "event_id", "ts"]),
        "user_id", [("ts", "ascending"), ("event_id", "ascending")],
        None).to_pandas()
    true = con.sql("""
        SELECT user_id, event_id, ts,
               row_number() OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS rank
        FROM events
    """).df()
    key = ["user_id", "rank"]
    got = got.sort_values(key).reset_index(drop=True)
    true = true.sort_values(key).reset_index(drop=True)
    assert len(got) == len(true) == events_ds.count()
    pd.testing.assert_frame_equal(
        got[true.columns.tolist()], true, check_dtype=False)


def test_normalize_per_key_matches_sql(events_ds, con):
    """normalize_per_key == SQL min-max window scaling, bit-exact
    (exact min/max + one subtraction + one division)."""
    from bloomjoin_ray.pipelines.aggregate import normalize_per_key

    got = normalize_per_key(
        events_ds.select_columns(["user_id", "event_id", "value"]),
        "user_id", "value").to_pandas()
    true = con.sql("""
        SELECT user_id, event_id, value,
               CASE WHEN mx = mn THEN 0.0
                    ELSE (value - mn) / (mx - mn) END AS value_norm
        FROM (SELECT user_id, event_id, value,
                     min(value) OVER (PARTITION BY user_id) AS mn,
                     max(value) OVER (PARTITION BY user_id) AS mx
              FROM events)
    """).df()
    key = ["user_id", "event_id"]
    got = got.sort_values(key).reset_index(drop=True)
    true = true.sort_values(key).reset_index(drop=True)
    assert (got["value_norm"] == true["value_norm"]).all()   # bit-exact
    pd.testing.assert_frame_equal(got[true.columns.tolist()], true,
                                  check_dtype=False)


def test_normalize_per_key_constant_key(ray_session):
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import normalize_per_key

    t = pa.table({"g": ["a", "a", "b"], "v": [5.0, 5.0, 1.0]})
    out = (normalize_per_key(rd.from_arrow(t), "g", "v")
           .to_pandas().sort_values(["g", "v"]).reset_index(drop=True))
    assert out["v_norm"].tolist() == [0.0, 0.0, 0.0]


def test_grouped_distinct_exact_matches_sql(events_ds, con):
    from bloomjoin_ray.pipelines.aggregate import grouped_distinct_exact

    got = (grouped_distinct_exact(events_ds, "user_id", "event_type")
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    true = con.sql("""
        SELECT user_id, count(DISTINCT event_type) AS n_distinct
        FROM events GROUP BY user_id ORDER BY user_id
    """).df()
    pd.testing.assert_frame_equal(got, true, check_dtype=False)

    # multi-column distinct + repartition invariance
    got2 = (grouped_distinct_exact(events_ds.repartition(16), "event_type",
                                   ["user_id", "value"])
            .to_pandas().sort_values("event_type").reset_index(drop=True))
    true2 = con.sql("""
        SELECT event_type, count(DISTINCT (user_id, value)) AS n_distinct
        FROM events GROUP BY event_type ORDER BY event_type
    """).df()
    pd.testing.assert_frame_equal(got2, true2, check_dtype=False)


def test_grouped_quantile_exact_matches_sql(ray_session):
    """disc mode is bit-exact vs quantile_disc (type-preserving gather);
    linear mode matches np.nanquantile; nulls ignored per key, all-null
    keys yield null; bucket unions re-segment correctly."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import grouped_quantile_exact

    rng = np.random.default_rng(17)
    n = 5000
    v = rng.random(n) * 100
    v[rng.random(n) < 0.12] = np.nan
    k = rng.integers(0, 33, n)
    k[:8] = 999                               # one all-null key
    v[:8] = np.nan
    t = pa.table({"k": pa.array(k, pa.int64()),
                  "v": pa.array(v, from_pandas=True)})
    con = duckdb.connect()
    con.register("t", t)

    got = (grouped_quantile_exact(rd.from_arrow(t).repartition(9), "k",
                                  "v", [0.0, 0.25, 0.5, 0.9, 1.0],
                                  interpolation="disc")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = con.sql("""
        SELECT k, quantile_disc(v, 0.00) AS q0,
               quantile_disc(v, 0.25) AS q25,
               quantile_disc(v, 0.50) AS q50,
               quantile_disc(v, 0.90) AS q90,
               quantile_disc(v, 1.00) AS q100
        FROM t GROUP BY k ORDER BY k
    """).df()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    assert np.isnan(got.loc[got.k == 999, "q50"]).all()

    lin = (grouped_quantile_exact(rd.from_arrow(t), "k", "v", [0.5])
           .to_pandas().sort_values("k").reset_index(drop=True))
    keys = sorted(set(k.tolist()))
    ref = [np.nanquantile(v[k == kk], 0.5) if not np.isnan(v[k == kk]).all()
           else np.nan for kk in keys]
    np.testing.assert_allclose(lin["q50"], ref, rtol=1e-12)

    with pytest.raises(ValueError, match="interpolation"):
        grouped_quantile_exact(rd.from_arrow(t), "k", "v", [0.5],
                               interpolation="nearest")
    with pytest.raises(ValueError, match="qs"):
        grouped_quantile_exact(rd.from_arrow(t), "k", "v", [])


def test_pivot_counts_matches_sql(ray_session):
    """pivot_counts == count(*)/sum(v) FILTER wide aggregates, incl.
    category auto-discovery, explicit unseen categories (0), null
    categories matching nothing, and prefixed column names."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import pivot_counts

    rng = np.random.default_rng(29)
    n = 4000
    cats = rng.choice(["x", "y", "z"], n).astype(object)
    cats[rng.random(n) < 0.05] = None
    t = pa.table({
        "k": pa.array(rng.integers(0, 21, n), pa.int64()),
        "c": pa.array(cats),
        "v": pa.array(rng.integers(0, 50, n), pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t)

    got = (pivot_counts(rd.from_arrow(t).repartition(6), "k", "c")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = con.sql("""
        SELECT k, count(*) FILTER (c='x') AS x,
               count(*) FILTER (c='y') AS y,
               count(*) FILTER (c='z') AS z
        FROM t GROUP BY k ORDER BY k
    """).df()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)

    # explicit categories incl. one unseen; integer value sums
    gs = (pivot_counts(rd.from_arrow(t), "k", "c", ["x", "missing"],
                       value_col="v", prefix="s_")
          .to_pandas().sort_values("k").reset_index(drop=True))
    ws = con.sql("""
        SELECT k, coalesce(sum(v) FILTER (c='x'), 0) AS s_x
        FROM t GROUP BY k ORDER BY k
    """).df()
    pd.testing.assert_series_equal(gs["s_x"], ws["s_x"],
                                   check_dtype=False)
    assert (gs["s_missing"] == 0).all()


def test_group_agg_null_keys():
    """pyarrow 16.1's hash grouper over-groups null-keyed rows (the
    rollup reduce hit it: identical (lvl, key, NULL) rows split into
    several output groups). group_agg must be exact; this also pins the
    upstream repro so a pyarrow upgrade that fixes it is visible."""
    import pyarrow as pa

    from bloomjoin_ray.pipelines.buckets import group_agg

    rows_a, rows_b, lvl = [], [], []
    for _r in range(16):
        for i in range(5):
            rows_a.append(f"type{i}"); rows_b.append(None); lvl.append(1)
        rows_a.append(None); rows_b.append(None); lvl.append(0)
    t = pa.table({"__lvl": pa.array(lvl, pa.int8()),
                  "a": pa.array(rows_a),
                  "b": pa.array(rows_b, pa.int64()),
                  "v": pa.array(np.arange(len(lvl)), pa.int64())})
    keys = ["__lvl", "a", "b"]
    true = t.to_pandas().groupby(keys, dropna=False)
    raw = t.group_by(keys).aggregate([("v", "sum")])
    # upstream bug repro: if this starts passing, pyarrow fixed it and
    # group_agg's slow path can be retired
    assert raw.num_rows > true.ngroups

    out = group_agg(t, keys, [("v", "sum"), ([], "count_all")])
    assert out.column_names == keys + ["v_sum", "count_all"]
    got = (out.to_pandas().sort_values(keys).reset_index(drop=True))
    want = (true.agg(v_sum=("v", "sum"), count_all=("v", "size"))
            .reset_index().sort_values(keys).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # distinct (specs=[]) and the all-null-column path
    d = group_agg(t, keys, [])
    assert d.num_rows == true.ngroups and d.column_names == keys
    assert d.column("b").null_count == d.num_rows  # b is all-null

    # null-free fast path unchanged
    nf = pa.table({"k": pa.array(["x", "y", "x"]),
                   "v": pa.array([1, 2, 3], pa.int64())})
    out2 = group_agg(nf, ["k"], [("v", "sum")])
    assert dict(zip(out2.column("k").to_pylist(),
                    out2.column("v_sum").to_pylist())) == {"x": 4, "y": 2}

    # min/max with null VALUES keep pyarrow semantics on both paths
    mv = pa.table({"k": pa.array(["x", None, "x", None]),
                   "v": pa.array([5, None, 2, None], pa.int64())})
    out3 = group_agg(mv, ["k"], [("v", "min"), ("v", "max")])
    m = {r["k"]: (r["v_min"], r["v_max"])
         for r in out3.to_pylist()}
    assert m == {"x": (2, 5), None: (None, None)}


def test_rollup_agg_matches_sql(ray_session):
    """rollup_agg == GROUP BY ROLLUP at every prefix level incl. grand
    total, with nulls in rolled-up keys, real-null key values grouped
    like SQL, and integer sums exact under any partitioning."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import rollup_agg

    rng = np.random.default_rng(41)
    n = 6000
    a = rng.choice(["p", "q", "r", None], n, p=[0.4, 0.3, 0.25, 0.05])
    b = rng.integers(0, 7, n)
    v = rng.integers(0, 1000, n)
    t = pa.table({"a": pa.array(a.tolist()),
                  "b": pa.array(b, pa.int64()),
                  "v": pa.array(v, pa.int64())})
    con = duckdb.connect()
    con.register("t", t)

    def norm(df):
        return (df.sort_index(axis=1)
                .sort_values(df.columns.sort_values().tolist())
                .reset_index(drop=True))

    got = norm(rollup_agg(rd.from_arrow(t).repartition(8), ["a", "b"],
                          {"v": "sv"}, count_col="n").to_pandas())
    want = norm(con.sql("""
        SELECT a, b, sum(v) AS sv, count(*) AS n
        FROM t GROUP BY ROLLUP (a, b)
    """).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # count-only, single key; partition count must not matter
    got1 = norm(rollup_agg(rd.from_arrow(t).repartition(3), ["b"],
                           count_col="n").to_pandas())
    want1 = norm(con.sql(
        "SELECT b, count(*) AS n FROM t GROUP BY ROLLUP (b)").df())
    pd.testing.assert_frame_equal(got1, want1, check_dtype=False)

    with pytest.raises(ValueError):
        rollup_agg(rd.from_arrow(t), [])
    with pytest.raises(ValueError):
        rollup_agg(rd.from_arrow(t), ["a"], None, count_col=None)


def test_grouped_moments(ray_session):
    """grouped_moments: int inputs → BIT-exact vs the pinned SQL
    expression tree over exact sums; float inputs → numpy parity;
    x-only mode; n==1 and zero-variance groups yield null."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import grouped_moments

    rng = np.random.default_rng(11)
    n = 4000
    t = pa.table({"k": pa.array(rng.choice(["a", "b", "c"], n).tolist()),
                  "x": pa.array(rng.integers(0, 50, n), pa.int64()),
                  "y": pa.array(rng.integers(0, 11, n), pa.int64())})
    con = duckdb.connect()
    con.register("t", t)
    got = (grouped_moments(rd.from_arrow(t).repartition(7), ["k"], "x", "y")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = con.sql("""
        WITH s AS (SELECT k, count(*) AS n, sum(x) AS sx, sum(x*x) AS sxx,
                          sum(y) AS sy, sum(y*y) AS syy, sum(x*y) AS sxy
                   FROM t GROUP BY k)
        SELECT k, n,
               CAST(sx AS DOUBLE)/n AS mean_x,
               (CAST(sxx AS DOUBLE) - (CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))/n)/(n-1) AS var_x,
               sqrt((CAST(sxx AS DOUBLE) - (CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))/n)/(n-1)) AS std_x,
               CAST(sy AS DOUBLE)/n AS mean_y,
               (CAST(syy AS DOUBLE) - (CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))/n)/(n-1) AS var_y,
               sqrt((CAST(syy AS DOUBLE) - (CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))/n)/(n-1)) AS std_y,
               (CAST(sxy AS DOUBLE) - (CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))/n)/(n-1) AS covar,
               ((CAST(sxy AS DOUBLE) - (CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))/n)/(n-1))
               / (sqrt((CAST(sxx AS DOUBLE) - (CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))/n)/(n-1))
                  * sqrt((CAST(syy AS DOUBLE) - (CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))/n)/(n-1))) AS corr
        FROM s ORDER BY k
    """).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)

    # float inputs: numpy parity (order caveat → tolerance)
    tf = pa.table({"k": pa.array(["a"] * 500 + ["b"] * 500),
                   "x": pa.array(rng.normal(0, 3, 1000)),
                   "y": pa.array(rng.normal(5, 2, 1000))})
    gf = (grouped_moments(rd.from_arrow(tf).repartition(4), ["k"], "x", "y")
          .to_pandas().set_index("k"))
    df = tf.to_pandas()
    for k, grp in df.groupby("k"):
        assert gf.loc[k, "mean_x"] == pytest.approx(grp.x.mean())
        assert gf.loc[k, "std_y"] == pytest.approx(grp.y.std())
        assert gf.loc[k, "corr"] == pytest.approx(grp.x.corr(grp.y))

    # x-only mode, n==1 group, zero-variance group
    t1 = pa.table({"k": pa.array(["solo", "flat", "flat"]),
                   "x": pa.array([7, 4, 4], pa.int64())})
    g1 = (grouped_moments(rd.from_arrow(t1), ["k"], "x")
          .to_pandas().set_index("k"))
    assert "covar" not in g1.columns
    assert g1.loc["solo", "n"] == 1 and np.isnan(g1.loc["solo", "var_x"])
    assert g1.loc["flat", "var_x"] == 0.0

    with pytest.raises(ValueError):
        grouped_moments(rd.from_arrow(t1), ["k"], "x", "x")


def test_cube_and_grouping_sets_match_sql(ray_session):
    """cube_agg == GROUP BY CUBE and grouping_sets_agg == GROUP BY
    GROUPING SETS (incl. a DUPLICATED set producing duplicate rows and
    real-null key values), integer sums exact under any partitioning."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import (cube_agg,
                                                   grouping_sets_agg)

    rng = np.random.default_rng(43)
    n = 5000
    t = pa.table({
        "a": pa.array(rng.choice(["p", "q", None], n,
                                 p=[0.5, 0.45, 0.05]).tolist()),
        "b": pa.array(rng.integers(0, 5, n), pa.int64()),
        "v": pa.array(rng.integers(0, 1000, n), pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t)

    def norm(df):
        return (df.sort_index(axis=1)
                .sort_values(df.columns.sort_values().tolist())
                .reset_index(drop=True))

    got = norm(cube_agg(rd.from_arrow(t).repartition(8), ["a", "b"],
                        {"v": "sv"}, count_col="n").to_pandas())
    want = norm(con.sql("""
        SELECT a, b, sum(v) AS sv, count(*) AS n
        FROM t GROUP BY CUBE (a, b)
    """).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # explicit sets, one duplicated — SQL emits the duplicate rows too
    got2 = norm(grouping_sets_agg(
        rd.from_arrow(t).repartition(5), ["a", "b"],
        [["a"], ["b"], ["b"]], {"v": "sv"}, count_col="n").to_pandas())
    want2 = norm(con.sql("""
        SELECT a, b, sum(v) AS sv, count(*) AS n
        FROM t GROUP BY GROUPING SETS ((a), (b), (b))
    """).df())
    pd.testing.assert_frame_equal(got2, want2, check_dtype=False)

    with pytest.raises(ValueError):
        grouping_sets_agg(rd.from_arrow(t), ["a"], [])
    with pytest.raises(ValueError):
        grouping_sets_agg(rd.from_arrow(t), ["a"], [["a", "a"]])
    with pytest.raises(ValueError):
        grouping_sets_agg(rd.from_arrow(t), ["a"], [["zz"]])
    with pytest.raises(ValueError):
        cube_agg(rd.from_arrow(t), list("abcdefg"))


def test_collect_per_key_matches_sql(ray_session):
    """array_agg / string_agg (ORDER BY) vs DuckDB, incl. null values,
    an all-null key, and multi-block invariance."""
    import duckdb
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import collect_per_key

    rng = np.random.default_rng(11)
    n = 4000
    keys = rng.integers(0, 150, n)
    seq = rng.permutation(n)                      # unique total order
    vals = rng.choice(["a", "b", "c", None], n,
                      p=[0.4, 0.3, 0.25, 0.05]).tolist()
    # key 149: all-null values → string_agg must yield NULL
    vals = [None if k == 149 else v for k, v in zip(keys, vals)]
    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "o": pa.array(seq, pa.int64()),
                  "v": pa.array(vals, pa.string())})
    con = duckdb.connect()
    con.register("t", t)
    ds = rd.from_arrow(t).repartition(7)

    # string_agg mode (+ count_col)
    got = (collect_per_key(ds, "k", "v", ["o"], sep=",",
                           out_col="s", count_col="n")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = con.sql("""
        SELECT k, string_agg(v, ',' ORDER BY o) AS s, count(*) AS n
        FROM t GROUP BY k ORDER BY k
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.loc[got.k == 149, "s"].isna().all()

    # array_agg mode: nulls kept in place, order exact
    gl = (collect_per_key(ds, "k", "v", ["o"], out_col="xs")
          .to_pandas().sort_values("k").reset_index(drop=True))
    wl = con.sql("""
        SELECT k, list(v ORDER BY o) AS xs FROM t GROUP BY k ORDER BY k
    """).df()
    assert list(gl.k) == list(wl.k)
    for a, b in zip(gl["xs"], wl["xs"]):
        assert [x if x is not None else None for x in a.tolist()] == \
            [x if x == x else None for x in list(b)]

    # descending order + non-string list payload
    t2 = pa.table({"k": pa.array(keys % 9, pa.int64()),
                   "o": pa.array(seq, pa.int64()),
                   "v": pa.array(rng.integers(0, 50, n), pa.int64())})
    con.register("t2", t2)
    g2 = (collect_per_key(rd.from_arrow(t2).repartition(4), "k", "v",
                          [("o", "descending")], out_col="xs")
          .to_pandas().sort_values("k").reset_index(drop=True))
    w2 = con.sql("""
        SELECT k, list(v ORDER BY o DESC) AS xs FROM t2 GROUP BY k
        ORDER BY k
    """).df()
    for a, b in zip(g2["xs"], w2["xs"]):
        assert a.tolist() == list(b)

    with pytest.raises((TypeError, Exception)):
        collect_per_key(rd.from_arrow(t2), "k", "v", ["o"],
                        sep=",").to_pandas()  # int col in sep mode


def test_histogram_matches_sql(ray_session):
    """Equi-width histogram vs DuckDB (same IEEE bucket expression),
    incl. out-of-range values, nulls, NaN, the hi-inclusive last bin,
    auto-range vs numpy, and the degenerate lo == hi case."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import histogram

    rng = np.random.default_rng(23)
    v = rng.normal(50.0, 20.0, 5000)
    v[:50] = np.nan
    vals = [None] * 30 + [float(x) for x in v]
    vals.append(80.0)                            # exactly hi → last bin
    t = pa.table({"v": pa.array(vals, pa.float64())})
    lo, hi, bins = 10.0, 80.0, 7

    got = (histogram(rd.from_arrow(t).repartition(6), "v", bins,
                     lo=lo, hi=hi)
           .to_pandas().sort_values("bin").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql(f"""
        SELECT CAST(least(floor((v - {lo}) / (({hi} - {lo}) / {bins})),
                          {bins} - 1) AS BIGINT) AS bin,
               count(*) AS n
        FROM t WHERE v >= {lo} AND v <= {hi}
        GROUP BY 1 ORDER BY 1
    """).df()
    pd.testing.assert_frame_equal(got[["bin", "n"]], want,
                                  check_dtype=False)
    w = (hi - lo) / bins
    assert np.allclose(got["bin_start"], lo + got["bin"] * w)
    assert np.allclose(got["bin_end"], lo + (got["bin"] + 1) * w)

    # auto-range == numpy histogram over the full finite data
    finite = v[np.isfinite(v)]
    got2 = (histogram(rd.from_arrow(pa.table({"v": finite})), "v", 10)
            .to_pandas().sort_values("bin"))
    np_counts, _ = np.histogram(finite, bins=10,
                                range=(finite.min(), finite.max()))
    nz = np.nonzero(np_counts)[0]
    assert got2["bin"].tolist() == nz.tolist()
    assert got2["n"].tolist() == np_counts[nz].tolist()

    # degenerate lo == hi: everything in bin 0
    same = pa.table({"v": pa.array([3.0] * 11)})
    got3 = histogram(rd.from_arrow(same), "v", 5).to_pandas()
    assert got3["bin"].tolist() == [0] and got3["n"].tolist() == [11]

    with pytest.raises(ValueError):
        histogram(rd.from_arrow(t), "v", 0)
    with pytest.raises(ValueError):
        histogram(rd.from_arrow(t), "v", 4, lo=5.0, hi=1.0)


def test_mode_per_key_matches_sql(ray_session):
    """Per-key mode vs a DuckDB row_number replica: frequency ties
    break to the smallest value, nulls don't vote, all-null keys drop."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import mode_per_key

    rng = np.random.default_rng(31)
    n = 4000
    k = np.concatenate([rng.integers(0, 70, n - 2), [888, 888]])
    v = [None if rng.random() < 0.2 else f"t{int(x)}"
         for x in rng.integers(0, 6, n)]
    v[-2:] = [None, None]                       # key 888: all null
    t = pa.table({"k": pa.array(k, pa.int64()),
                  "v": pa.array(v, pa.string())})

    got = (mode_per_key(rd.from_arrow(t).repartition(5), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql("""
        WITH c AS (SELECT k, v, count(*) AS n FROM t
                   WHERE v IS NOT NULL GROUP BY k, v),
             r AS (SELECT *, row_number() OVER
                       (PARTITION BY k ORDER BY n DESC, v) AS rn FROM c)
        SELECT k, v, n FROM r WHERE rn = 1 ORDER BY k
    """).df()
    assert 888 not in got["k"].values
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)


def test_describe_matches_sql(ray_session):
    """describe() vs DuckDB evaluating the identical expression tree
    over exact sums: int columns bit-exact, nulls counted, float column
    close, n==1 and all-null edge behavior."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import describe

    rng = np.random.default_rng(41)
    n = 5000
    t = pa.table({
        "a": pa.array([None if rng.random() < 0.1 else int(x)
                       for x in rng.integers(-1000, 1000, n)], pa.int64()),
        "b": pa.array(rng.normal(5.0, 2.0, n), pa.float64()),
    })
    got = (describe(rd.from_arrow(t).repartition(7), ["a", "b"])
           .to_pandas().set_index("col"))
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql("""
        SELECT 'a' AS col, count(a) AS n, count(*) - count(a) AS nulls,
               CAST(sum(a) AS DOUBLE) / count(a) AS mean,
               sqrt((CAST(sum(a*a) AS DOUBLE)
                     - CAST(sum(a) AS DOUBLE) * CAST(sum(a) AS DOUBLE)
                       / count(a)) / (count(a) - 1)) AS std,
               CAST(min(a) AS DOUBLE) AS min, CAST(max(a) AS DOUBLE) AS max
        FROM t
        UNION ALL
        SELECT 'b', count(b), count(*) - count(b),
               sum(b) / count(b),
               sqrt((sum(b*b) - sum(b) * sum(b) / count(b))
                    / (count(b) - 1)),
               min(b), max(b)
        FROM t
    """).df().set_index("col")
    # int column: bit-exact
    for f in ["n", "nulls", "mean", "std", "min", "max"]:
        assert got.loc["a", f] == want.loc["a", f], (f, got.loc["a", f])
    # float column: near-exact (distributed sum order)
    assert got.loc["b", "n"] == want.loc["b", "n"]
    assert abs(got.loc["b", "mean"] - want.loc["b", "mean"]) < 1e-9
    assert abs(got.loc["b", "std"] - want.loc["b", "std"]) < 1e-9
    assert got.loc["b", "min"] == want.loc["b", "min"]
    assert got.loc["b", "max"] == want.loc["b", "max"]

    # n==1 → null std; all-null → null everything
    t2 = pa.table({"x": pa.array([7], pa.int64()),
                   "y": pa.array([None], pa.float64())})
    d2 = describe(rd.from_arrow(t2), ["x", "y"]).to_pandas().set_index("col")
    assert d2.loc["x", "mean"] == 7.0 and pd.isna(d2.loc["x", "std"])
    assert d2.loc["y", "n"] == 0 and pd.isna(d2.loc["y", "mean"])


def test_dataset_checksum_invariance_and_sensitivity(ray_session):
    """Checksum invariant under partitioning/order; sensitive to a
    single changed value and to duplicate-for-distinct swaps (the XOR
    blind spot the SUM lane covers)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import dataset_checksum

    rng = np.random.default_rng(5)
    n = 3000
    t = pa.table({"a": pa.array(rng.integers(0, 10**6, n), pa.int64()),
                  "b": pa.array([f"s{i % 97}" for i in range(n)])})
    c1 = dataset_checksum(rd.from_arrow(t).repartition(7))
    perm = rng.permutation(n)
    c2 = dataset_checksum(
        rd.from_arrow(t.take(pa.array(perm))).repartition(2))
    assert c1 == c2 and c1["n"] == n

    # single-value edit changes the checksum
    t3 = t.set_column(0, "a", pa.array(
        np.concatenate([[int(t.column("a")[0].as_py()) + 1],
                        np.asarray(t.column("a"))[1:]]), pa.int64()))
    assert dataset_checksum(rd.from_arrow(t3)) != c1

    # swap a distinct row for a second copy of another: XOR of the pair
    # changes anyway, but craft the classic blind spot — replace rows
    # {r0, r1} by {r0, r0}: XOR lane sees x0^x1 -> 0, SUM lane differs
    t4rows = t.to_pylist()
    t4rows[1] = dict(t4rows[0])
    t4 = pa.Table.from_pylist(t4rows, schema=t.schema)
    c4 = dataset_checksum(rd.from_arrow(t4))
    assert c4 != c1 and c4["n"] == c1["n"]

    # column-subset checksum matches regardless of other columns
    c5 = dataset_checksum(rd.from_arrow(t), cols="a")
    c6 = dataset_checksum(rd.from_arrow(t.drop_columns(["b"])))
    assert c5 == c6


def test_grouped_jaccard_exact_matches_sql(ray_session):
    """Per-key exact set overlap vs a DuckDB DISTINCT-set replica:
    duplicates collapse, nulls excluded, one-sided keys report 0,
    partition invariance."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import grouped_jaccard_exact

    rng = np.random.default_rng(47)

    def mk(n, key_hi, only_key=None):
        k = rng.integers(0, key_hi, n)
        if only_key is not None:
            k[:10] = only_key
        v = [None if rng.random() < 0.05 else f"v{int(x)}"
             for x in rng.integers(0, 30, n)]
        return pa.table({"k": pa.array(k, pa.int64()),
                         "v": pa.array(v, pa.string())})

    A = mk(3000, 40, only_key=777)     # key 777 exists only in A
    B = mk(2500, 40)
    got = (grouped_jaccard_exact(rd.from_arrow(A).repartition(5),
                                 rd.from_arrow(B).repartition(3), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    con = duckdb.connect()
    con.register("A", A)
    con.register("B", B)
    want = con.sql("""
        WITH da AS (SELECT DISTINCT k, v FROM A WHERE v IS NOT NULL),
             db AS (SELECT DISTINCT k, v FROM B WHERE v IS NOT NULL),
             u AS (SELECT k, v, max(sa) AS sa, max(sb) AS sb FROM (
                     SELECT k, v, 1 AS sa, 0 AS sb FROM da
                     UNION ALL
                     SELECT k, v, 0, 1 FROM db) GROUP BY k, v)
        SELECT k, CAST(sum(sa) AS BIGINT) AS n_a,
               CAST(sum(sb) AS BIGINT) AS n_b,
               CAST(sum(sa * sb) AS BIGINT) AS n_inter,
               CAST(count(*) AS BIGINT) AS n_union,
               CAST(sum(sa * sb) AS DOUBLE) / count(*) AS jaccard
        FROM u GROUP BY k ORDER BY k
    """).df()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    row777 = got[got["k"] == 777].iloc[0]
    assert row777["n_b"] == 0 and row777["n_inter"] == 0

    got2 = (grouped_jaccard_exact(rd.from_arrow(A).repartition(2),
                                  rd.from_arrow(B), "k", "v")
            .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got2[want.columns.tolist()], want,
                                  check_dtype=False)


def test_entropy_per_key_matches_numpy(ray_session):
    """Per-key Shannon entropy vs a numpy/pandas replica: uniform keys
    hit log2(k), single-category keys are exactly 0, nulls don't vote,
    partition invariance."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import entropy_per_key

    rng = np.random.default_rng(53)
    n = 5000
    k = rng.integers(0, 50, n)
    v = [None if rng.random() < 0.08 else f"c{int(x)}"
         for x in rng.integers(0, 8, n)]
    # key 999: perfectly uniform over 4 categories -> exactly 2 bits
    k = np.concatenate([k, np.full(8, 999)])
    v += ["a", "b", "c", "d", "a", "b", "c", "d"]
    # key 998: one category -> exactly 0
    k = np.concatenate([k, np.full(3, 998)])
    v += ["only", "only", "only"]
    t = pa.table({"k": pa.array(k, pa.int64()),
                  "v": pa.array(v, pa.string())})

    got = (entropy_per_key(rd.from_arrow(t).repartition(6), "k", "v")
           .to_pandas().set_index("k").sort_index())
    df = t.to_pandas().dropna(subset=["v"])

    def ent(s):
        p = s.value_counts(normalize=True).to_numpy()
        return float(-(p * np.log2(p)).sum())

    want = df.groupby("k")["v"].apply(ent).sort_index()
    assert got.index.tolist() == want.index.tolist()
    assert np.allclose(got["entropy"], want.to_numpy(), atol=1e-12)
    assert got.loc[999, "entropy"] == 2.0
    assert got.loc[998, "entropy"] == 0.0

    got2 = (entropy_per_key(rd.from_arrow(t).repartition(2), "k", "v")
            .to_pandas().set_index("k").sort_index())
    assert np.allclose(got["entropy"], got2["entropy"], atol=0)

    with pytest.raises(ValueError):
        entropy_per_key(rd.from_arrow(t), "k", "v", base=1.0)


def test_approx_percentile_rank_bounds(ray_session):
    """Percentile-rank annotation: within the KLL rank-error bound of
    exact ranks, monotone in value, nulls rank null, partition
    invariance (deterministic sketch)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import approx_percentile_rank

    rng = np.random.default_rng(59)
    n = 20000
    v = rng.normal(100.0, 25.0, n)
    vals = [None if i % 211 == 0 else float(x) for i, x in enumerate(v)]
    t = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                  "v": pa.array(vals, pa.float64())})

    got = (approx_percentile_rank(rd.from_arrow(t).repartition(6), "v",
                                  k=400, concurrency=2)
           .to_pandas().sort_values("id").reset_index(drop=True))
    df = got.dropna(subset=["v"]).copy()
    exact = df["v"].rank(method="min").to_numpy() / len(df)
    err = np.abs(df["v_pct_rank"].to_numpy() - exact)
    assert err.max() < 0.03, err.max()          # KLL k=400 rank bound
    assert got.loc[got["v"].isna(), "v_pct_rank"].isna().all()
    # monotone: sorting by value sorts by rank
    s = df.sort_values("v")["v_pct_rank"].to_numpy()
    assert (np.diff(s) >= 0).all()

    # KLL compaction depends on merge order, so repartitioning shifts
    # ranks only within the error bound (not bitwise)
    got2 = (approx_percentile_rank(rd.from_arrow(t).repartition(2), "v",
                                   k=400, concurrency=2)
            .to_pandas().sort_values("id").reset_index(drop=True))
    d = np.abs(got["v_pct_rank"].to_numpy() - got2["v_pct_rank"].to_numpy())
    assert np.nanmax(d) < 0.03


def test_describe_rejects_non_numeric(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import describe

    t = pa.table({"a": pa.array([1, 2], pa.int64()),
                  "s": pa.array(["x", "y"])})
    with pytest.raises(TypeError, match="not numeric"):
        describe(rd.from_arrow(t), ["a", "s"])


def test_collect_per_key_max_list_len_guard(ray_session):
    """Verdict r4 #8: one pathological key holding ~all rows either
    raises loudly (naming the key) or truncates with a flag — and
    count_col still reports the TRUE count."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import collect_per_key

    # key 7 holds 5,000 of 5,030 rows; 10 small keys hold 3 each
    n_hot = 5000
    ks = np.concatenate([np.full(n_hot, 100), np.repeat(np.arange(10), 3)])
    os_ = np.concatenate([np.arange(n_hot), np.tile(np.arange(3), 10)])
    vs = np.arange(len(ks))
    t = pa.table({"k": pa.array(ks, pa.int64()),
                  "o": pa.array(os_, pa.int64()),
                  "v": pa.array(vs, pa.int64())})
    ds = rd.from_arrow(t).repartition(8)

    with pytest.raises(Exception, match="max_list_len"):
        collect_per_key(ds, "k", "v", ["o"], max_list_len=100).to_pandas()

    got = (collect_per_key(ds, "k", "v", ["o"], out_col="xs",
                           count_col="n", max_list_len=100,
                           on_overflow="truncate")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert len(got) == 11
    hot = got[got["k"] == 100].iloc[0]
    assert hot["n"] == n_hot                      # true count survives
    assert len(hot["xs"]) == 100                  # list bounded
    assert bool(hot["xs_truncated"]) is True
    # order_by order: first 100 of the hot key's values by o
    want_hot = vs[:n_hot][np.argsort(os_[:n_hot], kind="stable")][:100]
    np.testing.assert_array_equal(np.asarray(list(hot["xs"])), want_hot)
    cold = got[got["k"] != 100]
    assert (~cold["xs_truncated"].astype(bool)).all()
    assert (cold["n"] == 3).all()
    assert all(len(x) == 3 for x in cold["xs"])

    # sep path truncates identically (string build never sees the tail)
    ts = pa.table({"k": pa.array(ks, pa.int64()),
                   "o": pa.array(os_, pa.int64()),
                   "v": pa.array([str(v) for v in vs])})
    gs = (collect_per_key(rd.from_arrow(ts).repartition(8), "k", "v",
                          ["o"], sep=",", out_col="s", count_col="n",
                          max_list_len=5, on_overflow="truncate")
          .to_pandas().sort_values("k").reset_index(drop=True))
    hot_s = gs[gs["k"] == 100].iloc[0]
    assert hot_s["s"] == ",".join(str(v) for v in want_hot[:5])
    assert hot_s["n"] == n_hot and bool(hot_s["s_truncated"]) is True

    with pytest.raises(ValueError, match="on_overflow"):
        collect_per_key(ds, "k", "v", ["o"], max_list_len=5,
                        on_overflow="drop")
    with pytest.raises(ValueError, match="max_list_len"):
        collect_per_key(ds, "k", "v", ["o"], max_list_len=0)
