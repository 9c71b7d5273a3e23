"""DDSketch: relative-error quantile bound (alpha, uniform across the
range incl. tails), exact/associative merge (bit-identical stores),
collapse bound, serde roundtrip, and the approx_quantiles pipeline."""

import numpy as np
import pytest

from bloomjoin_ray.state.ddsketch import DDSketch


def _rel_err(est, true):
    true = np.asarray(true, dtype=np.float64)
    return np.abs(est - true) / np.maximum(np.abs(true), 1e-300)


def test_relative_error_bound_lognormal():
    """Values spanning ~6 decades: every quantile estimate within alpha
    of the exact empirical quantile (the guarantee rank-error sketches
    like KLL/t-digest do NOT give at this dynamic range)."""
    rng = np.random.default_rng(11)
    x = np.exp(rng.normal(0, 3, size=200_000))
    s = DDSketch(alpha=0.01)
    s.update_batch(x)
    qs = np.asarray([0.0, 0.01, 0.1, 0.5, 0.9, 0.99, 0.999, 1.0])
    xs = np.sort(x)
    true = xs[np.floor(qs * (len(x) - 1)).astype(int)]
    est = s.quantile(qs)
    assert (_rel_err(est, true) <= 0.01 + 1e-9).all()
    assert not s.collapsed


def test_signed_and_zero_values():
    x = np.concatenate([-np.logspace(-3, 4, 500), np.zeros(100),
                        np.logspace(-3, 4, 500)])
    rng = np.random.default_rng(4)
    rng.shuffle(x)
    s = DDSketch(alpha=0.02)
    s.update_batch(x)
    assert s.total == len(x)
    qs = np.asarray([0.001, 0.25, 0.5, 0.75, 0.999])
    xs = np.sort(x)
    true = xs[np.floor(qs * (len(x) - 1)).astype(int)]
    est = s.quantile(qs)
    nz = true != 0
    assert (_rel_err(est[nz], true[nz]) <= 0.02 + 1e-9).all()
    assert est[~nz].max(initial=0.0) == 0.0  # median is an exact zero


def test_merge_bit_identical_and_associative():
    """Uncollapsed merge == single pass EXACTLY, regardless of split or
    order — the property the salted grouped aggregation relies on."""
    rng = np.random.default_rng(7)
    x = np.exp(rng.normal(0, 2, size=50_000)) * rng.choice([-1, 1, 1],
                                                           size=50_000)
    one = DDSketch(alpha=0.01)
    one.update_batch(x)
    for n_parts, order in ((4, slice(None)), (13, slice(None, None, -1))):
        parts = []
        for chunk in np.array_split(x, n_parts):
            p = DDSketch(alpha=0.01)
            p.update_batch(chunk)
            parts.append(p)
        acc = None
        for p in list(parts)[order]:
            acc = p if acc is None else acc.merge(p)
        assert acc.pos_off == one.pos_off and acc.neg_off == one.neg_off
        assert np.array_equal(acc.pos, one.pos)
        assert np.array_equal(acc.neg, one.neg)
        assert acc.zero == one.zero


def test_collapse_bounds_memory_keeps_upper_quantiles():
    rng = np.random.default_rng(3)
    # ln x ~ N(0,2) needs ~900 buckets at alpha=0.01; cap at 512 so the
    # lowest ~40% of the range folds into the spill bucket
    x = np.exp(rng.normal(0, 2, size=100_000))
    s = DDSketch(alpha=0.01, max_buckets=512)
    for chunk in np.array_split(x, 10):
        s.update_batch(chunk)
    assert len(s.pos) <= 512 and s.collapsed
    # guarantee preserved for all quantiles above the collapsed mass
    spill_top = 2.0 / (s.gamma + 1.0) * s.gamma ** s.pos_off
    assert (x < spill_top).mean() < 0.45
    qs = np.asarray([0.5, 0.9, 0.99, 0.999])
    xs = np.sort(x)
    true = xs[np.floor(qs * (len(x) - 1)).astype(int)]
    assert (_rel_err(s.quantile(qs), true) <= 0.01 + 1e-9).all()


def test_serde_roundtrip():
    from bloomjoin_ray.state.base import sketch_from_bytes

    rng = np.random.default_rng(9)
    x = rng.normal(0, 10, size=10_000)
    s = DDSketch(alpha=0.005)
    s.update_batch(x)
    r = sketch_from_bytes(s.to_bytes())
    assert isinstance(r, DDSketch)
    qs = np.linspace(0, 1, 21)
    assert np.array_equal(r.quantile(qs), s.quantile(qs))


def test_validation():
    with pytest.raises(ValueError):
        DDSketch(alpha=0.0)
    with pytest.raises(ValueError):
        DDSketch(alpha=0.01, max_buckets=2)
    with pytest.raises(ValueError, match="different alpha"):
        DDSketch(alpha=0.01).merge(DDSketch(alpha=0.02))
    with pytest.raises(ValueError, match="quantiles"):
        DDSketch().quantile([1.5])
    assert np.isnan(DDSketch().quantile([0.5])).all()


def test_approx_quantiles_ddsketch_pipeline(ray_session):
    """Global + grouped pipeline paths over real parquet."""
    import duckdb
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import approx_quantiles

    ds = rd.read_parquet("/root/testdata/sf0.01/lineitem.parquet")
    con = duckdb.connect()
    con.sql("CREATE VIEW lineitem AS SELECT * FROM "
            "'/root/testdata/sf0.01/lineitem.parquet'")
    qs = [0.5, 0.95, 0.99]
    true = con.sql(
        "SELECT quantile_disc(l_extendedprice, [0.5, 0.95, 0.99]) "
        "FROM lineitem").fetchone()[0]
    est = approx_quantiles(ds, "l_extendedprice", qs, method="ddsketch",
                           alpha=0.01)
    assert (_rel_err(est, np.asarray(true)) <= 0.011).all()

    got = approx_quantiles(ds, "l_extendedprice", [0.9], key="l_returnflag",
                           method="ddsketch", alpha=0.01).to_pandas()
    tg = con.sql(
        "SELECT l_returnflag, quantile_disc(l_extendedprice, 0.9) q90 "
        "FROM lineitem GROUP BY 1").df()
    m = got.merge(tg, on="l_returnflag")
    assert len(m) == len(tg) >= 1
    assert (_rel_err(m["q90_x"].to_numpy(), m["q90_y"].to_numpy())
            <= 0.011).all()
