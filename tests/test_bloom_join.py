"""bloom_join end-to-end: dplyr/duckdb-parity results, fpr-invariance,
metadata exposure, side overrides — reference tests/testthat/test-bloom_join.R
and test-edge-cases.R translated to the Ray pipeline."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tests.util import assert_same


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data

    return ray.data


def _ds(rd, df, parallelism=3):
    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(parallelism)


def oracle(sql, **frames):
    con = duckdb.connect()
    for name, df in frames.items():
        con.register(name, df)
    return con.sql(sql).df()


@pytest.fixture(scope="module")
def sparse_xy():
    """The bloomjoin README shape: big x, small y, low overlap."""
    rng = np.random.default_rng(7)
    x = pd.DataFrame({"id": rng.integers(0, 10_000, size=6000),
                      "value_x": rng.normal(size=6000)})
    y = pd.DataFrame({"id": rng.integers(0, 500, size=2000),
                      "value_y": rng.normal(size=2000)})
    return x, y


def test_inner_matches_oracle_and_uses_filter(rd, sparse_xy):
    from bloomjoin_ray.pipelines.join import bloom_join

    x, y = sparse_xy
    ds, report = bloom_join(_ds(rd, x), _ds(rd, y), "id", "inner")
    assert_same(ds, oracle(
        "SELECT x.*, y.value_y FROM x JOIN y USING (id)", x=x, y=y))
    report.finalize()
    assert report.bloom_filter_used
    assert report.chosen_prefilter_side == "x"
    assert report.filtered_rows_x > 0
    assert report.reduction_ratio > 0.5  # favorable case (reference guard)
    assert report.retained_rows + report.filtered_rows_x == len(x)
    # free filter feedback: fill ratio + Swamidass–Baldi distinct estimate
    assert 0.0 < report.extra["bloom_fill_ratio"] < 1.0
    n_build = y["id"].nunique()
    assert abs(report.extra["bloom_distinct_estimate"] - n_build) \
        <= max(0.05 * n_build, 2)


@pytest.mark.parametrize("fpr", [0.0001, 0.01, 0.5])
def test_result_invariant_to_fpr(rd, sparse_xy, fpr):
    from bloomjoin_ray.pipelines.join import bloom_join

    x, y = sparse_xy
    ds, _ = bloom_join(_ds(rd, x), _ds(rd, y), "id", "inner", fpr=fpr)
    assert_same(ds, oracle(
        "SELECT x.*, y.value_y FROM x JOIN y USING (id)", x=x, y=y))


@pytest.mark.parametrize("how,sql", [
    ("left", "SELECT x.*, y.value_y FROM x LEFT JOIN y USING (id)"),
    ("semi", "SELECT x.* FROM x WHERE EXISTS (SELECT 1 FROM y WHERE y.id = x.id)"),
    ("anti", "SELECT x.* FROM x WHERE NOT EXISTS (SELECT 1 FROM y WHERE y.id = x.id)"),
    ("right", "SELECT coalesce(x.id, y.id) AS id, x.value_x, y.value_y FROM x RIGHT JOIN y USING (id)"),
    ("full", "SELECT coalesce(x.id, y.id) AS id, x.value_x, y.value_y FROM x FULL JOIN y USING (id)"),
])
def test_all_types_match_oracle(rd, sparse_xy, how, sql):
    from bloomjoin_ray.pipelines.join import bloom_join

    x, y = sparse_xy
    ds, report = bloom_join(_ds(rd, x), _ds(rd, y), "id", how)
    assert_same(ds, oracle(sql, x=x, y=y))
    if how == "full":
        assert not report.bloom_filter_used  # full joins never prefilter


def test_unsafe_side_overridden_with_warning(rd, sparse_xy):
    from bloomjoin_ray.pipelines.join import bloom_join

    x, y = sparse_xy
    with pytest.warns(UserWarning, match="incompatible with left"):
        ds, report = bloom_join(_ds(rd, x), _ds(rd, y), "id", "left",
                                prefilter_side="x")
    assert report.override_requested_side
    assert report.requested_prefilter_side == "x"
    # left join may only prune y; y here is small/dense so it may still skip,
    # but the chosen side must never be x
    assert report.chosen_prefilter_side != "x"
    assert_same(ds, oracle(
        "SELECT x.*, y.value_y FROM x LEFT JOIN y USING (id)", x=x, y=y))

    with pytest.warns(UserWarning, match="Full joins retain all rows"):
        _, report = bloom_join(_ds(rd, x), _ds(rd, y), "id", "full",
                               prefilter_side="x")
    assert not report.bloom_filter_used


def test_small_probe_skips_prefilter(rd):
    from bloomjoin_ray.pipelines.join import bloom_join

    x = pd.DataFrame({"id": np.arange(500), "vx": np.arange(500.0)})
    y = pd.DataFrame({"id": np.arange(100, 700), "vy": np.arange(600.0)})
    ds, report = bloom_join(_ds(rd, x), _ds(rd, y), "id", "inner")
    assert not report.bloom_filter_used  # probe_n < 1024
    assert report.reason == "prefilter skip heuristic triggered"
    assert_same(ds, oracle("SELECT x.*, y.vy FROM x JOIN y USING (id)", x=x, y=y))


def test_engine_fuse_matches_bloom_and_oracle(rd, sparse_xy):
    """engine='fuse' (the xor-filter engine filling the reference's
    reserved plugin slot, R/bloomjoin.R:261-264) produces the exact same
    join result as bloom, with a real prefilter in the report."""
    from bloomjoin_ray.pipelines.join import bloom_join

    x, y = sparse_xy
    want = oracle("SELECT x.*, y.value_y FROM x JOIN y USING (id)", x=x, y=y)
    ds, report = bloom_join(_ds(rd, x), _ds(rd, y), "id", "inner",
                            engine="fuse")
    assert_same(ds, want)
    report.finalize()
    assert report.bloom_filter_used
    assert report.extra.get("fuse_fp_bits") in (8, 16, 32)
    assert report.extra.get("fuse_n_keys") == y["id"].nunique()
    assert report.filtered_rows_x > 0          # the prefilter really pruned
    assert report.reduction_ratio > 0.5


def test_engine_fuse_oversized_build_falls_back_to_bloom(rd, sparse_xy):
    from bloomjoin_ray.pipelines.join import bloom_join

    x, y = sparse_xy
    # tiny budget: the 64-bit-per-key gather can't fit -> bloom can't
    # either -> plain join, but the REQUEST was still valid
    ds, report = bloom_join(_ds(rd, x), _ds(rd, y), "id", "inner",
                            engine="fuse", max_filter_bits=128)
    assert "fuse_fallback" in report.extra
    assert_same(ds, oracle(
        "SELECT x.*, y.value_y FROM x JOIN y USING (id)", x=x, y=y))


def test_invalid_args(rd, sparse_xy):
    from bloomjoin_ray.pipelines.join import bloom_join

    x, y = sparse_xy
    with pytest.raises(ValueError, match="Invalid join type"):
        bloom_join(_ds(rd, x), _ds(rd, y), "id", "sideways")
    with pytest.raises(ValueError, match="fpr"):
        bloom_join(_ds(rd, x), _ds(rd, y), "id", "inner", fpr=1.5)


def test_n_hint_respected(rd, sparse_xy):
    from bloomjoin_ray.pipelines.join import bloom_join

    x, y = sparse_xy
    _, report = bloom_join(_ds(rd, x), _ds(rd, y), "id", "inner",
                           n_hint={"y": 480})
    assert report.estimated_distinct_y == 480


def test_sparse_reduction_over_95_percent(rd):
    """Sparse join (reference test-memory-performance.R:301): 50k probe rows
    vs 50 build keys → reduction_ratio > 0.95."""
    from bloomjoin_ray.pipelines.join import bloom_join

    rng = np.random.default_rng(3)
    x = pd.DataFrame({"id": rng.integers(0, 100_000, size=50_000),
                      "vx": np.ones(50_000)})
    y = pd.DataFrame({"id": np.arange(50), "vy": np.ones(50)})
    ds, report = bloom_join(_ds(rd, x, 5), _ds(rd, y, 1), "id", "inner")
    ds.count()  # consume
    report.finalize()
    assert report.bloom_filter_used
    assert report.reduction_ratio > 0.95


def test_zero_key_overlap_empty_result(rd):
    from bloomjoin_ray.pipelines.join import bloom_join

    x = pd.DataFrame({"id": np.arange(5000), "vx": np.ones(5000)})
    y = pd.DataFrame({"id": np.arange(10_000, 10_100), "vy": np.ones(100)})
    ds, report = bloom_join(_ds(rd, x), _ds(rd, y), "id", "inner")
    assert ds.count() == 0
    report.finalize()
    assert report.bloom_filter_used
