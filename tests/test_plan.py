"""Planner parity — decision procedure constants and side rules pinned by
the reference (tests/testthat/test-edge-cases.R:8-44, R/bloomjoin.R:259-393)."""

import numpy as np
import pyarrow as pa
import pytest

from bloomjoin_ray.pipelines.plan import (
    OnSpec,
    choose_prefilter_target,
    estimate_distinct_count,
    estimate_selectivity,
    normalize_n_hint,
    plan_prefilter,
    resolve_on,
    should_skip_prefilter,
)


def test_resolve_on_natural():
    spec = resolve_on(["id", "a"], ["id", "b"], None)
    assert spec.x_cols == ["id"] and spec.y_cols == ["id"]
    with pytest.raises(ValueError, match="No common columns"):
        resolve_on(["a"], ["b"], None)


def test_resolve_on_forms():
    assert resolve_on(["k"], ["k"], "k").x_cols == ["k"]
    spec = resolve_on(["a", "b"], ["a", "b"], ["a", "b"])
    assert spec.x_cols == ["a", "b"]
    spec = resolve_on(["xk"], ["yk"], {"xk": "yk"})
    assert spec.x_cols == ["xk"] and spec.y_cols == ["yk"]
    # mixed named/unnamed (reference test-by-spec.R:11-45)
    spec = resolve_on(["a", "xk"], ["a", "yk"], ["a", ("xk", "yk")])
    assert spec.x_cols == ["a", "xk"] and spec.y_cols == ["a", "yk"]


def test_resolve_on_missing_column_named_in_error():
    with pytest.raises(ValueError, match="not found in x: nope"):
        resolve_on(["a"], ["a"], ["nope"])
    with pytest.raises(ValueError, match="not found in y: missing_y"):
        resolve_on(["xk"], ["a"], {"xk": "missing_y"})


def test_normalize_n_hint():
    assert normalize_n_hint(None) == {"x": None, "y": None}
    assert normalize_n_hint(100) == {"x": 100.0, "y": 100.0}
    assert normalize_n_hint({"x": 5}) == {"x": 5.0, "y": None}
    with pytest.raises(ValueError):
        normalize_n_hint("nope")


def test_estimate_distinct():
    keys = np.array([1, 1, 2, 3], dtype=np.int32)
    assert estimate_distinct_count(keys, 4) == 3
    assert estimate_distinct_count(keys, 4, hint=10) == 10
    # scaled: sample of 4 with 3 unique out of total 100 → 75
    assert estimate_distinct_count(keys, 100) == 75
    assert estimate_distinct_count(np.empty(0, np.int32), 0) == 0


def test_estimate_selectivity():
    probe = np.arange(100, dtype=np.int32)
    build = np.arange(50, 150, dtype=np.int32)
    assert estimate_selectivity(probe, build) == pytest.approx(0.5)
    assert estimate_selectivity(np.empty(0, np.int32), build) == 0.0


def test_side_rules():
    # full joins never prefilter
    t, reason, forced = choose_prefilter_target("full", "auto", 10, 10, 5, 5)
    assert t is None
    with pytest.warns(UserWarning):
        t, _, forced = choose_prefilter_target("full", "x", 10, 10, 5, 5)
    assert t is None and forced
    # left/semi/anti may only filter y
    for jt in ("left", "semi", "anti"):
        assert choose_prefilter_target(jt, "auto", 10, 10, 5, 5)[0] == "y"
        with pytest.warns(UserWarning):
            t, _, forced = choose_prefilter_target(jt, "x", 10, 10, 5, 5)
        assert t == "y" and forced
    # right may only filter x
    assert choose_prefilter_target("right", "auto", 10, 10, 5, 5)[0] == "x"
    with pytest.warns(UserWarning):
        t, _, forced = choose_prefilter_target("right", "y", 10, 10, 5, 5)
    assert t == "x" and forced
    # inner auto: density choice
    assert choose_prefilter_target("inner", "auto", 1_000_000, 10_000, 900_000, 9_000)[0] == "x"
    assert choose_prefilter_target("inner", "auto", 10_000, 1_000_000, 9_000, 900_000)[0] == "y"
    assert choose_prefilter_target("inner", "auto", 0, 10, 0, 5)[0] is None


def test_skip_heuristics():
    assert should_skip_prefilter(0, 100, 0.9)
    assert should_skip_prefilter(100, 0, 0.9)
    assert should_skip_prefilter(1023, 100, 0.9)
    assert not should_skip_prefilter(1024, 100, 0.9)
    assert should_skip_prefilter(5000, 15, 0.9)
    assert not should_skip_prefilter(5000, 16, 0.9)
    assert should_skip_prefilter(5000, 100, 0.02)
    assert not should_skip_prefilter(5000, 100, 0.021)


def test_plan_prefilter_end_to_end():
    kx = np.arange(10_000, dtype=np.int32)
    ky = np.arange(200, dtype=np.int32)
    plan = plan_prefilter("inner", "auto", "auto", 10_000, 200, 10_000, 200,
                          0.01, kx, ky)
    assert plan.use_prefilter and plan.target == "x"
    assert plan.expected_elements == 200
    md = plan.metadata
    assert md["bloom_filter_used"] and md["chosen_prefilter_side"] == "x"
    assert md["estimated_selectivity"] == pytest.approx(200 / 5000, abs=1e-6)

    # engine="fuse" is a real engine now (the reference reserved the slot
    # and raised; state/xorfuse.py fills it) — the plan carries it through
    fuse_plan = plan_prefilter("inner", "fuse", "auto", 10_000, 200,
                               10_000, 200, 0.01, kx, ky)
    assert fuse_plan.metadata["engine"] == "fuse"
    with pytest.raises(ValueError, match="unknown engine"):
        plan_prefilter("inner", "cuckoo", "auto", 10, 10, 5, 5, 0.01, kx, ky)


def test_plan_stats_unbiased_on_sorted_input(ray_session):
    """A key-sorted input must NOT bias the planner's distinct estimate
    (a head-limit() sample sees one key range and fails this); the
    per-block HLL + evenly-spaced sample keeps the estimate within 2x of
    truth and the auto side choice correct."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.join import _plan_stats, bloom_join

    n, n_distinct = 200_000, 50_000
    keys = np.sort(np.arange(n) % n_distinct)  # sorted: head is keys 0..k
    ds = rd.from_arrow(pa.table({"id": keys})).repartition(16)
    n_rows, distinct, sample = _plan_stats(ds, ["id"])
    assert n_rows == n
    assert truth_within_2x(distinct, n_distinct)
    # sample must span the whole key range, not just the head blocks
    assert len(sample) > 1000


def truth_within_2x(est, truth):
    return truth / 2 <= est <= truth * 2
