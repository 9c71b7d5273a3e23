"""cogroup: general two-dataset per-key transform — full-outer
semantics (one-side-only keys), DuckDB parity, schema validation."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def two_sides(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(21)
    A = pa.table({"k": pa.array(rng.integers(0, 150, 4000), pa.int64()),
                  "va": pa.array(rng.integers(0, 1000, 4000), pa.int64())})
    # keys 100..249: half-overlapping with A's 0..149
    B = pa.table({"k": pa.array(rng.integers(100, 250, 2500), pa.int64()),
                  "vb": pa.array(rng.random(2500))})
    return A, B, rd.from_arrow(A).repartition(4), rd.from_arrow(B).repartition(3)


def test_cogroup_full_outer_aggregate(two_sides):
    from bloomjoin_ray.pipelines.cogroup import cogroup

    A, B, da, db = two_sides

    def per_key(ta: pa.Table, tb: pa.Table) -> pa.Table:
        keys = ta.column("k") if ta.num_rows else tb.column("k")
        va = ta.column("va").to_numpy() if ta.num_rows else np.zeros(0)
        vb = tb.column("vb").to_numpy() if tb.num_rows else np.zeros(0)
        return pa.table({
            "k": keys.slice(0, 1),
            "n_a": pa.array([ta.num_rows], pa.int64()),
            "n_b": pa.array([tb.num_rows], pa.int64()),
            "max_va": pa.array([int(va.max()) if va.size else None],
                               pa.int64()),
            "min_vb": pa.array([float(vb.min()) if vb.size else None],
                               pa.float64())})

    got = (cogroup(da, db, "k", per_key).to_pandas()
           .sort_values("k").reset_index(drop=True))
    exp = duckdb.sql("""
        WITH ca AS (SELECT k, count(*) n_a, max(va) max_va FROM A GROUP BY k),
             cb AS (SELECT k, count(*) n_b, min(vb) min_vb FROM B GROUP BY k)
        SELECT coalesce(ca.k, cb.k) k, coalesce(n_a, 0) n_a,
               coalesce(n_b, 0) n_b, max_va, min_vb
        FROM ca FULL JOIN cb ON ca.k = cb.k ORDER BY k
    """).df()
    pd.testing.assert_frame_equal(
        got.astype({"k": "int64"}), exp.astype({"k": "int64"}),
        check_dtype=False)
    # one-side-only keys really flowed through (B has keys 150..249)
    assert (got["n_a"] == 0).any() and (got["n_b"] == 0).any()


def test_cogroup_validation(two_sides):
    import ray.data as rd

    from bloomjoin_ray.pipelines.cogroup import cogroup

    A, B, da, db = two_sides
    with pytest.raises(ValueError, match="both sides"):
        cogroup(da, db, "va", lambda ta, tb: ta)
    f32 = rd.from_arrow(pa.table({"k": pa.array([1.0], pa.float32())}))
    with pytest.raises(TypeError, match="types differ"):
        cogroup(da, f32, "k", lambda ta, tb: ta)
    clash = rd.from_arrow(pa.table(
        {"k": pa.array([1], pa.int64()), "va": pa.array([1.0])}))
    with pytest.raises(TypeError, match="different types"):
        cogroup(da, clash, "k", lambda ta, tb: ta)
    with pytest.raises(ValueError, match="not in schema"):
        cogroup(da, db, "k", lambda ta, tb: ta, columns_a=["zzz"])


def test_cogroup_column_pruning(two_sides):
    """Pruned exchange still sees the key columns."""
    from bloomjoin_ray.pipelines.cogroup import cogroup

    _A, _B, da, db = two_sides
    out = cogroup(
        da, db, "k",
        lambda ta, tb: pa.table({"k": (ta if ta.num_rows else tb)
                                 .column("k").slice(0, 1),
                                 "n": pa.array([ta.num_rows + tb.num_rows],
                                               pa.int64())}),
        columns_a=["k"], columns_b=["k"]).to_pandas()
    assert out["n"].sum() == 4000 + 2500


def test_dataset_diff(ray_session):
    import ray.data as rd

    from bloomjoin_ray.pipelines.cogroup import dataset_diff

    rng = np.random.default_rng(9)
    base = pa.table({"k": pa.array(np.arange(500, dtype=np.int64)),
                     "v": pa.array(rng.integers(0, 10**6, 500)),
                     "s": pa.array([f"s{i}" for i in range(500)])})
    da = rd.from_arrow(base).repartition(4)

    # identical copies diff to nothing (different partitioning, order)
    same = rd.from_arrow(base.take(pa.array(
        rng.permutation(500)))).repartition(7)
    assert dataset_diff(da, same, "k").count() == 0

    # mutate one value, drop one key, add one key, duplicate one row
    tb = base.to_pandas()
    tb.loc[tb["k"] == 7, "v"] += 1                       # content_differs
    tb = tb[tb["k"] != 13]                               # only_a
    tb = pd.concat([tb, pd.DataFrame(
        {"k": [999], "v": [1], "s": ["new"]})])          # only_b
    tb = pd.concat([tb, tb[tb["k"] == 21]])              # count_differs
    db = rd.from_arrow(pa.Table.from_pandas(
        tb, preserve_index=False).cast(base.schema)).repartition(3)

    got = (dataset_diff(da, db, "k").to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert got.set_index("k")["status"].to_dict() == {
        7: "content_differs", 13: "only_a", 21: "count_differs",
        999: "only_b"}
    # emit_equal surfaces the agreeing keys too
    full = dataset_diff(da, db, "k", emit_equal=True).to_pandas()
    assert len(full) == 501 and (full["status"] == "equal").sum() == 497

    # restricting compared columns hides the v mutation
    sub = (dataset_diff(da, db, "k", columns=["s"]).to_pandas()
           .sort_values("k"))
    assert sub.set_index("k")["status"].to_dict() == {
        13: "only_a", 21: "count_differs", 999: "only_b"}

    with pytest.raises(TypeError, match="types differ"):
        dataset_diff(da, rd.from_arrow(pa.table(
            {"k": pa.array([1], pa.int64()),
             "v": pa.array([1.0])})), "k", columns=["v"])
