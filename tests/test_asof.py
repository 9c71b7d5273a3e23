"""As-of join vs the DuckDB ASOF JOIN oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def frames(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({
        "user_id": rng.integers(0, 50, size=2000),
        "ts": base + pd.to_timedelta(rng.integers(0, 10**6, size=2000), unit="s"),
        "value": rng.normal(size=2000),
    })
    right = pd.DataFrame({
        "user_id": np.repeat(np.arange(50), 4),
        "ts": base + pd.to_timedelta(rng.integers(0, 10**6, size=200), unit="s"),
        "score": rng.normal(size=200),
    })
    to_ds = lambda df: rd.from_arrow(  # noqa: E731
        pa.Table.from_pandas(df).cast(pa.schema([
            pa.field("user_id", pa.int64()), pa.field("ts", pa.timestamp("us")),
            pa.field(df.columns[-1], pa.float64())]))).repartition(4)
    return left, right, to_ds(left), to_ds(right)


def _oracle(left, right):
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    return con.sql("""
        SELECT l.user_id, l.ts, l.value, r.score
        FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts >= r.ts
    """).df()


def test_asof_by_key_vs_duckdb(frames):
    from bloomjoin_ray.pipelines.asof import asof_join

    left, right, dsl, dsr = frames
    got = asof_join(dsl, dsr, on="ts", by="user_id").to_pandas()
    want = _oracle(left, right)
    key = ["user_id", "ts", "value"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(left) == len(w)
    pd.testing.assert_frame_equal(g[["score"]].fillna(-9), w[["score"]].fillna(-9),
                                  check_dtype=False, rtol=1e-12)


def test_asof_no_by_broadcast(frames):
    from bloomjoin_ray.pipelines.asof import asof_join

    left, right, dsl, dsr = frames
    got = asof_join(dsl, dsr.drop_columns(["user_id"]), on="ts").to_pandas()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right.drop(columns=["user_id"]))
    want = con.sql("""
        SELECT l.user_id, l.ts, l.value, r.score
        FROM l ASOF LEFT JOIN r ON l.ts >= r.ts
    """).df()
    key = ["user_id", "ts", "value"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w)
    pd.testing.assert_frame_equal(g[["score"]].fillna(-9), w[["score"]].fillna(-9),
                                  check_dtype=False, rtol=1e-12)


def test_asof_forward_direction(frames):
    """direction='forward' attaches the EARLIEST right row at-or-after
    each left ts (pandas merge_asof is the oracle here — DuckDB ASOF
    only expresses backward)."""
    import pandas as pd

    from bloomjoin_ray.pipelines.asof import asof_join

    left, right, dsl, dsr = frames
    got = asof_join(dsl, dsr, on="ts", by="user_id",
                    direction="forward").to_pandas()
    want = pd.merge_asof(left.sort_values("ts", kind="stable"),
                         right.sort_values("ts", kind="stable"),
                         on="ts", by="user_id", direction="forward")
    key = ["user_id", "ts", "value"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w) == len(left)
    pd.testing.assert_frame_equal(g[["score"]].fillna(-9), w[["score"]].fillna(-9),
                                  check_dtype=False, rtol=1e-12)


def test_asof_column_collision_suffix(frames):
    from bloomjoin_ray.pipelines.asof import asof_join

    _, _, dsl, dsr = frames
    # right 'value' collides with left 'value' → value_right
    import pyarrow.compute as pc

    dsr2 = dsr.map_batches(
        lambda t: t.rename_columns(["user_id", "ts", "value"]),
        batch_format="pyarrow")
    out = asof_join(dsl, dsr2, on="ts", by="user_id")
    assert "value_right" in out.schema().names

def test_asof_null_on_values(ray_session):
    """Null `on` never matches on either side (SQL semantics): left rows
    with null ts surface with null right columns; right rows with null
    ts are never attached."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.asof import asof_join

    left = pa.table({
        "user_id": pa.array([1, 1, 2], type=pa.int64()),
        "ts": pa.array([10, None, 5], type=pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0]),
    })
    right = pa.table({
        "user_id": pa.array([1, 1, 2], type=pa.int64()),
        "ts": pa.array([8, None, None], type=pa.int64()),
        "score": pa.array([100.0, 200.0, 300.0]),
    })
    got = (asof_join(rd.from_arrow(left), rd.from_arrow(right),
                     on="ts", by="user_id")
           .to_pandas().sort_values(["user_id", "value"])
           .reset_index(drop=True))
    assert len(got) == 3
    assert got.loc[0, "score"] == 100.0          # 10 >= 8
    assert pd.isna(got.loc[1, "score"])          # null left ts
    assert pd.isna(got.loc[2, "score"])          # only null right ts for key 2


def test_asof_forward_no_by(frames):
    """Pure temporal forward as-of (no equality key) routes through the
    single-bucket zipper — matches pandas merge_asof."""
    import pandas as pd

    from bloomjoin_ray.pipelines.asof import asof_join

    left, right, dsl, dsr = frames
    got = asof_join(dsl, dsr.drop_columns(["user_id"]), on="ts",
                    direction="forward").to_pandas()
    want = pd.merge_asof(left.sort_values("ts", kind="stable"),
                         right.drop(columns=["user_id"])
                              .sort_values("ts", kind="stable"),
                         on="ts", direction="forward")
    key = ["user_id", "ts", "value"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w)
    pd.testing.assert_frame_equal(g[["score"]].fillna(-9), w[["score"]].fillna(-9),
                                  check_dtype=False, rtol=1e-12)


def test_asof_no_by_big_right_single_bucket_matches_broadcast(frames):
    """Forcing the right side over the broadcast limit routes through
    the single-bucket sweep — identical output to the broadcast zipper."""
    from bloomjoin_ray.pipelines.asof import asof_join

    left, right, dsl, dsr = frames
    r = dsr.drop_columns(["user_id"])
    a = (asof_join(dsl, r, on="ts").to_pandas()
         .sort_values(["user_id", "ts", "value"]).reset_index(drop=True))
    b = (asof_join(dsl, r, on="ts", broadcast_limit_rows=10).to_pandas()
         .sort_values(["user_id", "ts", "value"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_asof_float_on_column(ray_session):
    """Float `on` columns work (IEEE monotone order key), including
    negatives — parity with pandas merge_asof."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.asof import asof_join

    rng = np.random.default_rng(8)
    left = pd.DataFrame({"k": rng.integers(0, 5, 300),
                         "x": rng.normal(size=300)})
    right = pd.DataFrame({"k": np.repeat(np.arange(5), 6),
                          "x": rng.normal(size=30),
                          "y": rng.normal(size=30)})
    got = (asof_join(rd.from_arrow(pa.Table.from_pandas(left)),
                     rd.from_arrow(pa.Table.from_pandas(right)),
                     on="x", by="k").to_pandas()
           .sort_values(["k", "x"]).reset_index(drop=True))
    want = (pd.merge_asof(left.sort_values("x", kind="stable"),
                          right.sort_values("x", kind="stable"),
                          on="x", by="k")
            .sort_values(["k", "x"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["y"]].fillna(-9), want[["y"]].fillna(-9),
                                  check_dtype=False, rtol=1e-12)


def test_asof_tolerance_vs_merge_asof(frames):
    """pd.merge_asof tolerance parity: matches farther than the
    tolerance become nulls — bucketed (by-key) path, backward and
    forward, int and timedelta tolerances."""
    from bloomjoin_ray.pipelines.asof import asof_join

    left, right, dsl, dsr = frames
    tol = pd.Timedelta(hours=24)

    for direction in ("backward", "forward"):
        got = (asof_join(dsl, dsr, on="ts", by="user_id",
                         direction=direction, tolerance=tol)
               .to_pandas()
               .sort_values(["user_id", "ts", "value"])
               .reset_index(drop=True))
        want = (pd.merge_asof(
                    left.sort_values("ts"), right.sort_values("ts"),
                    on="ts", by="user_id", direction=direction,
                    tolerance=tol)
                .sort_values(["user_id", "ts", "value"])
                .reset_index(drop=True))
        assert got["score"].notna().sum() == want["score"].notna().sum()
        pd.testing.assert_series_equal(got["score"], want["score"],
                                       check_dtype=False)
        # tolerance must strictly reduce the matched count vs no-tol
        full = asof_join(dsl, dsr, on="ts", by="user_id",
                         direction=direction).to_pandas()
        assert (got["score"].notna().sum()
                < full["score"].notna().sum())

    # int tolerance in native units (us) == the timedelta run
    got_us = (asof_join(dsl, dsr, on="ts", by="user_id",
                        tolerance=int(tol / pd.Timedelta(microseconds=1)))
              .to_pandas())
    got_td = asof_join(dsl, dsr, on="ts", by="user_id",
                       tolerance=tol).to_pandas()
    assert (got_us["score"].notna().sum()
            == got_td["score"].notna().sum())


def test_asof_tolerance_no_by_broadcast(frames):
    """Tolerance on the broadcast (no-by) zipper path."""
    from bloomjoin_ray.pipelines.asof import asof_join

    left, right, dsl, dsr = frames
    tol = pd.Timedelta(minutes=30)
    got = (asof_join(dsl, dsr, on="ts", tolerance=tol).to_pandas()
           .sort_values(["ts", "value"]).reset_index(drop=True))
    want = (pd.merge_asof(left.sort_values("ts"),
                          right.sort_values("ts").drop(columns=["user_id"]),
                          on="ts", tolerance=tol)
            .sort_values(["ts", "value"]).reset_index(drop=True))
    assert got["score"].notna().sum() == want["score"].notna().sum() > 0
    pd.testing.assert_series_equal(got["score"], want["score"],
                                   check_dtype=False)


def test_asof_tolerance_validation(ray_session):
    import ray.data as rd

    from bloomjoin_ray.pipelines.asof import asof_join

    ints = rd.from_arrow(pa.table({"k": [1], "t": [5], "v": [1.0]}))
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(ints, ints, on="t", by="k", tolerance=-1)
    floats = rd.from_arrow(pa.table(
        {"k": [1], "t": pa.array([5.0], pa.float64())}))
    with pytest.raises(TypeError, match="float"):
        asof_join(floats, floats, on="t", by="k", tolerance=1)
    with pytest.raises(TypeError, match="timestamp"):
        asof_join(ints, ints, on="t", by="k",
                  tolerance=pd.Timedelta(seconds=1))
    # integer tolerance on an integer column: gap <= tol inclusive
    L = rd.from_arrow(pa.table({"k": [1, 1], "t": [10, 20],
                                "lv": ["a", "b"]}))
    R = rd.from_arrow(pa.table({"k": [1], "t": [8], "rv": ["x"]}))
    out = (asof_join(L, R, on="t", by="k", tolerance=2).to_pandas()
           .sort_values("t").reset_index(drop=True))
    assert out["rv"].tolist()[0] == "x"       # gap 2 == tol: matches
    assert pd.isna(out["rv"].tolist()[1])     # gap 12 > tol: null


def test_asof_nearest_vs_merge_asof(frames):
    """direction='nearest' parity with pd.merge_asof: closer of the
    backward/forward candidates, backward wins distance ties, exact
    duplicates take the last, forward duplicates the first — bucketed
    and broadcast paths, with and without tolerance."""
    from bloomjoin_ray.pipelines.asof import asof_join

    left, right, dsl, dsr = frames
    for kw in ({}, {"tolerance": pd.Timedelta(hours=12)}):
        got = (asof_join(dsl, dsr, on="ts", by="user_id",
                         direction="nearest", **kw)
               .to_pandas()
               .sort_values(["user_id", "ts", "value"])
               .reset_index(drop=True))
        want = (pd.merge_asof(left.sort_values("ts"),
                              right.sort_values("ts"),
                              on="ts", by="user_id", direction="nearest",
                              **kw)
                .sort_values(["user_id", "ts", "value"])
                .reset_index(drop=True))
        pd.testing.assert_series_equal(got["score"], want["score"],
                                       check_dtype=False)
        # broadcast (no-by) path
        got2 = (asof_join(dsl, dsr, on="ts", direction="nearest", **kw)
                .to_pandas().sort_values(["ts", "value"])
                .reset_index(drop=True))
        want2 = (pd.merge_asof(
                     left.sort_values("ts"),
                     right.sort_values("ts").drop(columns=["user_id"]),
                     on="ts", direction="nearest", **kw)
                 .sort_values(["ts", "value"]).reset_index(drop=True))
        pd.testing.assert_series_equal(got2["score"], want2["score"],
                                       check_dtype=False)
        if not kw:                  # nearest w/o tolerance: every left
            assert got["score"].notna().all()


def test_asof_nearest_tie_and_duplicate_rules(ray_session):
    """Pinned micro-cases: equal-distance tie -> backward; exact-match
    duplicates -> last; forward duplicates -> first (pandas rules)."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.asof import asof_join

    L = rd.from_arrow(pa.table({"k": [1, 1, 1], "t": [10, 30, 50]}))
    R = rd.from_arrow(pa.table(
        {"k": [1, 1, 1, 1, 1],
         "t": [8, 12, 30, 30, 52],
         "v": ["back", "fwd", "dup1", "dup2", "fwd2"]}))
    out = (asof_join(L, R, on="t", by="k", direction="nearest")
           .to_pandas().sort_values("t").reset_index(drop=True))
    # t=10: back(8) and fwd(12) both distance 2 -> backward wins
    # t=30: exact duplicates -> the LAST (dup2)
    # t=50: nearest is fwd2 at 52 (distance 2 vs dup2 at 20)
    assert out["v"].tolist() == ["back", "dup2", "fwd2"]

    Rf = rd.from_arrow(pa.table({"k": [1, 1], "t": [12, 12],
                                 "v": ["first", "second"]}))
    outf = asof_join(L.filter(lambda r: r["t"] == 10), Rf, on="t",
                     by="k", direction="nearest").to_pandas()
    assert outf["v"].tolist() == ["first"]   # forward duplicates: first

    floats = rd.from_arrow(pa.table(
        {"k": [1], "t": pa.array([5.0], pa.float64())}))
    with pytest.raises(TypeError, match="nearest"):
        asof_join(floats, floats, on="t", by="k", direction="nearest")
