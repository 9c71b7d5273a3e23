"""Join skew salting: a single hot key must spread across reducers
(≤2× the mean per-reducer load) with results oracle-equal to DuckDB,
including many-to-many cartesian semantics
(reference tests/testthat/test-bloom_join.R:181-202)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


HOT, N_HOT, N_COLD = 7, 1_000_000, 10_000


@pytest.fixture(scope="module")
def skewed(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    x_ids = np.concatenate([np.full(N_HOT, HOT),
                            rng.integers(100, 200, size=N_COLD)])
    x = pa.table({"id": x_ids, "xv": np.arange(len(x_ids))})
    # many-to-many: 3 hot rows on y → full cartesian for the hot key
    y_ids = np.concatenate([[HOT, HOT, HOT], np.arange(100, 200)])
    y = pa.table({"id": y_ids, "yv": np.arange(len(y_ids)) * 10})
    return (rd.from_arrow(x).repartition(16), rd.from_arrow(y).repartition(4),
            x, y)


def _oracle(x, y, sql):
    con = duckdb.connect()
    con.register("x", x.to_pandas())
    con.register("y", y.to_pandas())
    return con.sql(sql).df()


@pytest.mark.parametrize("how,sql", [
    ("inner", "SELECT count(*) FROM x JOIN y USING (id)"),
    ("left", "SELECT count(*) FROM x LEFT JOIN y USING (id)"),
    ("full", "SELECT count(*) FROM x FULL JOIN y USING (id)"),
    ("anti", "SELECT count(*) FROM x ANTI JOIN y USING (id)"),
])
def test_salted_join_matches_oracle(skewed, how, sql):
    from bloomjoin_ray.pipelines.join import bloom_join

    ds_x, ds_y, x, y = skewed
    res, report = bloom_join(ds_x, ds_y, on="id", how=how,
                             broadcast_limit_rows=0)  # force partitioned
    want = int(_oracle(x, y, sql).iloc[0, 0])
    assert res.count() == want


def test_salted_join_values_exact(skewed):
    """Hot-key rows carry the right y values (spot-check the cartesian)."""
    from bloomjoin_ray.pipelines.join import bloom_join

    ds_x, ds_y, x, y = skewed
    res, _ = bloom_join(ds_x, ds_y, on="id", how="inner",
                        broadcast_limit_rows=0)
    got = res.to_pandas()
    want = _oracle(x, y, "SELECT * FROM x JOIN y USING (id)")
    key = ["id", "xv", "yv"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        want[key].sort_values(key).reset_index(drop=True),
        check_dtype=False)


def test_salt_balances_reducer_load(skewed):
    """After salting, no reducer group receives more than 2× the mean
    salted-side row load."""
    from bloomjoin_ray.functions.keys import hash_keys64
    from bloomjoin_ray.pipelines.join import (
        _JoinLayout, _apply_salt, detect_salt_spec,
    )
    from bloomjoin_ray.pipelines.plan import resolve_on

    _, _, x, y = skewed
    h64 = hash_keys64(x, ["id"])
    # planner-style evenly-spaced sample
    sample_x = h64[:: max(1, len(h64) // 4096)]
    sample_y = hash_keys64(y, ["id"])
    spec = detect_salt_spec(sample_x, sample_y, x.num_rows, y.num_rows,
                            "inner", 64)
    assert spec is not None and len(spec.keys) >= 1
    side, _base = next(iter(spec.keys.values()))
    assert side == "x"  # x is the duplicate-rich side

    layout = _JoinLayout(x.schema, y.schema,
                         resolve_on(x.schema.names, y.schema.names, "id"),
                         "inner")
    prep = layout.x_table(x, "na", 64)
    salted = _apply_salt(prep, h64, spec, "x", "na")
    groups = np.asarray(salted.column("__bucket")) % 32
    counts = np.bincount(groups, minlength=32)
    assert counts.max() <= 2 * counts.mean()

    # y side: hot rows replicated into every sub-bucket exactly once
    y_salted = _apply_salt(layout.y_table(y, "na", 64),
                           hash_keys64(y, ["id"]), spec, "y", "na")
    hot_rows = int((np.asarray(y_salted.column("__bucket")) >= 64).sum())
    assert hot_rows == 3 * spec.factor
