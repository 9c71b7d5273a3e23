"""Join parity vs a duckdb oracle — the reference's test strategy
(tests/testthat/test-bloom_join.R uses dplyr as oracle; we use duckdb with
IS NOT DISTINCT FROM for the null-matching semantics) across join types ×
key types × NA patterns × duplicates, on BOTH physical strategies
(broadcast and partitioned)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tests.util import assert_same

BOTH_PATHS = [1_000_000, 0]  # broadcast_limit_rows: broadcast / force-partitioned


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data

    return ray.data


def _from_pandas(rd, df, parallelism=3):
    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(parallelism)


@pytest.fixture(scope="module")
def xy(rd):
    rng = np.random.default_rng(42)
    x = pd.DataFrame({"id": np.arange(1, 2001), "value_x": rng.normal(size=2000)})
    y = pd.DataFrame({"id": np.arange(1500, 2600), "value_y": rng.normal(size=1100)})
    return x, y


def oracle(sql, **frames):
    con = duckdb.connect()
    for name, df in frames.items():
        con.register(name, df)
    return con.sql(sql).df()


@pytest.mark.parametrize("blimit", BOTH_PATHS)
@pytest.mark.parametrize("how,sql", [
    ("inner", "SELECT x.*, y.value_y FROM x JOIN y ON x.id IS NOT DISTINCT FROM y.id"),
    ("left", "SELECT x.*, y.value_y FROM x LEFT JOIN y ON x.id IS NOT DISTINCT FROM y.id"),
    ("right", "SELECT coalesce(x.id, y.id) AS id, x.value_x, y.value_y FROM x RIGHT JOIN y ON x.id IS NOT DISTINCT FROM y.id"),
    ("full", "SELECT coalesce(x.id, y.id) AS id, x.value_x, y.value_y FROM x FULL JOIN y ON x.id IS NOT DISTINCT FROM y.id"),
    ("semi", "SELECT x.* FROM x WHERE EXISTS (SELECT 1 FROM y WHERE y.id IS NOT DISTINCT FROM x.id)"),
    ("anti", "SELECT x.* FROM x WHERE NOT EXISTS (SELECT 1 FROM y WHERE y.id IS NOT DISTINCT FROM x.id)"),
])
def test_join_types_vs_oracle(rd, xy, how, sql, blimit):
    from bloomjoin_ray.pipelines.join import hash_join

    x, y = xy
    out = hash_join(_from_pandas(rd, x), _from_pandas(rd, y), "id", how,
                    broadcast_limit_rows=blimit)
    assert_same(out, oracle(sql, x=x, y=y))


@pytest.mark.parametrize("blimit", BOTH_PATHS)
def test_multi_key_join(rd, blimit):
    from bloomjoin_ray.pipelines.join import hash_join

    x = pd.DataFrame({"id1": np.repeat(np.arange(10), 10),
                      "id2": np.tile(np.arange(10), 10),
                      "vx": np.arange(100.0)})
    y = pd.DataFrame({"id1": np.repeat(np.arange(5, 15), 11),
                      "id2": np.tile(np.arange(11), 10),
                      "vy": np.arange(110.0)})
    out = hash_join(_from_pandas(rd, x), _from_pandas(rd, y), ["id1", "id2"],
                    "inner", broadcast_limit_rows=blimit)
    assert_same(out, oracle(
        "SELECT x.*, y.vy FROM x JOIN y ON x.id1=y.id1 AND x.id2=y.id2", x=x, y=y))


def test_no_overlap_and_full_overlap(rd):
    from bloomjoin_ray.pipelines.join import hash_join

    x = pd.DataFrame({"id": np.arange(100), "vx": np.arange(100.0)})
    y = pd.DataFrame({"id": np.arange(100, 200), "vy": np.arange(100.0)})
    assert hash_join(_from_pandas(rd, x), _from_pandas(rd, y), "id", "inner").count() == 0
    left = hash_join(_from_pandas(rd, x), _from_pandas(rd, y), "id", "left")
    assert_same(left, oracle("SELECT x.*, y.vy FROM x LEFT JOIN y USING (id)", x=x, y=y))
    y2 = pd.DataFrame({"id": np.arange(100), "vy": np.arange(100.0)})
    assert hash_join(_from_pandas(rd, x), _from_pandas(rd, y2), "id", "inner").count() == 100


def test_renamed_key(rd):
    from bloomjoin_ray.pipelines.join import hash_join

    x = pd.DataFrame({"id_x": np.arange(50), "vx": np.arange(50.0)})
    y = pd.DataFrame({"id_y": np.arange(25, 75), "vy": np.arange(50.0)})
    out = hash_join(_from_pandas(rd, x), _from_pandas(rd, y), {"id_x": "id_y"}, "inner")
    assert_same(out, oracle(
        "SELECT x.id_x, x.vx, y.vy FROM x JOIN y ON x.id_x = y.id_y", x=x, y=y))


@pytest.mark.parametrize("blimit", BOTH_PATHS)
def test_duplicate_keys_cartesian(rd, blimit):
    """Many-to-many duplicates → full cartesian per key (reference
    test-bloom_join.R:181-202: 2 × 3 × 6 = 36 rows)."""
    from bloomjoin_ray.pipelines.join import hash_join

    x = pd.DataFrame({"id": np.repeat(np.arange(1, 11), 2), "vx": np.arange(20.0)})
    y = pd.DataFrame({"id": np.repeat(np.arange(5, 16), 3), "vy": np.arange(33.0)})
    out = hash_join(_from_pandas(rd, x), _from_pandas(rd, y), "id", "inner",
                    broadcast_limit_rows=blimit)
    assert out.count() == 36
    assert_same(out, oracle("SELECT x.*, y.vy FROM x JOIN y USING (id)", x=x, y=y))


@pytest.mark.parametrize("blimit", BOTH_PATHS)
@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti", "full"])
def test_null_keys_match_nulls(rd, how, blimit):
    """dplyr na_matches='na': null joins null (F1 na-keys fixture)."""
    from bloomjoin_ray.pipelines.join import hash_join

    x = pd.DataFrame({"id": pd.array([1, 2, 3, None, 5], dtype="Int64"),
                      "vx": np.arange(5.0)})
    y = pd.DataFrame({"id": pd.array([2, 4, None, 6], dtype="Int64"),
                      "vy": np.arange(4.0)})
    sqls = {
        "inner": "SELECT x.*, y.vy FROM x JOIN y ON x.id IS NOT DISTINCT FROM y.id",
        "left": "SELECT x.*, y.vy FROM x LEFT JOIN y ON x.id IS NOT DISTINCT FROM y.id",
        "full": "SELECT coalesce(x.id, y.id) AS id, x.vx, y.vy FROM x FULL JOIN y ON x.id IS NOT DISTINCT FROM y.id",
        "semi": "SELECT x.* FROM x WHERE EXISTS (SELECT 1 FROM y WHERE y.id IS NOT DISTINCT FROM x.id)",
        "anti": "SELECT x.* FROM x WHERE NOT EXISTS (SELECT 1 FROM y WHERE y.id IS NOT DISTINCT FROM x.id)",
    }
    out = hash_join(_from_pandas(rd, x), _from_pandas(rd, y), "id", how,
                    broadcast_limit_rows=blimit)
    assert_same(out, oracle(sqls[how], x=x, y=y))
    # full join must not match null to null under full+never semantics
    if how == "full":
        never = hash_join(_from_pandas(rd, x), _from_pandas(rd, y), "id", "full",
                          broadcast_limit_rows=blimit, na_matches="never")
        assert_same(never, oracle(
            "SELECT coalesce(x.id, y.id) AS id, x.vx, y.vy FROM x FULL JOIN y ON x.id = y.id",
            x=x, y=y))


@pytest.mark.parametrize("blimit", BOTH_PATHS)
def test_cross_type_keys(rd, blimit):
    """int64 x-keys join float64 y-keys by value (F3; reference
    test-cross-type-keys.R)."""
    from bloomjoin_ray.pipelines.join import hash_join

    n = 3000  # above the 1024-row skip threshold, like the reference
    x = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "vx": np.arange(n, dtype=float)})
    y = pd.DataFrame({"id": np.arange(0, n, 3, dtype=np.float64), "vy": np.arange(0, n, 3, dtype=float)})
    out = hash_join(_from_pandas(rd, x), _from_pandas(rd, y), "id", "inner",
                    broadcast_limit_rows=blimit)
    assert_same(out, oracle(
        "SELECT x.id, x.vx, y.vy FROM x JOIN y ON x.id = y.id", x=x, y=y))


def test_dictionary_vs_string_key(rd):
    from bloomjoin_ray.pipelines.join import hash_join
    import ray.data

    vals = ["apple", "banana", "cherry", "apple", "durian"]
    x_t = pa.table({"k": pa.array(vals).dictionary_encode(), "vx": list(range(5))})
    y_t = pa.table({"k": pa.array(["apple", "cherry", "fig"]), "vy": [1.0, 2.0, 3.0]})
    out = hash_join(ray.data.from_arrow(x_t), ray.data.from_arrow(y_t), "k", "inner")
    df = out.to_pandas()
    assert sorted(df["k"]) == ["apple", "apple", "cherry"]


def test_date_vs_timestamp_key(rd):
    from bloomjoin_ray.pipelines.join import hash_join
    import ray.data

    days = [10, 11, 12, 13]
    x_t = pa.table({"d": pa.array(days, type=pa.date32()), "vx": list(range(4))})
    y_t = pa.table({"d": pa.array([d * 86_400_000_000 for d in days[1:3]],
                                  type=pa.timestamp("us")),
                    "vy": [1.0, 2.0]})
    out = hash_join(ray.data.from_arrow(x_t), ray.data.from_arrow(y_t), "d", "inner")
    assert out.count() == 2


def test_suffix_conflicts(rd):
    from bloomjoin_ray.pipelines.join import hash_join

    x = pd.DataFrame({"id": [1, 2], "value": [10.0, 20.0], "common": ["a", "b"]})
    y = pd.DataFrame({"id": [1, 2], "value": [1.0, 2.0], "common": ["c", "d"]})
    out = hash_join(_from_pandas(rd, x, 1), _from_pandas(rd, y, 1), "id", "inner")
    cols = set(out.schema().names)
    assert cols == {"id", "value_x", "common_x", "value_y", "common_y"}


def test_string_keys_vs_oracle(rd):
    from bloomjoin_ray.pipelines.join import hash_join

    letters = [chr(ord("a") + i) for i in range(26)]
    x = pd.DataFrame({"id": letters[:20], "vx": np.arange(20.0)})
    y = pd.DataFrame({"id": letters[9:], "vy": np.arange(17.0)})
    out = hash_join(_from_pandas(rd, x), _from_pandas(rd, y), "id", "inner")
    assert_same(out, oracle("SELECT x.*, y.vy FROM x JOIN y USING (id)", x=x, y=y))


def test_tiny_and_single_row(rd):
    from bloomjoin_ray.pipelines.join import hash_join

    x = pd.DataFrame({"id": [1], "vx": [0.5]})
    y = pd.DataFrame({"id": [1, 2], "vy": [1.0, 2.0]})
    out = hash_join(_from_pandas(rd, x, 1), _from_pandas(rd, y, 1), "id", "inner")
    df = out.to_pandas()
    assert len(df) == 1 and df["vy"][0] == 1.0


def test_wide_table_join(rd):
    """F2 wide-frame fixture: 50 payload columns through the join."""
    from bloomjoin_ray.pipelines.join import bloom_join

    rng = np.random.default_rng(9)
    n = 5000
    cols = {"id": np.arange(n)}
    cols.update({f"c{i:02d}": rng.normal(size=n) for i in range(50)})
    x = pd.DataFrame(cols)
    y = pd.DataFrame({"id": np.arange(0, 200), "vy": np.ones(200)})
    ds, report = bloom_join(_from_pandas(rd, x, 4), _from_pandas(rd, y, 1),
                            "id", "inner")
    df = ds.to_pandas()
    assert len(df) == 200 and len(df.columns) == 52
    assert_same(ds, oracle("SELECT x.*, y.vy FROM x JOIN y USING (id)", x=x, y=y))


def test_special_string_keys_join(rd):
    """F2 special/unicode/collision-bait keys through both join paths."""
    from bloomjoin_ray.pipelines.join import hash_join

    keys = ["hello world", "test@email.com", "file/path.txt", "unicode-ñäöü",
            "123-456-7890", "", " ", "a", "aa", "aaa", "b" * 100, "日本語キー"]
    x = pd.DataFrame({"k": keys * 3, "vx": np.arange(len(keys) * 3, dtype=float)})
    y = pd.DataFrame({"k": keys[::2], "vy": np.arange(len(keys[::2]), dtype=float)})
    for blimit in BOTH_PATHS:
        out = hash_join(_from_pandas(rd, x), _from_pandas(rd, y), "k", "inner",
                        broadcast_limit_rows=blimit)
        assert_same(out, oracle("SELECT x.*, y.vy FROM x JOIN y USING (k)", x=x, y=y))


def test_suffix_collision_repair(ray_session):
    """x has 'v', y has 'v' and 'v_y': the suffixed rename of y.v must
    not collide with y's existing 'v_y' — the suffix re-applies until
    unique, and every column's values survive."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.join import hash_join

    x = rd.from_arrow(pa.table({"id": [1, 2], "v": [10, 20]}))
    y = rd.from_arrow(pa.table({"id": [1, 2], "v": [1.5, 2.5],
                                "v_y": ["a", "b"]}))
    out = hash_join(x, y, on="id", how="inner").to_pandas().sort_values("id")
    assert sorted(out.columns) == ["id", "v_x", "v_y", "v_y_y"]
    assert out["v_x"].tolist() == [10, 20]        # renamed x.v
    assert out["v_y"].tolist() == ["a", "b"]      # y's own v_y untouched
    assert out["v_y_y"].tolist() == [1.5, 2.5]    # renamed y.v, re-suffixed


def test_checkpoint_resume_validates_source(ray_session, tmp_path):
    """A manifest entry is only reused when its source path matches —
    reordering the source list re-runs the moved partitions."""
    import pyarrow.parquet as pq

    from bloomjoin_ray.pipelines.materialize import resumable_write

    srcs = []
    for i in range(2):
        p = str(tmp_path / f"in{i}.parquet")
        pq.write_table(pa.table({"a": [i * 10, i * 10 + 1]}), p)
        srcs.append(p)
    out = str(tmp_path / "out")
    rec1 = resumable_write(srcs, out)
    assert [r["rows_out"] for r in rec1] == [2, 2]
    # swapped order: both partitions must be REBUILT from the new sources
    rec2 = resumable_write(list(reversed(srcs)), out)
    assert [r["source"] for r in rec2] == list(reversed(srcs))
    t0 = pq.read_table(str(tmp_path / "out" / "part-00000" / "data.parquet"))
    assert t0.column("a").to_pylist() == [10, 11]  # now from in1.parquet


def test_cross_join_matches_sql(ray_session):
    """CROSS JOIN vs DuckDB: full product, chunked output batches,
    column-collision and oversize-right guards."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from bloomjoin_ray.pipelines.join import cross_join

    a = pa.table({"x": pa.array(np.arange(500), pa.int64()),
                  "s": pa.array([f"a{i}" for i in range(500)])})
    b = pa.table({"y": pa.array([10, 20, 30], pa.int64()),
                  "t": pa.array(["p", None, "r"])})
    got = (cross_join(rd.from_arrow(a).repartition(4), rd.from_arrow(b),
                      out_batch_rows=64)
           .to_pandas().sort_values(["x", "y"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("a", a)
    con.register("b", b)
    want = con.sql("SELECT * FROM a CROSS JOIN b ORDER BY x, y").df()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)

    with pytest.raises(ValueError, match="collision"):
        cross_join(rd.from_arrow(a), rd.from_arrow(a))
    with pytest.raises(ValueError, match="exceeds"):
        cross_join(rd.from_arrow(b), rd.from_arrow(a), max_right_rows=10)


def test_cross_join_empty_right(ray_session):
    """Empty right side: zero output rows but a full unified schema."""
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.join import cross_join

    a = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    b = pa.table({"y": pa.array([], pa.int64())})
    out = cross_join(rd.from_arrow(a), rd.from_arrow(b))
    # schema asserted on the Dataset: Ray drops the schema of fully-
    # empty Datasets in to_pandas (documented engine-wide caveat)
    assert sorted(out.schema().names) == ["x", "y"]
    assert out.count() == 0
