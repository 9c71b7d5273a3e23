"""Resumable partitioned writes: atomicity, skip-on-resume, equivalence."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from bloomjoin_ray.pipelines.materialize import read_write_manifest, resumable_write
from bloomjoin_ray.sources.transcripts import generate_turns_table


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("wshards")
    paths = []
    for i in range(5):
        t = generate_turns_table(np.arange(i * 40, (i + 1) * 40))
        p = str(d / f"s{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths


# shipped by value to Ray workers (lambda), not by test-module reference
_keep_assistant = lambda t: t.filter(pc.equal(t["role"], "assistant"))  # noqa: E731


def test_write_and_resume(ray_session, shards, tmp_path):
    out = str(tmp_path / "out")
    recs = resumable_write(shards, out, transform=_keep_assistant)
    assert len(recs) == 5
    assert all(r["status"] == "done" and r["rows_out"] < r["rows_in"] for r in recs)
    total_rows = sum(r["rows_out"] for r in recs)
    read_back = pq.read_table(os.path.join(out, "part-00002", "data.parquet"))
    assert set(read_back.column("role").to_pylist()) == {"assistant"}

    # resume: nothing recomputed (mtimes untouched), records identical
    before = {r["partition"]: os.path.getmtime(os.path.join(out, r["dir"]))
              for r in recs}
    recs2 = resumable_write(shards, out, transform=_keep_assistant)
    after = {r["partition"]: os.path.getmtime(os.path.join(out, r["dir"]))
             for r in recs2}
    assert before == after
    assert sum(r["rows_out"] for r in recs2) == total_rows


def test_partial_then_full(ray_session, shards, tmp_path):
    out = str(tmp_path / "out2")
    resumable_write(shards[:2], out, transform=_keep_assistant)
    assert len(read_write_manifest(out)) == 2
    recs = resumable_write(shards, out, transform=_keep_assistant)
    assert len(recs) == 5
    # full equivalence vs a single fresh run
    fresh = str(tmp_path / "fresh")
    recs_fresh = resumable_write(shards, fresh, transform=_keep_assistant)
    for a, b in zip(recs, recs_fresh):
        assert a["rows_out"] == b["rows_out"]


def test_torn_partition_rerun(ray_session, shards, tmp_path):
    import shutil

    out = str(tmp_path / "out3")
    recs = resumable_write(shards[:2], out, transform=None)
    shutil.rmtree(os.path.join(out, recs[0]["dir"]))
    assert set(read_write_manifest(out)) == {1}
    recs2 = resumable_write(shards[:2], out, transform=None)
    assert len(recs2) == 2
    assert os.path.isdir(os.path.join(out, recs2[0]["dir"]))


def test_write_partitioned_by_roundtrip(ray_session, tmp_path):
    """Hive layout: one dir per key value; a single-partition read
    returns exactly that key's rows; full roundtrip preserves content."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from bloomjoin_ray.pipelines.materialize import write_partitioned_by

    rng = np.random.default_rng(61)
    n = 2000
    t = pa.table({
        "lang": pa.array([f"l{int(x)}" for x in rng.integers(0, 4, n)]),
        "id": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.normal(size=n)),
    })
    out = str(tmp_path / "parts")
    dirs = write_partitioned_by(rd.from_arrow(t).repartition(5), out,
                                "lang")
    assert dirs == [f"lang=l{i}" for i in range(4)]

    one = rd.read_parquet(f"{out}/lang=l2").to_pandas()
    df = t.to_pandas()
    want = df[df["lang"] == "l2"]
    assert sorted(one["id"]) == sorted(want["id"])

    back = rd.read_parquet(out).to_pandas()
    assert len(back) == n
    assert sorted(back["id"]) == list(range(n))

    with pytest.raises(ValueError, match="not in"):
        write_partitioned_by(rd.from_arrow(t), out, "nope")


def test_range_clustered_write_and_pruned_read(ray_session, tmp_path):
    """Range layout: pruned read touches only intersecting partitions
    and returns exactly the SQL WHERE rows; null clustering values
    never match a range read."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from bloomjoin_ray.pipelines.materialize import (read_range,
                                                     write_range_clustered)

    rng = np.random.default_rng(91)
    n = 4000
    vals = rng.uniform(0, 1000, n)
    vals[::97] = np.nan  # null rows land in their own partition
    t = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "value": pa.array(vals),
    })
    out = str(tmp_path / "rc")
    spec = write_range_clustered(rd.from_arrow(t).repartition(6), out,
                                 "value", num_partitions=8)
    assert len(spec["bounds"]) == 7

    ds, stats = read_range(out, 100.0, 220.0)
    got = ds.to_pandas().sort_values("id").reset_index(drop=True)
    want = duckdb.sql("""
        SELECT id, value FROM t
        WHERE value >= 100.0 AND value <= 220.0 ORDER BY id
    """).df()
    assert got["id"].tolist() == want["id"].tolist()
    assert np.allclose(got["value"], want["value"])
    # ~12% of the value range must not read every partition
    assert stats["partitions_read"] < stats["partitions_total"]
    assert stats["partitions_read"] >= 1

    # unbounded read returns every non-null row; nulls never match
    full, fstats = read_range(out)
    assert full.count() == int(np.count_nonzero(~np.isnan(vals)))
    assert fstats["partitions_read"] == fstats["partitions_total"]

    # empty intersection (beyond the max) → no partitions, no dataset
    none_ds, nstats = read_range(out, 5000.0, 6000.0)
    assert none_ds is None or none_ds.count() == 0
    assert nstats["partitions_read"] <= 1

    with pytest.raises(ValueError, match="must include"):
        read_range(out, 0.0, 1.0, columns=["id"])


def test_range_read_fuzz_against_duckdb(ray_session, tmp_path):
    """Randomized [lo, hi] sweeps (including empty, point, and
    full-range queries) against the SQL WHERE on a skewed value
    distribution — the prune must never drop a qualifying row."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.materialize import (read_range,
                                                     write_range_clustered)

    rng = np.random.default_rng(137)
    n = 3000
    vals = np.concatenate([rng.exponential(50, n // 2),
                           rng.uniform(0, 1000, n // 2)])
    t = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                  "value": pa.array(vals)})
    out = str(tmp_path / "fz")
    write_range_clustered(rd.from_arrow(t).repartition(5), out, "value",
                          num_partitions=12)
    con = duckdb.connect()
    con.register("t", t)
    cases = [(0.0, 10.0), (999.0, 1000.0), (50.0, 50.0), (0.0, 1000.0),
             (-5.0, -1.0), (200.0, 201.0)]
    cases += [tuple(sorted(rng.uniform(0, 1000, 2))) for _ in range(6)]
    for lo, hi in cases:
        ds, _ = read_range(out, lo, hi)
        got = sorted(ds.to_pandas()["id"]) if ds is not None \
            and ds.count() else []
        want = [r[0] for r in con.execute(
            "SELECT id FROM t WHERE value >= ? AND value <= ? ORDER BY id",
            [lo, hi]).fetchall()]
        assert got == want, (lo, hi, len(got), len(want))
