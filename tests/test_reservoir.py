"""Reservoir sample: partition-invariance, uniformity, distributed run."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from bloomjoin_ray.functions.keys import hash_keys64
from bloomjoin_ray.state.reservoir import ReservoirSample


def _table(ids):
    return pa.table({"id": pa.array(ids, type=pa.int64()),
                     "v": pa.array([float(i) for i in ids])})


def _run(ids, k, n_parts, order=None):
    t = _table(ids)
    chunks = np.array_split(np.arange(len(ids)), n_parts)
    if order is not None:
        chunks = [chunks[i] for i in order]
    merged = None
    for c in chunks:
        s = ReservoirSample(k)
        sub = t.take(pa.array(c))
        s.update_batch(hash_keys64(sub, ["id"]), sub)
        merged = s if merged is None else merged.merge(s)
    return merged


def test_partition_and_order_invariant():
    ids = list(range(5000))
    a = _run(ids, 50, 1)
    b = _run(ids, 50, 7)
    c = _run(ids, 50, 7, order=[3, 0, 6, 1, 5, 2, 4])
    sa = sorted(a.sample_table().column("id").to_pylist())
    sb = sorted(b.sample_table().column("id").to_pylist())
    sc = sorted(c.sample_table().column("id").to_pylist())
    assert sa == sb == sc
    assert len(sa) == 50
    assert a.n_seen == 5000


def test_uniformity():
    """Each of B buckets of ids should land in the sample ≈ equally."""
    ids = list(range(100_000))
    s = _run(ids, 2000, 4)
    sample = np.array(s.sample_table().column("id").to_pylist())
    buckets = sample // 25_000
    counts = np.bincount(buckets, minlength=4)
    assert (np.abs(counts - 500) < 120).all()  # ~5σ of binomial(2000, .25)


def test_small_input_keeps_everything():
    s = _run(list(range(10)), 50, 2)
    assert sorted(s.sample_table().column("id").to_pylist()) == list(range(10))


def test_roundtrip_and_errors():
    s = _run(list(range(100)), 10, 2)
    from bloomjoin_ray.state.base import sketch_from_bytes

    g = sketch_from_bytes(s.to_bytes())
    assert sorted(g.sample_table().column("id").to_pylist()) == \
        sorted(s.sample_table().column("id").to_pylist())
    assert g.n_seen == 100
    with pytest.raises(ValueError):
        ReservoirSample(10).merge(ReservoirSample(20))


def test_distributed_pipeline(ray_session):
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import reservoir_sample

    ds = rd.read_parquet("/root/testdata/sf0.01/events.parquet").repartition(6)
    t = reservoir_sample(ds, 100, "event_id")
    assert t.num_rows == 100
    assert len(set(t.column("event_id").to_pylist())) == 100
    # deterministic across runs
    t2 = reservoir_sample(ds, 100, "event_id")
    assert sorted(t.column("event_id").to_pylist()) == \
        sorted(t2.column("event_id").to_pylist())

def test_grouped_reservoir_partition_invariant(ray_session):
    """Per-key reservoir (verdict r3 #8): ≤ k rows per key, identical
    sample under any partitioning, small keys keep everything, payload
    rows arrive intact."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import reservoir_sample

    rng = np.random.default_rng(3)
    n = 5000
    t = pa.table({
        "g": pa.array(["g%d" % (i % 4) for i in range(n)]),
        "id": pa.array(np.arange(n), type=pa.int64()),
        "v": pa.array(rng.standard_normal(n)),
    })
    # one key with fewer rows than k
    t = pa.concat_tables([t, pa.table({
        "g": pa.array(["tiny"] * 3),
        "id": pa.array([90001, 90002, 90003], type=pa.int64()),
        "v": pa.array([1.0, 2.0, 3.0])})])

    def run(parts):
        ds = rd.from_arrow(t).repartition(parts)
        return (reservoir_sample(ds, 10, "id", key="g").to_pandas()
                .sort_values(["g", "id"]).reset_index(drop=True))

    got1, got8 = run(1), run(8)
    pd.testing.assert_frame_equal(got1, got8)
    sizes = got1.groupby("g").size()
    assert (sizes[["g0", "g1", "g2", "g3"]] == 10).all()
    assert sizes["tiny"] == 3
    # payload integrity: sampled rows are real input rows
    df = t.to_pandas().set_index("id")
    for _, r in got1.iterrows():
        assert df.loc[r["id"], "g"] == r["g"]
        assert df.loc[r["id"], "v"] == r["v"]


def test_weighted_reservoir_properties(ray_session):
    """A-ES weighted sampling: partition invariance, weight dominance,
    excluded null/zero/negative weights, and the state-level merge law."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import reservoir_sample
    from bloomjoin_ray.state.reservoir import WeightedReservoirSample

    n = 2000
    rng = np.random.default_rng(3)
    heavy = np.zeros(n, dtype=bool)
    heavy[rng.choice(n, 100, replace=False)] = True
    w = np.where(heavy, 500.0, 1.0)
    w[0], w[1], w[2] = 0.0, -3.0, np.nan          # never sampled
    wcol = [None if i == 3 else float(x) for i, x in enumerate(w)]
    t = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                  "w": pa.array(wcol, pa.float64())})

    s1 = reservoir_sample(rd.from_arrow(t).repartition(8), 100, "id",
                          weight_col="w")
    s2 = reservoir_sample(rd.from_arrow(t).repartition(2), 100, "id",
                          weight_col="w")
    ids1 = sorted(s1.column("id").to_pylist())
    assert ids1 == sorted(s2.column("id").to_pylist())   # partition-inv
    assert len(ids1) == 100
    assert not ({0, 1, 2, 3} & set(ids1))                # excluded rows
    got_heavy = sum(heavy[i] for i in ids1)
    assert got_heavy >= 90, got_heavy                    # weight dominance

    # merge law at the state level: split == single-pass
    h = np.arange(50, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    payload = pa.table({"x": pa.array(np.arange(50), pa.int64())})
    ww = rng.uniform(0.5, 5.0, 50)
    one = WeightedReservoirSample(10, 7)
    one.update_batch(h, payload, ww)
    a = WeightedReservoirSample(10, 7)
    b = WeightedReservoirSample(10, 7)
    a.update_batch(h[:20], payload.slice(0, 20), ww[:20])
    b.update_batch(h[20:], payload.slice(20), ww[20:])
    a.merge(WeightedReservoirSample.from_bytes(b.to_bytes()))
    assert (sorted(one.sample_table().column("x").to_pylist())
            == sorted(a.sample_table().column("x").to_pylist()))

    # grouped weighted: ≤ k per key, partition-invariant
    g = pa.table({"k": pa.array(np.repeat([1, 2], 300), pa.int64()),
                  "id": pa.array(np.arange(600), pa.int64()),
                  "w": pa.array(rng.uniform(0.1, 9.0, 600))})
    r1 = (reservoir_sample(rd.from_arrow(g).repartition(6), 5, "id",
                           key="k", weight_col="w")
          .to_pandas().sort_values(["k", "id"]).reset_index(drop=True))
    r2 = (reservoir_sample(rd.from_arrow(g).repartition(3), 5, "id",
                           key="k", weight_col="w")
          .to_pandas().sort_values(["k", "id"]).reset_index(drop=True))
    assert r1.equals(r2)
    assert (r1.groupby("k").size() == 5).all()
