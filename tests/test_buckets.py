"""Direct tests of the shared bucketed-reduce machinery: the packed
bucket map_groups primitive (equivalence with the groupby formulation,
empty inputs, the pre-bucketed path) and the packed order-independent
grouped aggregate."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest


def _corpus(n=5000, seed=11):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, 97, n)),
        "s": pa.array([f"key-{i}" for i in rng.integers(0, 40, n)]),
        "v": pa.array(rng.standard_normal(n)),
    })


def test_packed_bucket_map_groups_matches_groupby(ray_session):
    """The packed exchange is a drop-in for with_hash_bucket + groupby +
    map_groups: same rows out for a bucket-union-invariant group fn
    (keep the min-v row per key), any partitioning."""
    import ray.data as rd

    from bloomjoin_ray.pipelines.buckets import (packed_bucket_map_groups,
                                                 with_hash_bucket)

    t = _corpus()

    def keep_min(group: pa.Table) -> pa.Table:
        sub = group.drop_columns(["__gbucket"])
        if sub.num_rows == 0:
            return sub
        idx = np.asarray(pc.sort_indices(sub, sort_keys=[
            ("k", "ascending"), ("s", "ascending"), ("v", "ascending")]))
        kk = np.asarray(sub.column("k"))[idx]
        ss = np.asarray(sub.column("s"))[idx]
        first = np.empty(len(idx), dtype=bool)
        first[0] = True
        first[1:] = (kk[1:] != kk[:-1]) | (ss[1:] != ss[:-1])
        return sub.take(pa.array(idx[first]))

    def norm(df):
        return df.sort_values(["k", "s", "v"]).reset_index(drop=True)

    for parts in (1, 7):
        ds = rd.from_arrow(t).repartition(parts)
        got = norm(packed_bucket_map_groups(ds, ["k", "s"], keep_min)
                   .to_pandas())
        want = norm(with_hash_bucket(ds, ["k", "s"])
                    .groupby("__gbucket")
                    .map_groups(keep_min, batch_format="pyarrow")
                    .to_pandas())
        pd.testing.assert_frame_equal(got, want)


def test_packed_bucket_map_groups_pre_bucketed_and_empty(ray_session):
    import ray.data as rd

    from bloomjoin_ray.pipelines.buckets import packed_bucket_map_groups

    t = _corpus(800, seed=5)

    def add_bucket(b: pa.Table) -> pa.Table:
        m = (np.asarray(b.column("k")) % 16).astype(np.int32)
        return b.append_column("__gbucket", pa.array(m))

    def count_bucketed(group: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([group.num_rows], type=pa.int64())})

    ds = rd.from_arrow(t).repartition(5).map_batches(
        add_bucket, batch_format="pyarrow")
    out = packed_bucket_map_groups(ds, None, count_bucketed,
                                   num_buckets=16, pre_bucketed=True)
    assert out.to_pandas()["n"].sum() == 800

    # empty input: schema derived from fn(empty) — no crash, zero rows
    empty = rd.from_arrow(t.slice(0, 0))
    out = packed_bucket_map_groups(empty, ["k"], lambda g: g)
    assert out.count() == 0


def test_grouped_assoc_agg_matches_pandas(ray_session):
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import grouped_assoc_agg

    t = _corpus(4000, seed=23)
    want = (t.to_pandas().groupby(["k", "s"])
            .agg(vmin=("v", "min"), vmax=("v", "max"), n=("v", "size"))
            .reset_index())

    def norm(df):
        return (df.sort_values(["k", "s"]).reset_index(drop=True)
                [["k", "s", "vmin", "vmax", "n"]])

    for parts in (1, 9):
        ds = rd.from_arrow(t).repartition(parts)
        got = grouped_assoc_agg(ds, ["k", "s"], {"v": ("min", "vmin")},
                                count_col="n").to_pandas()
        got2 = grouped_assoc_agg(ds, ["k", "s"], {"v": ("max", "vmax")})\
            .to_pandas()
        merged = got.merge(got2, on=["k", "s"])
        pd.testing.assert_frame_equal(norm(merged), norm(want),
                                      check_dtype=False)

    with pytest.raises(ValueError, match="min/max"):
        grouped_assoc_agg(rd.from_arrow(t), ["k"], {"v": ("sum", "x")})
