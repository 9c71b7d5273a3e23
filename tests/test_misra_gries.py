"""Misra–Gries deterministic heavy-hitter guarantees, incl. after merges."""

import numpy as np
import pyarrow as pa
import pytest

from bloomjoin_ray.functions.keys import splitmix64
from bloomjoin_ray.state.base import sketch_from_bytes
from bloomjoin_ray.state.misra_gries import MisraGries


def _zipf_stream(n, n_items, seed=0):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=n)
    items = np.minimum(ranks, n_items).astype(np.int64)
    return items


def _feed(items, k, n_parts, order=None):
    chunks = np.array_split(items, n_parts)
    if order is not None:
        chunks = [chunks[i] for i in order]
    merged = None
    for c in chunks:
        s = MisraGries(k)
        t = pa.table({"item": pa.array(c)})
        s.update_batch(splitmix64(c.astype(np.uint64)), t)
        merged = s if merged is None else merged.merge(s)
    return merged


def test_guarantees_single_pass():
    items = _zipf_stream(100_000, 10_000, 1)
    s = _feed(items, k=64, n_parts=1)
    true = dict(zip(*np.unique(items, return_counts=True)))
    out = s.items_table().to_pandas()
    n = len(items)
    for _, row in out.iterrows():
        t = true[row["item"]]
        assert row["est_count"] <= t               # never over-counts
        assert t - row["est_count"] <= s.max_error  # bounded under-count
    assert s.max_error <= n // (64 + 1) + 1
    # every item with freq > N/(k+1) is kept
    kept = set(out["item"])
    for item, cnt in true.items():
        if cnt > n / 65:
            assert item in kept, (item, cnt)


@pytest.mark.parametrize("n_parts", [4, 16])
def test_guarantees_after_shuffled_merge(n_parts):
    items = _zipf_stream(80_000, 5_000, 3)
    order = np.random.default_rng(0).permutation(n_parts)
    s = _feed(items, k=64, n_parts=n_parts, order=list(order))
    true = dict(zip(*np.unique(items, return_counts=True)))
    out = s.items_table().to_pandas()
    n = len(items)
    assert s.n == n
    for _, row in out.iterrows():
        t = true[row["item"]]
        assert row["est_count"] <= t
        assert t - row["est_count"] <= s.max_error
    # mergeable-summaries bound: total decrement ≤ N/(k+1) per stream union
    assert s.max_error <= n / 65 + n_parts
    kept = set(out["item"])
    for item, cnt in true.items():
        if cnt - s.max_error > 0:
            assert item in kept


def test_roundtrip():
    items = _zipf_stream(10_000, 500, 5)
    s = _feed(items, 32, 3)
    g = sketch_from_bytes(s.to_bytes())
    a = s.items_table().to_pandas()
    b = g.items_table().to_pandas()
    assert a.equals(b)
    assert g.n == s.n and g.max_error == s.max_error


def test_pipeline_vs_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from bloomjoin_ray.pipelines.aggregate import mg_heavy_hitters

    sf = "/root/testdata/sf0.01"
    ds = rd.read_parquet(f"{sf}/events.parquet")
    out = mg_heavy_hitters(ds, "event_type", topk=5, k=64).to_pandas()
    true = duckdb.sql(
        f"SELECT event_type, count(*) n FROM '{sf}/events.parquet' "
        "GROUP BY 1 ORDER BY n DESC").df()
    # 8 distinct types << k=64 → never trimmed → exact counts, exact order
    m = out.merge(true, on="event_type")
    assert (m["est_count"] == m["n"]).all()
    assert list(out["event_type"]) == list(true["event_type"][:5])