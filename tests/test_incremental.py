"""Incremental dedup against a persisted corpus index: oracle parity,
idempotent re-ingest, generation-gated commit, bloom growth, compaction.
"""

import json
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bloomjoin_ray.pipelines.incremental import (
    compact_index, incremental_dedup, init_corpus_index, read_index_spec,
    rebuild_bloom)


def _docs(n, seed, dup_rate=0.3, id_base=0):
    rng = np.random.default_rng(seed)
    base = [f"doc body {i} " + "x" * int(rng.integers(0, 20))
            for i in range(max(1, int(n * (1 - dup_rate))))]
    texts = [base[int(rng.integers(0, len(base)))] for _ in range(n)]
    return pa.table({
        "doc_id": pa.array(np.arange(id_base, id_base + n, dtype=np.int64)),
        "text": pa.array(texts),
    })


def _ingest(tbl, index_dir, **kw):
    import ray.data as rd
    return incremental_dedup(rd.from_arrow(tbl).repartition(4),
                             index_dir, **kw)


def _oracle_survivors(batches, target):
    """Rows of batches[target] whose text is first-seen across all
    earlier batches, keep-first (min doc_id) within the batch."""
    con = duckdb.connect()
    for i, b in enumerate(batches):
        con.register(f"b{i}", b)
    prior = " UNION ALL ".join(f"SELECT text FROM b{i}"
                               for i in range(target)) or None
    sql = f"""
        WITH first_in AS (
          SELECT min(doc_id) AS doc_id, text FROM b{target} GROUP BY text)
        SELECT f.doc_id, f.text FROM first_in f
        {f"WHERE NOT EXISTS (SELECT 1 FROM ({prior}) p WHERE p.text = f.text)"
         if prior else ""}
        ORDER BY f.doc_id
    """
    return con.execute(sql).fetch_arrow_table()


@pytest.fixture()
def index_dir(ray_session, tmp_path):
    d = str(tmp_path / "idx")
    init_corpus_index(d, num_buckets=8, bloom_capacity=4096)
    return d


def test_two_batch_oracle_parity(index_dir):
    b0, b1 = _docs(400, 1), _docs(300, 2, id_base=1000)
    s0 = _ingest(b0, index_dir).to_pandas().sort_values("doc_id")
    want0 = _oracle_survivors([b0, b1], 0).to_pandas()
    assert s0[["doc_id", "text"]].reset_index(drop=True).equals(want0)

    s1 = _ingest(b1, index_dir).to_pandas().sort_values("doc_id")
    want1 = _oracle_survivors([b0, b1], 1).to_pandas()
    assert s1[["doc_id", "text"]].reset_index(drop=True).equals(want1)

    spec = read_index_spec(index_dir)
    assert spec["generation"] == 2
    assert spec["rows"] == len(want0) + len(want1)


def test_reingest_is_empty_and_query_mode_is_pure(index_dir):
    b0 = _docs(200, 7)
    _ingest(b0, index_dir).materialize()
    gen_after = read_index_spec(index_dir)["generation"]

    again = _ingest(b0, index_dir, update_index=False)
    assert again.count() == 0
    assert read_index_spec(index_dir)["generation"] == gen_after

    # ingest-mode re-run also yields nothing new (and commits a
    # generation with zero added rows)
    assert _ingest(b0, index_dir).count() == 0
    spec = read_index_spec(index_dir)
    assert spec["generation"] == gen_after + 1
    assert spec["rows"] == len(_oracle_survivors([b0], 0))


def test_three_batch_chain(index_dir):
    batches = [_docs(250, 11), _docs(250, 12, id_base=500),
               _docs(250, 13, id_base=9000)]
    for i, b in enumerate(batches):
        got = (_ingest(b, index_dir).to_pandas()
               .sort_values("doc_id")[["doc_id", "text"]]
               .reset_index(drop=True))
        assert got.equals(_oracle_survivors(batches, i).to_pandas()), i


def test_orphan_generation_files_are_invisible(index_dir):
    b0, b1 = _docs(150, 21), _docs(150, 22, id_base=400)
    _ingest(b0, index_dir).materialize()
    spec = read_index_spec(index_dir)

    # simulate a crashed ingest: a gen-(G+1) file exists but the
    # manifest never bumped — its rows must not suppress survivors
    orphan_gen = spec["generation"] + 1
    from bloomjoin_ray.functions.text import content_hash128
    lo, hi = content_hash128(b1.column("text"))
    bdir = os.path.join(index_dir, "__kbucket=0")
    pq.write_table(pa.table({"h1": pa.array(lo.view(np.int64)),
                             "h2": pa.array(hi.view(np.int64))}),
                   os.path.join(bdir, f"gen{orphan_gen:08d}-orphan.parquet"))

    got = (_ingest(b1, index_dir).to_pandas()
           .sort_values("doc_id")[["doc_id", "text"]]
           .reset_index(drop=True))
    assert got.equals(_oracle_survivors([b0, b1], 1).to_pandas())


def test_compact_preserves_membership(index_dir):
    batches = [_docs(200, 31), _docs(200, 32, id_base=300)]
    for b in batches:
        _ingest(b, index_dir).materialize()
    before = read_index_spec(index_dir)

    spec = compact_index(index_dir)
    assert spec["rows"] == before["rows"]  # dup-free by construction
    for b in range(spec["num_buckets"]):
        d = os.path.join(index_dir, f"__kbucket={b}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) <= 1

    b2 = _docs(200, 33, id_base=700)
    got = (_ingest(b2, index_dir).to_pandas()
           .sort_values("doc_id")[["doc_id", "text"]]
           .reset_index(drop=True))
    assert got.equals(_oracle_survivors(batches + [b2], 2).to_pandas())


def test_bloom_rebuild_on_saturation(ray_session, tmp_path):
    d = str(tmp_path / "small_idx")
    init_corpus_index(d, num_buckets=4, bloom_capacity=32)  # tiny filter
    m0 = read_index_spec(d)["bloom_m"]
    b0 = _docs(600, 41, dup_rate=0.0)
    _ingest(b0, d).materialize()
    spec = read_index_spec(d)
    assert spec["bloom_m"] > m0          # saturation triggered a rebuild
    assert spec["bloom_capacity"] >= 2 * spec["rows"]

    # and correctness still holds post-rebuild
    b1 = _docs(200, 42, id_base=5000)
    got = (_ingest(b1, d).to_pandas()
           .sort_values("doc_id")[["doc_id", "text"]]
           .reset_index(drop=True))
    assert got.equals(_oracle_survivors([b0, b1], 1).to_pandas())


def test_explicit_rebuild_keeps_answers(index_dir):
    b0 = _docs(300, 51)
    _ingest(b0, index_dir).materialize()
    spec = rebuild_bloom(index_dir, capacity=100_000)
    assert spec["bloom_capacity"] == 100_000
    assert _ingest(b0, index_dir, update_index=False).count() == 0


def test_init_guard_and_overwrite(ray_session, tmp_path):
    d = str(tmp_path / "g")
    init_corpus_index(d, num_buckets=2)
    with pytest.raises(FileExistsError):
        init_corpus_index(d, num_buckets=2)
    init_corpus_index(d, num_buckets=2, overwrite=True)
    assert read_index_spec(d)["generation"] == 0


def test_incremental_fuzz_random_batch_chain(index_dir):
    """Randomized 5-batch chain with overlapping content, shuffled
    ingest partitioning and varying dup rates — every batch's
    survivors must match the DuckDB first-seen oracle."""
    rng = np.random.default_rng(1234)
    batches = []
    pool = [f"pool doc {i}" for i in range(300)]
    for b in range(5):
        n = int(rng.integers(50, 200))
        texts = [pool[int(rng.integers(0, len(pool)))] for _ in range(n)]
        batches.append(pa.table({
            "doc_id": pa.array(np.arange(b * 1000, b * 1000 + n,
                                         dtype=np.int64)),
            "text": pa.array(texts)}))
    for i, b in enumerate(batches):
        import ray.data as rd
        got = (incremental_dedup(
            rd.from_arrow(b).repartition(int(rng.integers(1, 7))),
            index_dir).to_pandas())
        got = (got.sort_values("doc_id")[["doc_id", "text"]]
               .reset_index(drop=True)) if len(got) else got
        want = _oracle_survivors(batches, i).to_pandas()
        if len(want) == 0:
            assert len(got) == 0, i
        else:
            assert got.equals(want), i
    spec = read_index_spec(index_dir)
    assert spec["generation"] == 5
