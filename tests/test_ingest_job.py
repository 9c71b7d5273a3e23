"""End-to-end drive of jobs/ingest_job.py (fresh subprocess — the job
owns its Ray session): exact and neardup modes, exactly-once output,
idempotent re-invocation, torn-append recovery."""

import json
import os
import subprocess
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*argv, expect_fail=False):
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "ingest_job.py"), *argv],
        capture_output=True, text=True, env=env, timeout=300)
    if expect_fail:
        assert out.returncode != 0
        return out.stderr
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def _write_docs(path, n, seed, dup_rate=0.4, id_base=0):
    rng = np.random.default_rng(seed)
    base = [f"document body {i} " + "tok " * int(rng.integers(5, 30))
            for i in range(max(1, int(n * (1 - dup_rate))))]
    texts = [base[int(rng.integers(0, len(base)))] for _ in range(n)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(id_base, id_base + n, dtype=np.int64)),
        "text": pa.array(texts)}), path)
    return texts


@pytest.mark.slow
def test_ingest_job_exact_two_increments(tmp_path):
    inc0 = str(tmp_path / "inc0.parquet")
    inc1 = str(tmp_path / "inc1.parquet")
    t0 = _write_docs(inc0, 300, 1)
    t1 = _write_docs(inc1, 200, 2, id_base=1000)
    idx = str(tmp_path / "idx")

    s0 = _run("--index", idx, "--input", inc0,
              "--out", str(tmp_path / "out0"), "--init")
    assert s0["n_survivors"] == len(set(t0))
    assert s0["index_generation"] == 1     # probe is pure; one append
    assert s0["index_rows"] == len(set(t0))

    s1 = _run("--index", idx, "--input", inc1,
              "--out", str(tmp_path / "out1"))
    want1 = len(set(t1) - set(t0))
    assert s1["n_survivors"] == want1
    assert s1["index_rows"] == len(set(t0)) + want1

    # survivors on disk match a DuckDB first-seen oracle
    n = duckdb.sql(f"""
        SELECT count(*) FROM read_parquet('{s1["out"]}/*.parquet')
    """).fetchone()[0]
    assert n == want1

    # identical re-invocation: fully resumed, index untouched
    s1b = _run("--index", idx, "--input", inc1,
               "--out", str(tmp_path / "out1"))
    assert s1b["probe_resumed"] and s1b["append_resumed"]
    assert s1b["index_generation"] == s1["index_generation"]
    assert s1b["n_survivors"] == want1


@pytest.mark.slow
def test_ingest_job_neardup_mode(tmp_path):
    inc0 = str(tmp_path / "a.parquet")
    words = [f"w{i:03d}" for i in range(200)]
    docs0 = [" ".join(words[i:i + 60]) for i in range(0, 120, 30)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(docs0), dtype=np.int64)),
        "text": pa.array(docs0)}), inc0)
    idx = str(tmp_path / "nidx")
    s0 = _run("--index", idx, "--input", inc0,
              "--out", str(tmp_path / "o0"), "--mode", "neardup", "--init",
              "--num-buckets", "8")
    assert s0["n_survivors"] == len(docs0)  # offsets 30 apart: all novel

    # increment: one light perturbation of doc 0 (near-dup) + one novel
    near = docs0[0].replace(words[10], "zzz")
    novel = " ".join(reversed(words))[:300]
    inc1 = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([50, 51], type=pa.int64()),
        "text": pa.array([near, novel])}), inc1)
    s1 = _run("--index", idx, "--input", inc1,
              "--out", str(tmp_path / "o1"), "--mode", "neardup")
    assert s1["n_survivors"] == 1
    got = duckdb.sql(f"""
        SELECT doc_id FROM read_parquet('{s1["out"]}/*.parquet')
    """).fetchone()[0]
    assert got == 51

    # mode mismatch is refused
    err = _run("--index", idx, "--input", inc1,
               "--out", str(tmp_path / "o2"), "--mode", "exact",
               expect_fail=True)
    assert "kind" in err


@pytest.mark.slow
def test_ingest_job_torn_append_recovers(tmp_path):
    """Simulate a crash between the probe commit and the append: the
    re-run must append WITHOUT recomputing survivors, and the output
    must survive byte-identical."""
    inc = str(tmp_path / "inc.parquet")
    t = _write_docs(inc, 250, 9)
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    s0 = _run("--index", idx, "--input", inc, "--out", out, "--init")

    inc1 = str(tmp_path / "inc1.parquet")
    t1 = _write_docs(inc1, 150, 10, id_base=5000)
    out1 = str(tmp_path / "out1")
    s1 = _run("--index", idx, "--input", inc1, "--out", out1)
    want = len(set(t1) - set(t))
    assert s1["n_survivors"] == want

    # tear: roll the index spec back one generation (as if the append
    # never committed) and delete the job summary — the staged output
    # and its _OUT marker survive
    spec_path = os.path.join(idx, "_INDEX.json")
    spec = json.load(open(spec_path))
    spec["generation"] -= 1
    spec.pop("last_ingest_sig", None)
    spec["rows"] -= want
    json.dump(spec, open(spec_path, "w"))
    os.unlink(os.path.join(out1, "_JOB_SUMMARY.json"))

    s1b = _run("--index", idx, "--input", inc1, "--out", out1)
    assert s1b["probe_resumed"] is True      # staged output reused
    assert s1b["append_resumed"] is False    # append re-ran
    assert s1b["n_survivors"] == want
    assert s1b["index_rows"] == s1["index_rows"]
