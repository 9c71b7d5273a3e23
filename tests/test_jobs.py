"""End-to-end drive of the deployable job CLIs (fresh subprocess — each
job owns its own Ray session, separate from the test fixture's)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_job(*argv):
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "curate_docs_job.py"),
         *argv],
        capture_output=True, text=True, env=env, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_curate_docs_job_runs_and_resumes(tmp_path):
    src = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "curated")

    s1 = _run_job("--input", src, "--out", out)
    assert s1["resumed"] is False
    assert 0 < s1["n_output"] < s1["n_input"] == 500
    assert s1["stages"] == ["quality_filter", "repetition_filter",
                            "exact_dedup", "line_dedup"]
    # the written partitioned parquet is readable and row-complete
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{s1['out']}/*.parquet')"
    ).fetchone()[0]
    assert n == s1["n_output"]

    # identical inputs → job-level resume, bit-identical summary
    s2 = _run_job("--input", src, "--out", out)
    assert s2["resumed"] is True
    assert s2["n_output"] == s1["n_output"]


@pytest.mark.slow
def test_curate_docs_job_ppl_gate(tmp_path):
    """--ppl-drop-frac drops ~that fraction of the curated survivors,
    records the gate stage + threshold, and the output loses the ppl
    column."""
    src = "/root/testdata/sf0.001/documents.parquet"
    base_out = str(tmp_path / "plain")
    s0 = _run_job("--input", src, "--out", base_out)

    out = str(tmp_path / "gated")
    s1 = _run_job("--input", src, "--out", out,
                  "--ppl-drop-frac", "0.2")
    assert s1["stages"][-1] == "perplexity_gate(drop=0.2)"
    assert s1["params"]["ppl_threshold"] is not None
    kept_frac = s1["n_output"] / s0["n_output"]
    assert abs(kept_frac - 0.8) < 0.08
    import duckdb

    cols = duckdb.sql(
        f"DESCRIBE SELECT * FROM read_parquet('{s1['out']}/*.parquet')"
    ).df()["column_name"].tolist()
    assert "ppl" not in cols


@pytest.mark.slow
def test_curate_docs_job_ppl_resume_skips_training(tmp_path):
    """Verdict r4 #7: a run that dies after the gate's staging+training
    but before the summary commit resumes with ONLY the score pass —
    the staged survivors and the trained counts both reload. Same
    output either way."""
    src = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "gated")
    s1 = _run_job("--input", src, "--out", out, "--ppl-drop-frac", "0.2")
    assert s1["ppl_stage_resumed"] is False
    assert s1["ppl_counts_resumed"] is False
    assert os.path.exists(os.path.join(out, "ppl_counts.npz"))
    assert os.path.exists(os.path.join(out, "_PRE_PPL.json"))

    # simulate death before the summary commit (staging + counts live)
    os.unlink(os.path.join(out, "_JOB_SUMMARY.json"))
    s2 = _run_job("--input", src, "--out", out, "--ppl-drop-frac", "0.2")
    assert s2["resumed"] is False                 # summary was gone
    assert s2["ppl_stage_resumed"] is True        # curation chain skipped
    assert s2["ppl_counts_resumed"] is True       # training pass skipped
    assert s2["n_output"] == s1["n_output"]
    assert s2["params"]["ppl_threshold"] == s1["params"]["ppl_threshold"]
    # and not slower in any material way — the skip itself is proven by
    # the two resume flags above; the wall comparison gets generous
    # headroom because this host's hypervisor throttling can inflate
    # any single run ~2x (see CLAUDE.md)
    assert s2["wall_sec"] < s1["wall_sec"] * 2.0

    # changing a curation parameter invalidates BOTH caches
    os.unlink(os.path.join(out, "_JOB_SUMMARY.json"))
    s3 = _run_job("--input", src, "--out", out, "--ppl-drop-frac", "0.2",
                  "--min-tokens", "25")
    assert s3["ppl_stage_resumed"] is False
    assert s3["ppl_counts_resumed"] is False
