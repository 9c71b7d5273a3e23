"""Checkpoint/resume: interrupted run + resume == uninterrupted run."""

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from bloomjoin_ray.functions.keys import hash_keys64
from bloomjoin_ray.pipelines.checkpoint import (
    checkpointed_sketch_aggregate,
    read_manifest,
)
from bloomjoin_ray.sources.transcripts import generate_turns_table
from bloomjoin_ray.state.hll import HllSketch


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    paths = []
    for i in range(6):
        t = generate_turns_table(np.arange(i * 50, (i + 1) * 50))
        p = str(d / f"shard-{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths


# lambdas (not module-level defs): cloudpickle ships them by value, so
# Ray workers don't need to import this test module
_make = lambda: HllSketch(12)  # noqa: E731
_update = lambda s, t: s.update_batch(hash_keys64(t, ["conv_id", "turn_idx"]))  # noqa: E731


def test_full_run_and_manifest(ray_session, shards, tmp_path):
    job = str(tmp_path / "job1")
    sk, recs = checkpointed_sketch_aggregate(
        shards, job, _make, _update, columns=["conv_id", "turn_idx"])
    assert len(recs) == 6
    assert all(r["status"] == "done" and r["rows"] > 0 for r in recs)
    manifest = read_manifest(job)
    assert set(manifest) == set(range(6))
    # estimate ≈ total distinct turns
    total = sum(r["rows"] for r in recs)
    assert abs(sk.estimate() - total) / total < 0.05


def test_resume_skips_done_and_matches(ray_session, shards, tmp_path):
    job_full = str(tmp_path / "full")
    full_sk, _ = checkpointed_sketch_aggregate(
        shards, job_full, _make, _update, columns=["conv_id", "turn_idx"])

    # simulate a crash: run only the first 3 partitions
    job = str(tmp_path / "crashy")
    checkpointed_sketch_aggregate(
        shards[:3], job, _make, _update, columns=["conv_id", "turn_idx"])
    assert len(read_manifest(job)) == 3

    # resume with the full source list: partitions 0-2 are reused
    before = {p: os.path.getmtime(os.path.join(job, r["blob"]))
              for p, r in read_manifest(job).items()}
    sk, recs = checkpointed_sketch_aggregate(
        shards, job, _make, _update, columns=["conv_id", "turn_idx"])
    after = {p: os.path.getmtime(os.path.join(job, r["blob"]))
             for p, r in read_manifest(job).items()}
    for p in before:
        assert before[p] == after[p]  # untouched — not recomputed
    assert len(recs) == 6
    np.testing.assert_array_equal(sk.registers, full_sk.registers)


def test_torn_blob_is_rerun(ray_session, shards, tmp_path):
    job = str(tmp_path / "torn")
    checkpointed_sketch_aggregate(
        shards[:2], job, _make, _update, columns=["conv_id", "turn_idx"])
    # delete a blob but leave its manifest line → must be treated as pending
    recs = read_manifest(job)
    os.remove(os.path.join(job, recs[0]["blob"]))
    assert set(read_manifest(job)) == {1}
    sk, out = checkpointed_sketch_aggregate(
        shards[:2], job, _make, _update, columns=["conv_id", "turn_idx"])
    assert len(out) == 2
