"""Checkpointed, resumable sketch aggregation with per-partition lineage.

The north-rule requirement: a 10^12-turn sketch job must survive
mid-run death. Layout under ``job_dir``:

    partials/part-{i:05d}.sketch     one serialized partial per partition
    manifest.jsonl                   one committed line per finished partition

A partition = one input Parquet file (or one synthetic shard). Write
protocol is write-then-commit: the partial blob is written to a temp name
and atomically renamed BEFORE its manifest line is appended, so a torn run
can never record a partition whose blob is unreadable. Resume reads the
manifest, verifies each blob exists, and re-runs only the rest.

This layer drops to raw ``ray.remote`` tasks deliberately — per-partition
externally-checkpointed state is the one semantics the Dataset API can't
express (SURVEY §4); each task itself streams its partition through
pyarrow batches.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from ..state.base import merge_all, sketch_from_bytes


@dataclass
class PartitionRecord:
    partition: int
    source: str
    rows: int
    blob: str
    wall_sec: float
    status: str = "done"


def _manifest_path(job_dir: str) -> str:
    return os.path.join(job_dir, "manifest.jsonl")


def read_manifest(job_dir: str) -> dict[int, dict]:
    """Committed partitions (blob verified present)."""
    done = {}
    path = _manifest_path(job_dir)
    if not os.path.exists(path):
        return done
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            blob = os.path.join(job_dir, rec["blob"])
            if rec.get("status") == "done" and os.path.exists(blob):
                done[rec["partition"]] = rec
    return done


def _build_partition(source: str, partition: int, job_dir: str,
                     make_sketch, update, columns) -> dict:
    """Runs inside a Ray task: stream one Parquet file through the sketch,
    write blob, return the manifest record (committed by the driver)."""
    import pyarrow.parquet as pq

    t0 = time.time()
    sketch = make_sketch()
    rows = 0
    pf = pq.ParquetFile(source)
    for batch in pf.iter_batches(columns=columns):
        import pyarrow as pa

        tbl = pa.Table.from_batches([batch])
        update(sketch, tbl)
        rows += tbl.num_rows
    rel = os.path.join("partials", f"part-{partition:05d}.sketch")
    final = os.path.join(job_dir, rel)
    tmp = final + ".tmp"
    with open(tmp, "wb") as f:
        f.write(sketch.to_bytes())
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)  # atomic commit of the blob
    return {
        "partition": partition,
        "source": source,
        "rows": rows,
        "blob": rel,
        "wall_sec": round(time.time() - t0, 3),
        "status": "done",
    }


def checkpointed_sketch_aggregate(sources: list[str], job_dir: str,
                                  make_sketch, update, *,
                                  columns: list[str] | None = None,
                                  max_in_flight: int = 16,
                                  from_bytes=None):
    """Build one merged sketch over ``sources`` (Parquet files), one
    checkpointed partition per file. Safe to re-invoke after a crash:
    finished partitions are skipped via the manifest.

    Returns (sketch, records) — records covers ALL partitions (reused +
    fresh).
    """
    import ray

    os.makedirs(os.path.join(job_dir, "partials"), exist_ok=True)
    # a committed partition is only reusable if it was built from the SAME
    # source path — a reordered/changed source list re-runs the partition
    # instead of silently reusing a stale partial
    done = {i: rec for i, rec in read_manifest(job_dir).items()
            if i < len(sources) and rec.get("source") == sources[i]}
    pending = [(i, src) for i, src in enumerate(sources) if i not in done]

    task = ray.remote(_build_partition)
    records: dict[int, dict] = dict(done)
    in_flight: dict = {}
    it = iter(pending)
    manifest = _manifest_path(job_dir)

    def commit(rec: dict) -> None:
        # blob already durable (write-then-rename) — now append the line
        with open(manifest, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())
        records[rec["partition"]] = rec

    try:
        while True:
            while len(in_flight) < max_in_flight:
                try:
                    i, src = next(it)
                except StopIteration:
                    break
                ref = task.remote(src, i, job_dir, make_sketch, update, columns)
                in_flight[ref] = i
            if not in_flight:
                break
            ready, _ = ray.wait(list(in_flight), num_returns=1)
            for ref in ready:
                del in_flight[ref]
                commit(ray.get(ref))
    finally:
        pass

    def _read_blob(rec: dict) -> bytes:
        with open(os.path.join(job_dir, rec["blob"]), "rb") as f:
            return f.read()

    decode = from_bytes or sketch_from_bytes
    merged = merge_all(decode(_read_blob(records[i]))
                       for i in sorted(records))
    return merged, [records[i] for i in sorted(records)]
