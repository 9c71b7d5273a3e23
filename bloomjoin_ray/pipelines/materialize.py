"""Resumable partitioned Parquet output for transform pipelines.

The output layout the 100 TB brief requires: one output directory per
input shard, written atomically (temp dir → rename), plus a manifest of
completed partitions — a failed run re-invoked with the same arguments
skips finished shards and reprocesses only the rest. Never one giant file.

This is the map-transform sibling of ``pipelines/checkpoint.py`` (which
checkpoints sketch state): each partition is one Ray task that streams its
input Parquet through the caller's batch transform and writes its own
output directory. Raw ``ray.remote`` is deliberate — per-partition
externally-durable completion is the semantics the Dataset API's single
``write_parquet`` cannot express.
"""

from __future__ import annotations

import json
import os
import shutil
import time


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.jsonl")


def read_write_manifest(out_dir: str) -> dict[int, dict]:
    done = {}
    path = _manifest_path(out_dir)
    if not os.path.exists(path):
        return done
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            part_dir = os.path.join(out_dir, rec["dir"])
            if rec.get("status") == "done" and os.path.isdir(part_dir):
                done[rec["partition"]] = rec
    return done


def _write_partition(source: str, partition: int, out_dir: str,
                     transform, columns) -> dict:
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = time.time()
    rel = f"part-{partition:05d}"
    final = os.path.join(out_dir, rel)
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    pf = pq.ParquetFile(source)
    writer = None
    rows_in = rows_out = 0
    try:
        for batch in pf.iter_batches(columns=columns):
            tbl = pa.Table.from_batches([batch])
            rows_in += tbl.num_rows
            out = transform(tbl) if transform else tbl
            if out.num_rows == 0:
                continue
            if writer is None:
                writer = pq.ParquetWriter(os.path.join(tmp, "data.parquet"),
                                          out.schema)
            writer.write_table(out)
            rows_out += out.num_rows
        if writer is None:  # keep an empty (but valid) partition dir
            with open(os.path.join(tmp, "_EMPTY"), "w") as f:
                f.write("")
    finally:
        if writer is not None:
            writer.close()
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)  # atomic publish
    return {"partition": partition, "source": source, "dir": rel,
            "rows_in": rows_in, "rows_out": rows_out,
            "wall_sec": round(time.time() - t0, 3), "status": "done"}


def resumable_write(sources: list[str], out_dir: str, *, transform=None,
                    columns: list[str] | None = None,
                    max_in_flight: int = 16) -> list[dict]:
    """Stream every source Parquet file through ``transform`` into its own
    atomically-published output partition. Re-invocation skips partitions
    already committed to the manifest. Returns all partition records."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    # reuse a committed partition only when built from the same source
    done = {i: rec for i, rec in read_write_manifest(out_dir).items()
            if i < len(sources) and rec.get("source") == sources[i]}
    pending = [(i, s) for i, s in enumerate(sources) if i not in done]
    task = ray.remote(_write_partition)
    records: dict[int, dict] = dict(done)
    in_flight: dict = {}
    it = iter(pending)
    manifest = _manifest_path(out_dir)

    def commit(rec: dict) -> None:
        with open(manifest, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())
        records[rec["partition"]] = rec

    while True:
        while len(in_flight) < max_in_flight:
            try:
                i, src = next(it)
            except StopIteration:
                break
            in_flight[task.remote(src, i, out_dir, transform, columns)] = i
        if not in_flight:
            break
        ready, _ = ray.wait(list(in_flight), num_returns=1)
        for ref in ready:
            del in_flight[ref]
            commit(ray.get(ref))

    return [records[i] for i in sorted(records)]


def write_partitioned_by(ds, out_dir: str, cols, *, overwrite: bool = False):
    """Hive-partitioned parquet sink — one ``col=value/`` directory per
    distinct key combination (the brief's "one directory per key range"
    layout), so downstream readers prune whole partitions from the path
    alone (``read_parquet(out/lang=en)``) and a failed downstream stage
    re-reads only the partitions it needs. Thin wrapper over Ray's
    native ``write_parquet(partition_cols=…)`` (streamed, per-block
    writes — nothing materializes on the driver) that validates the
    columns exist, optionally clears a previous output, and returns the
    sorted partition directory names for manifesting."""
    import os
    import shutil

    from .asof import _schema_of

    cols = [cols] if isinstance(cols, str) else list(cols)
    schema = _schema_of(ds)
    missing = [c for c in cols if c not in schema.names]
    if missing:
        raise ValueError(f"write_partitioned_by: columns {missing} not in "
                         f"schema {schema.names}")
    if overwrite and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    ds.write_parquet(out_dir, partition_cols=cols)
    first = f"{cols[0]}="
    return sorted(d for d in os.listdir(out_dir)
                  if d.startswith(first))
