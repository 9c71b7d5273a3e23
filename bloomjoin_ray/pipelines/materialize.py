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


_RANGE_SPEC = "_RANGE_SPEC.json"


def write_range_clustered(ds, out_dir: str, col: str, *,
                          num_partitions: int = 16,
                          overwrite: bool = False,
                          method: str = "kll", k: int = 200) -> dict:
    """Range-CLUSTERED parquet sink: one hive directory per quantile
    range of ``col`` (equal-frequency split points from one KLL/t-digest
    pass), committed with a ``_RANGE_SPEC.json`` recording the
    boundaries — so ``read_range`` prunes whole partitions from the
    spec alone before touching a file. The storage layout for
    time/score-scan-heavy corpora: a scan of 1% of the value range
    reads ~1% of the files, where hash bucketing (``write_bucketed``)
    would read all of them.

    Split points are approximate (sketch rank error → partition sizes
    wobble), but PRUNING is exact: rows are labeled by ``searchsorted``
    against the committed boundaries, and ``read_range`` selects
    partitions with the same arithmetic on the same boundaries. Null
    ``col`` rows land in their own hive partition (never matched by a
    range read). Spec commit is write-then-rename; a torn write leaves
    no readable spec and the directory is re-creatable."""
    from .aggregate import bucketize_by_quantile
    from .asof import _schema_of

    if col not in _schema_of(ds).names:
        raise ValueError(f"write_range_clustered: no column {col!r}")
    if overwrite and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    labeled, bounds = bucketize_by_quantile(ds, col, num_partitions,
                                            method=method, k=k,
                                            out_col="__rpart")
    labeled.write_parquet(out_dir, partition_cols=["__rpart"])
    spec = {"col": col, "bounds": [float(b) for b in bounds],
            "num_partitions": int(num_partitions)}
    tmp = os.path.join(out_dir, _RANGE_SPEC + ".tmp")
    with open(tmp, "w") as f:
        json.dump(spec, f)
    os.replace(tmp, os.path.join(out_dir, _RANGE_SPEC))
    return spec


def read_range(out_dir: str, lo=None, hi=None, *,
               columns: list[str] | None = None):
    """Read a range-clustered layout, pruning every partition whose
    value range cannot intersect ``[lo, hi]`` (closed; ``None`` =
    unbounded) BEFORE any file I/O, then applying the exact row filter
    inside. Returns ``(dataset, stats)`` with
    ``stats = {"partitions_read": r, "partitions_total": t}`` so callers
    (and tests) can assert the prune actually happened."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    with open(os.path.join(out_dir, _RANGE_SPEC)) as f:
        spec = json.load(f)
    col = spec["col"]
    if columns is not None and col not in columns:
        raise ValueError(f"columns= must include the clustering column "
                         f"{col!r} (the exact row filter needs it)")
    bounds = np.asarray(spec["bounds"], dtype=np.float64)
    total = int(spec["num_partitions"])
    # partition p holds rows with searchsorted(bounds, v, 'right') == p
    p_lo = int(np.searchsorted(bounds, float(lo), side="right")) \
        if lo is not None else 0
    p_hi = int(np.searchsorted(bounds, float(hi), side="right")) \
        if hi is not None else total - 1
    import glob

    dirs = [os.path.join(out_dir, f"__rpart={p}")
            for p in range(p_lo, p_hi + 1)]
    dirs = [d for d in dirs if os.path.isdir(d)]
    stats = {"partitions_read": len(dirs), "partitions_total": total}
    files = sorted(f for d in dirs
                   for f in glob.glob(os.path.join(d, "*.parquet")))
    if not files:
        return None, stats
    ds = ray.data.read_parquet(files, columns=columns)

    def exact(t: pa.Table) -> pa.Table:
        if "__rpart" in t.column_names:  # hive key, if the reader kept it
            t = t.drop_columns(["__rpart"])
        mask = pc.is_valid(t.column(col))
        if lo is not None:
            mask = pc.and_(mask, pc.greater_equal(t.column(col), lo))
        if hi is not None:
            mask = pc.and_(mask, pc.less_equal(t.column(col), hi))
        return t.filter(mask)

    return ds.map_batches(exact, batch_format="pyarrow"), stats
