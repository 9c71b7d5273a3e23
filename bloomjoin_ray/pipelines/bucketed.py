"""Bucket-aligned storage — pay the key exchange ONCE at write time,
then join/aggregate repeatedly with ZERO shuffle.

``write_bucketed`` lays a Dataset out as hive-partitioned parquet with
``__kbucket = hash_keys64(key_cols) % num_buckets`` (the engine's
canonical key hash, so co-location matches every other keyed stage) and
records the layout in ``_BUCKETS.json``. ``bucketed_join`` then joins
two layouts written with the SAME key spec by mapping one task per
bucket: each task reads both sides' ``__kbucket=i`` files and joins
in-process (Arrow's vectorized hash join) — no exchange, no
co-partitioning pass, and a failed run resumes per bucket. This is the
classic warehouse bucketing contract ("pick ONE partitioning key and
reuse it across stages"): at 100 TB the write-side exchange happens
once, while every downstream join of the same key is embarrassingly
parallel.

Deliberate envelope: one bucket pair must fit a task (size
``num_buckets`` to the data); join semantics are SQL (null keys never
match — unlike ``hash_join``'s dplyr ``na_matches="na"`` default);
key column types must match exactly on both sides (bucket co-location
uses the canonical cross-type hash, but the in-task equality is
Arrow's).
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np
import pyarrow as pa

from ..functions.keys import hash_keys64

_SPEC = "_BUCKETS.json"
_JOIN_TYPES = {"inner": "inner", "left": "left outer",
               "right": "right outer", "full": "full outer",
               "semi": "left semi", "anti": "left anti"}


def write_bucketed(ds, out_dir: str, key_cols: str | Sequence[str], *,
                   num_buckets: int = 64, overwrite: bool = False):
    """Write ``ds`` hash-bucketed by ``key_cols``. Returns the spec
    dict. The layout is plain hive-partitioned parquet
    (``__kbucket=i/``) readable by any engine; ``_BUCKETS.json``
    commits last (write-then-rename) so a torn write is never mistaken
    for a valid layout."""
    import shutil

    from .asof import _schema_of

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    schema = _schema_of(ds)
    missing = [c for c in key_cols if c not in schema.names]
    if missing:
        raise ValueError(f"write_bucketed: key columns {missing} not in "
                         f"schema {schema.names}")
    if overwrite and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)

    def tag(batch: pa.Table) -> pa.Table:
        b = (hash_keys64(batch, key_cols)
             % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("__kbucket", pa.array(b))

    ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["__kbucket"])
    spec = {"key_cols": key_cols, "num_buckets": num_buckets,
            "hash": "hash_keys64"}
    tmp = os.path.join(out_dir, f"{_SPEC}.tmp")
    with open(tmp, "w") as f:
        json.dump(spec, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(out_dir, _SPEC))
    return spec


def read_bucket_spec(out_dir: str) -> dict:
    path = os.path.join(out_dir, _SPEC)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{out_dir} is not a bucketed layout (missing {_SPEC}; "
            "was it written with write_bucketed?)")
    with open(path) as f:
        return json.load(f)


def _bucket_schema(out_dir: str) -> pa.Schema:
    """Data-file schema of a bucketed layout (partition column excluded
    — hive layout keeps it in the path, not the files)."""
    import pyarrow.parquet as pq

    for d in sorted(os.listdir(out_dir)):
        sub = os.path.join(out_dir, d)
        if d.startswith("__kbucket=") and os.path.isdir(sub):
            for fn in sorted(os.listdir(sub)):
                if fn.endswith(".parquet"):
                    return pq.read_schema(os.path.join(sub, fn))
    raise FileNotFoundError(f"no parquet buckets under {out_dir}")


def bucketed_join(dir_left: str, dir_right: str, *, how: str = "inner",
                  suffixes=("", "_right")):
    """Zero-exchange join of two bucket-aligned layouts: one task per
    bucket reads both sides' ``__kbucket=i`` files and joins them
    in-process with Arrow's hash join. Requires identical
    ``key_cols`` + ``num_buckets`` specs (validated) and identical key
    column types. Returns Dataset[left cols…, non-key right cols…]
    (colliding names get ``suffixes[1]``)."""
    import ray.data as rd

    if how not in _JOIN_TYPES:
        raise ValueError(f"how must be one of {sorted(_JOIN_TYPES)}")
    sl, sr = read_bucket_spec(dir_left), read_bucket_spec(dir_right)
    if sl["key_cols"] != sr["key_cols"] or \
            sl["num_buckets"] != sr["num_buckets"]:
        raise ValueError(
            f"bucket specs differ: left {sl} vs right {sr} — both sides "
            "must be written with the same key_cols and num_buckets")
    keys = sl["key_cols"]
    n = sl["num_buckets"]
    lsch, rsch = _bucket_schema(dir_left), _bucket_schema(dir_right)
    for k in keys:
        lt, rt = lsch.field(k).type, rsch.field(k).type
        if lt != rt:
            raise TypeError(
                f"key column {k!r} types differ ({lt} vs {rt}) — the "
                "in-task Arrow join needs exact type equality; cast "
                "before write_bucketed")

    def join_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out_tables = []
        for i in np.asarray(batch.column("bucket")):
            ld = os.path.join(dir_left, f"__kbucket={int(i)}")
            rdp = os.path.join(dir_right, f"__kbucket={int(i)}")
            lt = (pq.read_table(ld) if os.path.isdir(ld)
                  else lsch.empty_table())
            rt = (pq.read_table(rdp) if os.path.isdir(rdp)
                  else rsch.empty_table())
            out_tables.append(lt.join(
                rt, keys=keys, join_type=_JOIN_TYPES[how],
                left_suffix=suffixes[0], right_suffix=suffixes[1]))
        return pa.concat_tables(out_tables, promote_options="default")

    buckets = rd.from_items([{"bucket": i} for i in range(n)],
                            override_num_blocks=n)
    return buckets.map_batches(join_bucket, batch_format="pyarrow",
                               batch_size=1)


def bucketed_map_groups(layout_dir: str, fn, *,
                        columns: Sequence[str] | None = None):
    """Per-key grouped transform over a bucketed layout with ZERO
    shuffle — the grouped sibling of ``bucketed_join``, reusing the
    write-time exchange: one task per bucket reads its own files,
    re-segments by the REAL key (lexsorted 128-bit hash pair, same
    collision envelope as every packed reduce), and applies ``fn`` to
    each key's rows (a ``pa.Table`` → ``pa.Table`` / ``None``).

    ``columns`` prunes the per-bucket read (must keep the key columns).
    Key groups arrive in hash order, rows within a group in file order.
    Same envelope as ``bucketed_join``: one bucket must fit a task."""
    import ray.data as rd

    from .aggregate import _key_group_bounds

    spec = read_bucket_spec(layout_dir)
    keys, n = spec["key_cols"], spec["num_buckets"]
    if columns is not None:
        columns = list(columns)
        missing = [k for k in keys if k not in columns]
        if missing:
            raise ValueError(f"columns must include the layout's key "
                             f"columns; missing {missing}")

    def run_bucket(batch: pa.Table):
        import pyarrow.parquet as pq

        for i in np.asarray(batch.column("bucket")):
            d = os.path.join(layout_dir, f"__kbucket={int(i)}")
            if not os.path.isdir(d):
                continue
            t = pq.read_table(d, columns=columns)
            if t.num_rows == 0:
                continue
            order, bounds = _key_group_bounds(t, keys)
            t = t.take(pa.array(order))
            outs = []
            for a, b in zip(bounds[:-1], bounds[1:]):
                r = fn(t.slice(a, b - a))
                if r is not None and r.num_rows:
                    outs.append(r)
            if outs:
                yield pa.concat_tables(outs, promote_options="default")

    buckets = rd.from_items([{"bucket": i} for i in range(n)],
                            override_num_blocks=n)
    return buckets.map_batches(run_bucket, batch_format="pyarrow",
                               batch_size=1)
