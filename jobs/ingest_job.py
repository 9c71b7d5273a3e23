#!/usr/bin/env python
"""Incremental corpus-ingest job, packaged for ``ray job submit``.

    ray job submit --working-dir . -- \
        python jobs/ingest_job.py \
        --index /data/corpus_index --input /data/increments/day17 \
        --out /data/out/day17 [--mode exact|neardup] [--init]

Dedups one increment (a parquet file or directory of shards) against a
persisted corpus index WITHOUT re-reading the accepted corpus, writes
the surviving rows to ``--out/data``, and appends their
hashes/signatures to the index. ``--mode exact`` uses the 128-bit
content-hash index (``incremental_dedup``); ``--mode neardup`` the
MinHash band-row index (``incremental_neardup_dedup``, ``--threshold``
estimated-Jaccard). ``--init`` creates the index if missing.

Exactly-once semantics under any crash/retry, in three committed steps:

1. **Probe** (pure query, index untouched): survivors vs the CURRENT
   index generation are computed and staged to ``--out/data``, then an
   ``_OUT.json`` marker commits (write-then-rename) recording the input
   signature AND the index generation probed against.
2. **Append**: the staged survivors are re-ingested with
   ``update_index=True``; the input signature commits atomically WITH
   the new generation (it rides ``_INDEX.json``'s rename via
   ``commit_meta``).
3. **Summary**: ``_JOB_SUMMARY.json`` commits last.

A re-run therefore resolves any torn state: a matching signature in the
index spec means the append landed (output already staged — return the
summary, rebuilding it if step 3 tore); a matching ``_OUT.json`` at the
index's current generation means the probe landed — only the append
re-runs (survivors re-read from the staged output, which is dup-free
and all-new by construction, so the append is idempotent); anything
else re-runs from the probe against whatever generation is committed.
Orphan bucket files from a mid-append crash are invisible (generation
gate) or duplicate membership rows (harmless; ``compact_index``
reclaims).

This script owns its Ray session — library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def input_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.parquet")))
    return [path]


def input_signature(files: list[str]) -> list[list]:
    return [[f, os.path.getsize(f), int(os.path.getmtime(f))]
            for f in files]


def _commit_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def run(args) -> dict:
    import ray

    from bloomjoin_ray.pipelines.incremental import (
        incremental_dedup, incremental_neardup_dedup, init_corpus_index,
        init_neardup_index, read_index_spec)

    files = input_files(args.input)
    if not files:
        raise SystemExit(f"no parquet under {args.input}")
    sig = input_signature(files)
    t0 = time.time()

    spec_path = os.path.join(args.index, "_INDEX.json")
    if not os.path.exists(spec_path):
        if not args.init:
            raise SystemExit(f"no index at {args.index} (pass --init)")
        if args.mode == "exact":
            init_corpus_index(args.index, num_buckets=args.num_buckets,
                              bloom_capacity=args.bloom_capacity)
        else:
            init_neardup_index(args.index, num_buckets=args.num_buckets,
                               bloom_capacity=args.bloom_capacity)
    spec = read_index_spec(args.index)
    want_kind = "exact" if args.mode == "exact" else "neardup"
    if spec.get("kind", "exact") != want_kind:
        raise SystemExit(f"index kind {spec.get('kind')!r} != --mode "
                         f"{args.mode!r}")

    def ingest(ds, **kw):
        if args.mode == "exact":
            return incremental_dedup(ds, args.index, text_col=args.text_col,
                                     order_col=args.id_col, **kw)
        return incremental_neardup_dedup(ds, args.index,
                                         text_col=args.text_col,
                                         order_col=args.id_col,
                                         threshold=args.threshold, **kw)

    out_data = os.path.join(args.out, "data")
    out_marker = os.path.join(args.out, "_OUT.json")
    summary_path = os.path.join(args.out, "_JOB_SUMMARY.json")

    def summarize(n_out, probe_resumed, append_resumed):
        s = {"job": "ingest", "mode": args.mode, "index": args.index,
             "index_generation": read_index_spec(args.index)["generation"],
             "index_rows": read_index_spec(args.index)["rows"],
             "n_input": ray.data.read_parquet(files).count(),
             "n_survivors": n_out,
             "probe_resumed": probe_resumed,
             "append_resumed": append_resumed,
             "input_signature": sig, "out": out_data,
             "wall_sec": round(time.time() - t0, 3)}
        _commit_json(summary_path, s)
        return s

    # signature already committed WITH a generation → append landed
    if spec.get("last_ingest_sig") == sig and not args.force:
        n_out = (ray.data.read_parquet(out_data).count()
                 if os.path.isdir(out_data) and os.listdir(out_data) else 0)
        return summarize(n_out, probe_resumed=True, append_resumed=True)

    # step 1: probe (pure query) + stage survivors
    probe_ok = False
    if os.path.exists(out_marker) and not args.force:
        with open(out_marker) as f:
            m = json.load(f)
        probe_ok = (m.get("sig") == sig
                    and m.get("generation") == spec["generation"])
    if not probe_ok:
        os.makedirs(out_data, exist_ok=True)
        for fn in os.listdir(out_data):  # stale partial output
            os.unlink(os.path.join(out_data, fn))
        survivors = ingest(ray.data.read_parquet(files),
                           update_index=False).materialize()
        if survivors.count():
            survivors.write_parquet(out_data)
        _commit_json(out_marker, {"sig": sig,
                                  "generation": spec["generation"]})

    # step 2: append the staged survivors; sig commits with the gen
    staged_files = (sorted(glob.glob(os.path.join(out_data, "*.parquet")))
                    if os.path.isdir(out_data) else [])
    n_out = 0
    if staged_files:
        staged = ray.data.read_parquet(staged_files)
        n_out = staged.count()
        appended = ingest(staged, update_index=True,
                          commit_meta={"last_ingest_sig": sig}).count()
        if appended != n_out:
            raise SystemExit(
                f"append ingested {appended} of {n_out} staged survivors "
                "— staged output does not match the index generation")
    else:
        # zero survivors: still commit the signature (empty generation)
        import pyarrow as pa

        empty = ray.data.from_arrow(pa.table(
            {args.id_col: pa.array([], type=pa.int64()),
             args.text_col: pa.array([], type=pa.string())}))
        ingest(empty, update_index=True,
               commit_meta={"last_ingest_sig": sig}).materialize()

    return summarize(n_out, probe_resumed=probe_ok, append_resumed=False)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[1])
    p.add_argument("--index", required=True, help="corpus index directory")
    p.add_argument("--input", required=True,
                   help="increment parquet file or directory of shards")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--mode", choices=("exact", "neardup"), default="exact")
    p.add_argument("--init", action="store_true",
                   help="create the index if it does not exist")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--threshold", type=float, default=0.7,
                   help="neardup estimated-Jaccard threshold")
    p.add_argument("--num-buckets", type=int, default=64)
    p.add_argument("--bloom-capacity", type=int, default=1_000_000)
    p.add_argument("--force", action="store_true",
                   help="re-run the probe even if markers match")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        summary = run(args)
        print(json.dumps(summary))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
