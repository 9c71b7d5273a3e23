#!/usr/bin/env python
"""The flagship transcript job, packaged for ``ray job submit``.

    ray job submit --working-dir . -- \
        python jobs/transcript_sketch_job.py \
        --input /data/transcripts --out /data/out/job1

Runs the north-star pipeline over a directory of transcript Parquet
shards with per-partition checkpointing:

1. checkpointed per-shard sketch build (HLL distinct turns + CMS tool
   frequencies + t-digest text lengths in one pass per shard), resumable
   via ``<out>/sketches/manifest.jsonl``;
2. Bloom-prefiltered join of the transcripts against a conv lookup
   (``--lookup`` Parquet with a conv_id column), written as partitioned
   Parquet;
3. a JSON results summary with estimates + lineage.

Standalone execution (no cluster) initializes a local Ray session itself;
under ``ray job submit`` the session comes from the cluster. This script
owns its session — library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_tri_sketch():
    from bloomjoin_ray.state.cms import CountMinSketch
    from bloomjoin_ray.state.hll import HllSketch
    from bloomjoin_ray.state.tdigest import TDigest

    class TriSketch:
        """One mergeable state bundle per partition (serialized as the
        concatenation of the three sketch blobs with a length header)."""

        def __init__(self):
            self.hll = HllSketch(14)
            self.cms = CountMinSketch(5, 4096)
            self.td = TDigest(200)

        def merge(self, other):
            self.hll.merge(other.hll)
            self.cms.merge(other.cms)
            self.td.merge(other.td)
            return self

        def to_bytes(self) -> bytes:
            import struct

            parts = [s.to_bytes() for s in (self.hll, self.cms, self.td)]
            return b"".join(struct.pack("<Q", len(p)) + p for p in parts)

        @classmethod
        def from_bytes(cls, blob: bytes):
            import struct

            from bloomjoin_ray.state.base import sketch_from_bytes

            obj = cls.__new__(cls)
            off = 0
            out = []
            while off < len(blob):
                (ln,) = struct.unpack_from("<Q", blob, off)
                off += 8
                out.append(sketch_from_bytes(blob[off : off + ln]))
                off += ln
            obj.hll, obj.cms, obj.td = out
            return obj

    return TriSketch


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir of transcript parquet shards")
    ap.add_argument("--lookup", default=None, help="parquet with conv_id column")
    ap.add_argument("--out", required=True)
    ap.add_argument("--fpr", type=float, default=1e-3)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from bloomjoin_ray.functions.keys import hash_keys64
    from bloomjoin_ray.pipelines.checkpoint import checkpointed_sketch_aggregate
    from bloomjoin_ray.pipelines.join import bloom_join

    TriSketch = build_tri_sketch()

    def update(s, t: pa.Table):
        s.hll.update_batch(hash_keys64(t, ["conv_id", "turn_idx"]))
        tools = t.filter(pc.is_valid(t["tool"]))
        if tools.num_rows:
            s.cms.update_batch(hash_keys64(tools, ["tool"]))
        s.td.update_batch(np.asarray(pc.utf8_length(t["text"]).cast(pa.float64())))

    t0 = time.time()
    shards = sorted(
        os.path.join(args.input, f)
        for f in os.listdir(args.input) if f.endswith(".parquet"))
    merged, records = checkpointed_sketch_aggregate(
        shards, os.path.join(args.out, "sketches"), TriSketch, update,
        columns=["conv_id", "turn_idx", "tool", "text"],
        from_bytes=TriSketch.from_bytes)
    sketch_sec = time.time() - t0

    result = {
        "turns": int(sum(r["rows"] for r in records)),
        "partitions": len(records),
        "distinct_turns_est": merged.hll.estimate(),
        "tool_events": merged.cms.total,
        "text_len_p50": float(merged.td.quantile(0.5)),
        "text_len_p95": float(merged.td.quantile(0.95)),
        "sketch_sec": round(sketch_sec, 2),
    }

    if args.lookup:
        t0 = time.time()
        transcripts = rd.read_parquet(args.input)
        lookup = rd.read_parquet(args.lookup)
        ds, report = bloom_join(transcripts, lookup, "conv_id", "inner",
                                fpr=args.fpr)
        ds.write_parquet(os.path.join(args.out, "joined"))
        report.finalize()
        result["join"] = {k: v for k, v in report.to_dict().items() if v is not None}
        result["join_sec"] = round(time.time() - t0, 2)

    with open(os.path.join(args.out, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
