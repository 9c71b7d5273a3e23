#!/usr/bin/env python
"""Corpus-curation job, packaged for ``ray job submit``.

    ray job submit --working-dir . -- \
        python jobs/curate_docs_job.py \
        --input /data/documents --out /data/out/curated \
        [--eval /data/eval.parquet]

Runs the full training-data curation chain over a directory (or single
file) of document Parquet shards:

1. text stats + quality filter (min token count, max punctuation ratio);
2. Gopher-style repetition filter (top-token share, dup-n-gram fraction);
3. exact whole-document dedup (keep min doc_id per distinct text);
4. corpus-level line dedup (drop boilerplate lines occurring more than
   ``--line-threshold`` times corpus-wide);
5. optional benchmark decontamination against ``--eval`` (word
   ``--decontam-n``-grams, drop mode);
6. optional perplexity gate (``--ppl-drop-frac``): hashed-bigram LM
   trained on the surviving corpus, worst fraction dropped;
7. partitioned Parquet output + a JSON summary with lineage.

Every stage streams block-to-block; the only exchanges are the line /
content-hash aggregations the dedup stages need. The job is resumable at
job granularity: a committed ``_JOB_SUMMARY.json`` whose input signature
matches skips the whole run (the fine-grained per-partition resume story
lives in ``jobs/transcript_sketch_job.py`` + ``pipelines/materialize.py``).

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


def run(args) -> dict:
    import pyarrow.compute as pc

    from bloomjoin_ray.pipelines.dedup import dedup_lines, exact_dedup
    from bloomjoin_ray.pipelines.text import filter_repetitive, text_stats

    import ray

    files = input_files(args.input)
    if not files:
        raise SystemExit(f"no parquet under {args.input}")
    sig = input_signature(files)

    summary_path = os.path.join(args.out, "_JOB_SUMMARY.json")
    if os.path.exists(summary_path) and not args.force:
        with open(summary_path) as f:
            prev = json.load(f)
        if prev.get("input_signature") == sig:
            prev["resumed"] = True
            return prev

    t0 = time.time()
    ds = ray.data.read_parquet(files)
    n_input = ds.count()

    stats = text_stats(ds)

    def keep(t):
        return t.filter(pc.and_(
            pc.greater_equal(t["n_tokens"], args.min_tokens),
            pc.less_equal(t["punct_ratio"], args.max_punct_ratio)))

    filtered = filter_repetitive(
        stats.map_batches(keep, batch_format="pyarrow"),
        max_dup_line_frac=float("inf"),
        max_dup_line_char_frac=float("inf"),
        max_top_token_frac=args.max_top_token_frac,
        max_dup_ngram_frac=args.max_dup_ngram_frac)
    deduped = exact_dedup(filtered, "text", "doc_id")
    line_clean = dedup_lines(deduped.select_columns(["doc_id", "text"]),
                             threshold=args.line_threshold)

    stages = ["quality_filter", "repetition_filter", "exact_dedup",
              "line_dedup"]
    if args.eval:
        from bloomjoin_ray.pipelines.decontam import decontaminate

        ev = ray.data.read_parquet(args.eval)
        line_clean = decontaminate(line_clean, ev, n=args.decontam_n,
                                   mode="drop")
        stages.append(f"decontaminate(n={args.decontam_n})")

    out_data = os.path.join(args.out, "data")
    os.makedirs(out_data, exist_ok=True)
    # a torn earlier run may have left partial output; write_parquet
    # appends uniquely-named files, so stale ones must go first
    for fn in os.listdir(out_data):
        os.unlink(os.path.join(out_data, fn))
    ppl_threshold = None
    ppl_stage_resumed = ppl_counts_resumed = False
    if args.ppl_drop_frac > 0:
        # stage the survivors to parquet so the LM's training pass and
        # the two scoring passes re-read storage instead of re-executing
        # the whole curation chain per pass — and so a torn run resumes:
        # the staged survivors commit via a marker (write-then-commit)
        # and the trained counts persist via save_ngram_counts, so a
        # re-run after a mid-gate death re-executes ONLY the score pass
        from bloomjoin_ray.pipelines.aggregate import filter_by_quantile
        from bloomjoin_ray.pipelines.text import (load_ngram_counts,
                                                  ngram_perplexity,
                                                  save_ngram_counts,
                                                  train_ngram_counts)

        stage_dir = os.path.join(args.out, "pre_ppl")
        marker = os.path.join(args.out, "_PRE_PPL.json")
        stage_sig = [sig, args.min_tokens, args.max_punct_ratio,
                     args.max_top_token_frac, args.max_dup_ngram_frac,
                     args.line_threshold, args.eval or "", args.decontam_n]
        if os.path.exists(marker):
            with open(marker) as f:
                ppl_stage_resumed = json.load(f).get("sig") == stage_sig
        if not ppl_stage_resumed:
            # a stale/partial stage dir must not leak rows into the
            # re-write (write_parquet appends uniquely-named files)
            if os.path.isdir(stage_dir):
                for fn in os.listdir(stage_dir):
                    os.unlink(os.path.join(stage_dir, fn))
            os.makedirs(stage_dir, exist_ok=True)
            line_clean.write_parquet(stage_dir)
            tmp = marker + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"sig": stage_sig}, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, marker)
        staged = ray.data.read_parquet(stage_dir)
        buckets = 1 << 18
        counts_path = os.path.join(args.out, "ppl_counts.npz")
        counts_sig = [stage_sig, buckets]
        loaded = load_ngram_counts(counts_path, buckets=buckets,
                                   signature=counts_sig)
        if loaded is not None:
            uni, bi, _total = loaded
            ppl_counts_resumed = True
        else:
            uni, bi, total = train_ngram_counts(staged, buckets=buckets)
            save_ngram_counts(counts_path, uni, bi, total,
                              signature=counts_sig)
        scored = ngram_perplexity(staged, buckets=buckets,
                                  counts=(uni, bi))
        kept, ppl_threshold = filter_by_quantile(
            scored, "ppl", 1.0 - args.ppl_drop_frac, keep="le")
        kept.drop_columns(["ppl"]).write_parquet(out_data)
        stages.append(f"perplexity_gate(drop={args.ppl_drop_frac})")
    else:
        line_clean.write_parquet(out_data)
    n_output = ray.data.read_parquet(out_data).count()

    summary = {
        "job": "curate_docs",
        "stages": stages,
        "n_input": n_input,
        "n_output": n_output,
        "kept_frac": (n_output / n_input) if n_input else 0.0,
        "params": {
            "min_tokens": args.min_tokens,
            "max_punct_ratio": args.max_punct_ratio,
            "max_top_token_frac": args.max_top_token_frac,
            "max_dup_ngram_frac": args.max_dup_ngram_frac,
            "line_threshold": args.line_threshold,
            "ppl_drop_frac": args.ppl_drop_frac,
            "ppl_threshold": ppl_threshold,
        },
        "ppl_stage_resumed": ppl_stage_resumed,
        "ppl_counts_resumed": ppl_counts_resumed,
        "input_signature": sig,
        "out": out_data,
        "wall_sec": round(time.time() - t0, 3),
        "resumed": False,
    }
    tmp = summary_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(summary, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, summary_path)
    return summary


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[1])
    p.add_argument("--input", required=True,
                   help="documents parquet file or directory of shards")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--eval", default=None,
                   help="eval-set parquet for decontamination (optional)")
    p.add_argument("--min-tokens", type=int, default=20)
    p.add_argument("--max-punct-ratio", type=float, default=0.05)
    p.add_argument("--max-top-token-frac", type=float, default=0.15)
    p.add_argument("--max-dup-ngram-frac", type=float, default=0.06)
    p.add_argument("--line-threshold", type=int, default=1)
    p.add_argument("--decontam-n", type=int, default=5)
    p.add_argument("--ppl-drop-frac", type=float, default=0.0,
                   help="drop the worst FRAC of docs by hashed-bigram "
                        "LM perplexity (0 disables the gate)")
    p.add_argument("--force", action="store_true",
                   help="re-run even if a matching summary exists")
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
