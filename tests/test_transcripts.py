"""Transcript generator: input_hint schema, determinism independent of
batching, Zipf skew, per-turn text equality under stable ordering."""

import numpy as np
import pyarrow as pa
import pytest

from bloomjoin_ray.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_turns_table,
    transcripts_dataset,
    turns_per_conv,
)


def test_schema_matches_input_hint():
    t = generate_turns_table(np.arange(10))
    assert t.schema.equals(TRANSCRIPT_SCHEMA)


def test_deterministic_and_batch_independent():
    whole = generate_turns_table(np.arange(50))
    parts = pa.concat_tables([
        generate_turns_table(np.arange(0, 17)),
        generate_turns_table(np.arange(17, 31)),
        generate_turns_table(np.arange(31, 50)),
    ])
    assert whole.equals(parts)  # pure function of (conv, turn)


def test_zipf_skew_hot_convs_exist():
    n = turns_per_conv(np.arange(20_000), seed=42)
    assert n.min() >= 2
    assert n.max() > 20 * np.median(n)  # heavy tail


def test_ts_monotone_within_conv():
    t = generate_turns_table(np.arange(30)).to_pandas()
    for _, g in t.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        assert g["ts"].is_monotonic_increasing


def test_tool_column_skewed_nullable():
    t = generate_turns_table(np.arange(300)).to_pandas()
    vc = t["tool"].value_counts()
    assert t["tool"].isna().mean() > 0.5  # mostly null
    assert vc.iloc[0] > 3 * vc.iloc[len(vc) // 2]  # heavy hitters


def test_dataset_roundtrip_preserves_turn_text(ray_session, tmp_path):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering
    after an engine round-trip (the input_hint invariant)."""
    import ray.data as rd

    ds = transcripts_dataset(200, parallelism=8)
    out_dir = str(tmp_path / "t")
    ds.write_parquet(out_dir)
    back = rd.read_parquet(out_dir).to_pandas()
    back = back.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    ref = generate_turns_table(np.arange(200)).to_pandas()
    ref = ref.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (back["text"] == ref["text"]).all()
    assert len(back) == len(ref)
