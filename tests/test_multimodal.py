"""Multimodal actor-pool stages: Ray plumbing is real (schema, actor
signature, small-batch layout); decoding is a documented deterministic
stub in this container."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def media_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    payloads = [rng.bytes(1000 + i * 37) for i in range(40)]
    t = pa.table({
        "media_id": pa.array(range(40), type=pa.int64()),
        "media_type": pa.array(["image/png"] * 40),
        "data": pa.array(payloads, type=pa.large_binary()),
    })
    return rd.from_arrow(t).repartition(4), payloads


def test_image_decode_stage(media_ds):
    from bloomjoin_ray.stages.multimodal import ImageDecodeStage

    ds, payloads = media_ds
    out = ds.map_batches(ImageDecodeStage(), batch_format="pyarrow",
                         batch_size=8, concurrency=2).to_pandas()
    assert len(out) == 40
    assert set(out.columns) >= {"height", "width", "channels", "pixels_hash", "decoder"}
    assert (out["decoder"] == "stub").all()  # no Pillow in this container
    # deterministic: same payload → same dims
    again = ds.map_batches(ImageDecodeStage(), batch_format="pyarrow",
                           batch_size=8, concurrency=2).to_pandas()
    m = out.sort_values("media_id").reset_index(drop=True)
    a = again.sort_values("media_id").reset_index(drop=True)
    assert (m["pixels_hash"] == a["pixels_hash"]).all()


def test_image_decode_strict_raises():
    from bloomjoin_ray.stages.multimodal import ImageDecodeStage

    with pytest.raises(NotImplementedError, match="Pillow"):
        ImageDecodeStage(strict=True)


def test_resize_and_audio_and_video(media_ds):
    from bloomjoin_ray.stages.multimodal import (
        AudioFeatureStage,
        ImageResizeStage,
        VideoFrameSampleStage,
    )

    ds, _ = media_ds
    resized = ds.map_batches(ImageResizeStage(64), batch_format="pyarrow",
                             batch_size=8, concurrency=2).to_pandas()
    assert (resized["resized_to"] == 64).all()

    audio = ds.map_batches(AudioFeatureStage(8), batch_format="pyarrow",
                           batch_size=8, concurrency=2).to_pandas()
    assert all(len(f) == 8 for f in audio["features"])

    video = ds.map_batches(VideoFrameSampleStage(3), batch_format="pyarrow",
                           batch_size=8, concurrency=2).to_pandas()
    assert all(len(f) == 3 for f in video["frame_hashes"])
