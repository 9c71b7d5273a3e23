"""Multimodal stages: pure stdlib+numpy codecs (PNG/BMP/PPM/WAV) are real;
payloads outside that envelope use the documented deterministic stub."""

import hashlib
import io
import struct
import wave
import zlib

import numpy as np
import pyarrow as pa
import pytest

from bloomjoin_ray.functions import codecs


def _rand_img(h, w, c, seed=7):
    return np.random.default_rng(seed).integers(0, 256, (h, w, c)).astype(np.uint8)


# ------------------------------------------------------------- codecs ----

def test_png_roundtrip_all_channel_counts():
    for c in (1, 2, 3, 4):
        img = _rand_img(13, 9, c, seed=c)
        assert (codecs.decode_png(codecs.encode_png(img)) == img).all()


def test_png_all_row_filters_decode():
    """Forward-filter a known image with every PNG filter type, then check
    the decoder reconstructs it exactly."""
    img = _rand_img(5, 7, 3, seed=11)
    h, w, c = img.shape
    flat = img.reshape(h, w * c).astype(np.int64)

    def paeth(a, b, cc):
        p = a + b - cc
        pa_, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if pa_ <= pb and pa_ <= pc else (b if pb <= pc else cc)

    lines = []
    for y in range(h):
        f = y % 5
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * c, np.int64)
        enc = np.empty(w * c, np.int64)
        for x in range(w * c):
            left = cur[x - c] if x >= c else 0
            up = prev[x]
            ul = prev[x - c] if x >= c else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) // 2,
                    4: paeth(left, up, ul)}[f]
            enc[x] = (cur[x] - pred) % 256
        lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())
    raw = zlib.compress(b"".join(lines))

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", raw) + chunk(b"IEND", b""))
    assert (codecs.decode_png(png) == img).all()


def test_bmp_decode_bottom_up_24bit():
    img = _rand_img(4, 3, 3, seed=3)
    h, w, _ = img.shape
    stride = ((w * 3 + 3) // 4) * 4
    rows = []
    for y in range(h - 1, -1, -1):          # bottom-up
        row = img[y][:, ::-1].tobytes()     # RGB→BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    px = b"".join(rows)
    header = (b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px),
                            2835, 2835, 0, 0))
    assert (codecs.decode_bmp(header + px) == img).all()


def test_ppm_roundtrip_and_comment_header():
    img = _rand_img(6, 5, 3)
    assert (codecs.decode_ppm(codecs.encode_ppm(img)) == img).all()
    with_comment = b"P6\n# a comment\n5 6\n255\n" + img.tobytes()
    assert (codecs.decode_ppm(with_comment) == img).all()


def test_ppm_stream_split():
    frames = [_rand_img(4, 4, 3, seed=s) for s in range(5)]
    stream = b"".join(codecs.encode_ppm(f) for f in frames)
    parts = codecs.split_ppm_stream(stream)
    assert len(parts) == 5
    assert all((codecs.decode_ppm(p) == f).all()
               for p, f in zip(parts, frames))


def _wav_bytes(freq=440.0, rate=8000, dur_s=0.25, amp=0.5):
    t = np.arange(int(rate * dur_s)) / rate
    x = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def test_wav_parse_and_sine_rms():
    b = _wav_bytes(amp=0.5)
    rate, nch, x = codecs.parse_wav(b)
    assert (rate, nch) == (8000, 1)
    assert abs(np.sqrt((x ** 2).mean()) - 0.5 / np.sqrt(2)) < 0.01


def test_resize_nearest_shapes():
    img = _rand_img(10, 20, 3)
    out = codecs.resize_nearest(img, 5, 4)
    assert out.shape == (5, 4, 3)
    assert (out == img[::2][:, ::5]).all()


# ----------------------------------------------------------- Ray stages ----

@pytest.fixture(scope="module")
def media_ds(ray_session):
    """Mixed media: real PNGs + undecodable garbage payloads."""
    import ray.data as rd

    rng = np.random.default_rng(5)
    imgs = [_rand_img(8 + i % 5, 6 + i % 3, 3, seed=i) for i in range(20)]
    payloads = [codecs.encode_png(im) for im in imgs]
    payloads += [rng.bytes(1000 + i * 37) for i in range(20)]
    t = pa.table({
        "media_id": pa.array(range(40), type=pa.int64()),
        "media_type": pa.array(["image/png"] * 20 + ["application/octet-stream"] * 20),
        "data": pa.array(payloads, type=pa.large_binary()),
    })
    return rd.from_arrow(t).repartition(4), imgs


def test_image_decode_stage_real_and_stub(media_ds):
    from bloomjoin_ray.stages.multimodal import ImageDecodeStage

    ds, imgs = media_ds
    out = ds.map_batches(ImageDecodeStage(), batch_format="pyarrow",
                         batch_size=8, concurrency=2).to_pandas()
    out = out.sort_values("media_id").reset_index(drop=True)
    assert len(out) == 40
    real = out.iloc[:20]
    assert (real["decoder"] == "pure-png").all()
    for i, im in enumerate(imgs):
        assert (real.loc[i, "height"], real.loc[i, "width"]) == im.shape[:2]
        assert real.loc[i, "pixels_hash"] == hashlib.blake2b(
            im.tobytes(), digest_size=8).hexdigest()
    assert (out.iloc[20:]["decoder"] == "stub").all()


def test_image_decode_strict_raises_on_garbage(ray_session):
    import ray.data as rd

    from bloomjoin_ray.stages.multimodal import ImageDecodeStage

    stage = ImageDecodeStage(strict=True)
    bad = pa.table({"data": pa.array([b"not an image"], type=pa.large_binary())})
    with pytest.raises(Exception, match="strict=False|NotImplemented"):
        rd.from_arrow(bad).map_batches(stage, batch_format="pyarrow").to_pandas()


def test_resize_stage_reencodes_png(media_ds):
    from bloomjoin_ray.stages.multimodal import ImageResizeStage

    ds, imgs = media_ds
    out = ds.map_batches(ImageResizeStage(16), batch_format="pyarrow",
                         batch_size=8, concurrency=2).to_pandas()
    out = out.sort_values("media_id").reset_index(drop=True)
    assert (out["resized_to"] == 16).all()
    px = codecs.decode_png(out.loc[0, "data"])
    assert px.shape == (16, 16, 3)
    assert (px == codecs.resize_nearest(imgs[0], 16, 16)).all()
    assert (out.iloc[20:]["decoder"] == "stub").all()   # passthrough


def test_audio_stage_real_wav_features(ray_session):
    import ray.data as rd

    from bloomjoin_ray.stages.multimodal import AudioFeatureStage

    t = pa.table({
        "media_id": pa.array([0, 1], type=pa.int64()),
        "data": pa.array([_wav_bytes(amp=0.5), b"garbage"], type=pa.large_binary()),
    })
    out = (rd.from_arrow(t)
           .map_batches(AudioFeatureStage(8), batch_format="pyarrow")
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    assert out.loc[0, "decoder"] == "pure-wav"
    assert abs(out.loc[0, "duration_ms"] - 250.0) < 1.0
    assert out.loc[0, "sample_rate"] == 8000
    feats = out.loc[0, "features"]
    assert len(feats) == 8
    assert abs(feats[0] - 0.5 / np.sqrt(2)) < 0.01      # rms
    assert out.loc[1, "decoder"] == "stub"


def test_video_stage_ppm_stream(ray_session):
    import ray.data as rd

    from bloomjoin_ray.stages.multimodal import VideoFrameSampleStage

    frames = [_rand_img(4, 4, 3, seed=s) for s in range(6)]
    stream = b"".join(codecs.encode_ppm(f) for f in frames)
    t = pa.table({
        "media_id": pa.array([0, 1], type=pa.int64()),
        "data": pa.array([stream, b"\x01\x02\x03"], type=pa.large_binary()),
    })
    out = (rd.from_arrow(t)
           .map_batches(VideoFrameSampleStage(3), batch_format="pyarrow")
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    assert out.loc[0, "decoder"] == "pure-ppm-stream"
    assert out.loc[0, "n_frames"] == 6
    want = [hashlib.blake2b(frames[i].tobytes(), digest_size=8).hexdigest()
            for i in (0, 2, 4)]
    assert list(out.loc[0, "frame_hashes"]) == want
    assert out.loc[1, "decoder"] == "stub"
    assert len(out.loc[1, "frame_hashes"]) == 3


def test_audio_stage_zero_frame_wav(ray_session):
    """A valid zero-frame PCM WAV must not crash the rfft (ADVICE r2)."""
    import ray.data as rd

    from bloomjoin_ray.stages.multimodal import AudioFeatureStage

    t = pa.table({
        "media_id": pa.array([0], type=pa.int64()),
        "data": pa.array([_wav_bytes(dur_s=0.0)], type=pa.large_binary()),
    })
    out = (rd.from_arrow(t)
           .map_batches(AudioFeatureStage(8), batch_format="pyarrow")
           .to_pandas())
    assert out.loc[0, "decoder"] == "pure-wav"
    assert out.loc[0, "duration_ms"] == 0.0
    assert list(out.loc[0, "features"]) == [0.0] * 8
