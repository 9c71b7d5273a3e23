"""Multimodal (image/audio/video) actor-pool stages.

Binary payloads are opaque ``large_binary`` columns with typed metadata
columns beside them (``media_type``, ``width``/``height``/``duration_ms``).
The Ray-side plumbing — schema handling, small-batch sizing for large
payloads, actor signatures, output layout — is real and tested, and so
is the codec work for every format decodable with stdlib+numpy alone
(``functions/codecs.py``): PNG (zlib + row unfiltering), BMP, PPM/PGM,
PCM WAV, and concatenated-PPM "video" streams. Pillow, when installed,
extends image coverage (JPEG etc.). Payloads outside that envelope fall
back to a clearly-marked deterministic stub (``decoder`` column =
``"stub"``), or raise ``NotImplementedError`` under ``strict=True``.

Usage shape (note the small batch_size — payload bytes × batch_size ×
concurrency must fit worker heaps):

    ds.map_batches(ImageDecodeStage(), batch_format="pyarrow",
                   batch_size=32, concurrency=(2, 8), num_cpus=1)

Per-payload Python loops are intentional here: media decode is
inherently per-item work; parallelism comes from the actor pool, and
each item's heavy lifting (zlib, numpy reshapes, FFT) is C-speed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions import codecs


def _try_pillow():
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def _decode_any(payload: bytes, pil) -> tuple[np.ndarray, str] | None:
    """Decoded (h, w, c) uint8 pixels + decoder name, or None."""
    if pil is not None:
        try:
            import io

            img = pil.open(io.BytesIO(payload))
            return np.asarray(img.convert("RGB")), "pillow"
        except Exception:
            pass
    return codecs.decode_image(payload or b"")


class ImageDecodeStage:
    """binary image → (height, width, channels, pixels_hash, decoder).

    PNG/BMP/PPM decode for real with the pure codecs (Pillow first when
    available); ``pixels_hash`` is then a digest of the DECODED pixel
    bytes — format-independent content identity. Undecodable payloads:
    ``strict=True`` raises ``NotImplementedError``; otherwise a
    deterministic payload-digest stub fills the columns
    (``decoder="stub"``)."""

    def __init__(self, data_col: str = "data", *, strict: bool = False):
        self.data_col = data_col
        self.strict = strict
        self._pil = _try_pillow()

    def _fake_decode(self, payload: bytes) -> tuple[int, int, int]:
        d = hashlib.blake2b(payload or b"", digest_size=8).digest()
        return 16 + d[0] % 240, 16 + d[1] % 240, 3

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs, ws, cs, digest, deco = [], [], [], [], []
        for payload in batch.column(self.data_col).to_pylist():
            got = _decode_any(payload, self._pil)
            if got is not None:
                px, name = got
                h, w = px.shape[:2]
                c = px.shape[2] if px.ndim == 3 else 1
                dg = hashlib.blake2b(np.ascontiguousarray(px).tobytes(),
                                     digest_size=8).hexdigest()
            elif self.strict:
                raise NotImplementedError(
                    "payload is not a PNG/BMP/PPM (and Pillow is not "
                    "installed for other formats); strict=False uses the "
                    "deterministic stub")
            else:
                h, w, c = self._fake_decode(payload)
                dg = hashlib.blake2b(payload or b"", digest_size=8).hexdigest()
                name = "stub"
            hs.append(h)
            ws.append(w)
            cs.append(c)
            digest.append(dg)
            deco.append(name)
        return (batch.append_column("height", pa.array(hs, type=pa.int32()))
                     .append_column("width", pa.array(ws, type=pa.int32()))
                     .append_column("channels", pa.array(cs, type=pa.int32()))
                     .append_column("pixels_hash", pa.array(digest, type=pa.string()))
                     .append_column("decoder", pa.array(deco, type=pa.string())))


class ImageResizeStage:
    """Resize to (target, target): real nearest-neighbor resize on the
    decoded pixels, re-encoded as PNG (pure encoder). Undecodable
    payloads pass through unchanged with ``decoder="stub"``."""

    def __init__(self, target: int = 224, data_col: str = "data", *,
                 strict: bool = False):
        self.target = target
        self.data_col = data_col
        self.strict = strict
        self._pil = _try_pillow()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out, deco = [], []
        for payload in batch.column(self.data_col).to_pylist():
            got = _decode_any(payload, self._pil)
            if got is not None:
                px, name = got
                resized = codecs.resize_nearest(px, self.target, self.target)
                out.append(codecs.encode_png(resized))
                deco.append(name)
            elif self.strict:
                raise NotImplementedError(
                    "payload is not a PNG/BMP/PPM; cannot resize")
            else:
                out.append(payload)  # STUB: passthrough
                deco.append("stub")
        return (batch.set_column(batch.schema.get_field_index(self.data_col),
                                 self.data_col,
                                 pa.array(out, type=pa.large_binary()))
                     .append_column("resized_to", pa.array(
                         [self.target] * batch.num_rows, type=pa.int32()))
                     .append_column("decoder", pa.array(deco, type=pa.string())))


class AudioFeatureStage:
    """binary audio → feature vector + (duration_ms, sample_rate,
    n_channels) metadata.

    PCM WAV parses for real (stdlib): the vector is
    ``[rms, peak, zero_crossing_rate]`` + an ``n_features−3``-bin
    average-pooled magnitude spectrum (numpy rfft) of the mono mix.
    Non-WAV payloads get the deterministic digest stub
    (``decoder="stub"``, metadata nulls)."""

    def __init__(self, n_features: int = 16, data_col: str = "data", *,
                 strict: bool = False):
        if n_features < 4:
            raise ValueError("n_features must be >= 4")
        self.n = n_features
        self.data_col = data_col
        self.strict = strict

    def _wav_features(self, payload: bytes):
        rate, nch, x = codecs.parse_wav(payload)
        mono = x.mean(axis=1)
        n = len(mono)
        rms = float(np.sqrt((mono ** 2).mean())) if n else 0.0
        peak = float(np.abs(mono).max()) if n else 0.0
        zcr = float((np.diff(np.signbit(mono)) != 0).mean()) if n > 1 else 0.0
        nbins = self.n - 3
        # zero-frame WAVs are valid; rfft rejects n == 0
        spec = np.abs(np.fft.rfft(mono)) if n else np.zeros(0)
        if len(spec) >= nbins:
            pooled = spec[: len(spec) // nbins * nbins].reshape(nbins, -1).mean(axis=1)
        else:
            pooled = np.concatenate([spec, np.zeros(nbins - len(spec))])
        mx = pooled.max()
        if mx > 0:
            pooled = pooled / mx
        feats = [rms, peak, zcr] + [float(v) for v in pooled]
        return feats, float(n / rate * 1000.0), rate, nch

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, dur, rate, nch, deco = [], [], [], [], []
        for payload in batch.column(self.data_col).to_pylist():
            if codecs.sniff(payload or b"") == "wav":
                f, d, r, c = self._wav_features(payload)
                feats.append(f)
                dur.append(d)
                rate.append(r)
                nch.append(c)
                deco.append("pure-wav")
            elif self.strict:
                raise NotImplementedError("payload is not a PCM WAV")
            else:
                d8 = hashlib.blake2b(payload or b"", digest_size=self.n).digest()
                feats.append((np.frombuffer(d8, dtype=np.uint8)
                              .astype(np.float32) / 255.0).tolist())
                dur.append(None)
                rate.append(None)
                nch.append(None)
                deco.append("stub")
        return (batch.append_column("features",
                                    pa.array(feats, type=pa.list_(pa.float32())))
                     .append_column("duration_ms", pa.array(dur, type=pa.float64()))
                     .append_column("sample_rate", pa.array(rate, type=pa.int32()))
                     .append_column("n_channels", pa.array(nch, type=pa.int32()))
                     .append_column("decoder", pa.array(deco, type=pa.string())))


class VideoFrameSampleStage:
    """binary video → ``num_frames`` evenly-spaced frame digests.

    Concatenated-PPM streams parse for real: frames are split, evenly
    sampled, DECODED, and digested on pixel bytes (``n_frames`` column =
    total frames in the stream). Other containers fall back to the
    payload-window digest stub (``decoder="stub"``, ``n_frames`` null)."""

    def __init__(self, num_frames: int = 4, data_col: str = "data", *,
                 strict: bool = False):
        self.k = num_frames
        self.data_col = data_col
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        out, totals, deco = [], [], []
        for payload in batch.column(self.data_col).to_pylist():
            frames = None
            if payload and payload[:2] in (b"P6", b"P5"):
                try:
                    frames = codecs.split_ppm_stream(payload)
                except ValueError:
                    frames = None
            if frames is not None:
                idx = np.minimum((np.arange(self.k) * len(frames)) // self.k,
                                 len(frames) - 1)
                digests = [
                    hashlib.blake2b(
                        codecs.decode_ppm(frames[i]).tobytes(),
                        digest_size=8).hexdigest()
                    for i in idx
                ]
                out.append(digests)
                totals.append(len(frames))
                deco.append("pure-ppm-stream")
            elif self.strict:
                raise NotImplementedError("payload is not a PPM stream")
            else:
                p = payload or b"\x00"
                step = max(1, len(p) // self.k)
                out.append([
                    hashlib.blake2b(p[i * step:(i + 1) * step],
                                    digest_size=8).hexdigest()
                    for i in range(self.k)
                ])
                totals.append(None)
                deco.append("stub")
        return (batch.append_column("frame_hashes",
                                    pa.array(out, type=pa.list_(pa.string())))
                     .append_column("n_frames", pa.array(totals, type=pa.int32()))
                     .append_column("decoder", pa.array(deco, type=pa.string())))
