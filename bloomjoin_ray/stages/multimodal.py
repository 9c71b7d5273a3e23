"""Multimodal (image/audio/video) actor-pool stages.

Binary payloads are opaque ``large_binary`` columns with typed metadata
columns beside them (``media_type``, ``width``/``height``/``duration_ms``).
The Ray-side plumbing — schema handling, small-batch sizing for large
payloads, actor signatures, output layout — is real and tested; the codec
work itself is STUBBED because this container ships no image/audio
libraries: each stage tries its optional dependency in ``__init__`` and
otherwise uses a clearly-marked deterministic fake (or raises
``NotImplementedError`` in ``strict`` mode).

Usage shape (note the small batch_size — payload bytes × batch_size ×
concurrency must fit worker heaps):

    ds.map_batches(ImageDecodeStage(), batch_format="pyarrow",
                   batch_size=32, concurrency=(2, 8), num_cpus=1)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class ImageDecodeStage:
    """binary image → (height, width, channels, pixels_hash) columns.

    With Pillow installed, decodes for real; otherwise a deterministic
    fake derives dims from a payload digest (STUB — marked in the
    ``decoder`` column)."""

    def __init__(self, data_col: str = "data", *, strict: bool = False):
        self.data_col = data_col
        try:
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            if strict:
                raise NotImplementedError(
                    "image decode requires Pillow, which this environment "
                    "does not ship; run with strict=False for the "
                    "deterministic stub")
            self._pil = None

    def _fake_decode(self, payload: bytes) -> tuple[int, int, int]:
        d = hashlib.blake2b(payload or b"", digest_size=8).digest()
        return 16 + d[0] % 240, 16 + d[1] % 240, 3

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs, ws, cs, digest = [], [], [], []
        for payload in batch.column(self.data_col).to_pylist():
            if self._pil is not None:
                import io

                img = self._pil.open(io.BytesIO(payload))
                w, h = img.size
                c = len(img.getbands())
            else:
                h, w, c = self._fake_decode(payload)
            hs.append(h)
            ws.append(w)
            cs.append(c)
            digest.append(hashlib.blake2b(payload or b"", digest_size=8).hexdigest())
        return (batch.append_column("height", pa.array(hs, type=pa.int32()))
                     .append_column("width", pa.array(ws, type=pa.int32()))
                     .append_column("channels", pa.array(cs, type=pa.int32()))
                     .append_column("pixels_hash", pa.array(digest, type=pa.string()))
                     .append_column("decoder", pa.array(
                         ["pillow" if self._pil else "stub"] * batch.num_rows)))


class ImageResizeStage:
    """Resize to (target, target): real with Pillow, else passthrough stub
    that records the intended output dims."""

    def __init__(self, target: int = 224, data_col: str = "data"):
        self.target = target
        self.data_col = data_col
        try:
            from PIL import Image

            self._pil = Image
        except ImportError:
            self._pil = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch.column(self.data_col).to_pylist():
            if self._pil is not None:
                import io

                img = self._pil.open(io.BytesIO(payload)).resize(
                    (self.target, self.target))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                out.append(buf.getvalue())
            else:
                out.append(payload)  # STUB: passthrough
        return (batch.set_column(batch.schema.get_field_index(self.data_col),
                                 self.data_col,
                                 pa.array(out, type=pa.large_binary()))
                     .append_column("resized_to", pa.array(
                         [self.target] * batch.num_rows, type=pa.int32())))


class AudioFeatureStage:
    """binary audio → deterministic feature vector (STUB: blake2b-derived
    pseudo-features standing in for e.g. mel spectrogram stats)."""

    def __init__(self, n_features: int = 16, data_col: str = "data"):
        self.n = n_features
        self.data_col = data_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch.column(self.data_col).to_pylist():
            d = hashlib.blake2b(payload or b"", digest_size=self.n).digest()
            feats.append((np.frombuffer(d, dtype=np.uint8).astype(np.float32)
                          / 255.0).tolist())
        return batch.append_column(
            "features", pa.array(feats, type=pa.list_(pa.float32())))


class VideoFrameSampleStage:
    """binary video → k evenly-spaced frame digests (STUB: slices the
    payload into k windows and digests each, standing in for frame
    extraction)."""

    def __init__(self, num_frames: int = 4, data_col: str = "data"):
        self.k = num_frames
        self.data_col = data_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames = []
        for payload in batch.column(self.data_col).to_pylist():
            p = payload or b"\x00"
            step = max(1, len(p) // self.k)
            frames.append([
                hashlib.blake2b(p[i * step:(i + 1) * step], digest_size=8).hexdigest()
                for i in range(self.k)
            ])
        return batch.append_column(
            "frame_hashes", pa.array(frames, type=pa.list_(pa.string())))
