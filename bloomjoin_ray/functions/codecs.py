"""Pure stdlib+numpy media codecs for the multimodal stages.

This container ships no image/audio libraries, but several real formats
need none: PNG is zlib (stdlib) + per-row unfiltering, BMP and PPM are
header + raw pixels, WAV is RIFF + PCM (stdlib ``wave``). These codecs
make the multimodal stages' decode work REAL for those formats — Pillow,
when present, is still preferred (it covers JPEG etc.); everything else
falls back to the stages' clearly-marked stubs.

Scope (documented, raise ``ValueError`` outside it):

* PNG: 8-bit, non-interlaced, color types 0/2/4/6, all five row filters.
* BMP: uncompressed BITMAPINFOHEADER, 24/32-bit, top-down or bottom-up.
* PPM/PGM: binary P6/P5, maxval ≤ 255, ``#`` comments.
* WAV: PCM 8/16-bit, any rate/channels.

Decoded images are ``np.uint8`` arrays of shape (h, w, channels).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff(payload: bytes) -> str | None:
    """Best-effort container sniff: 'png' | 'bmp' | 'ppm' | 'wav' | None."""
    if not payload:
        return None
    if payload.startswith(_PNG_SIG):
        return "png"
    if payload.startswith(b"BM") and len(payload) >= 54:
        return "bmp"
    if payload[:2] in (b"P6", b"P5"):
        return "ppm"
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return "wav"
    return None


# ------------------------------------------------------------------ PNG ----

def decode_png(b: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG. Handles every row filter:
    none/up are fully vectorized, sub is a per-row cumsum, average/paeth
    walk pixels within the row (numpy per channel)."""
    if not b.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos:pos + 4])
        typ = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    try:
        channels = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    except KeyError:
        raise ValueError(f"unsupported PNG color type {ctype}") from None
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    rows = raw.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = rows[y, 1:].astype(np.int64)
        f = int(ftypes[y])
        if f == 0:
            rec = cur
        elif f == 1:    # sub: + left → per-row cumsum over pixel stride
            rec = np.cumsum(cur.reshape(w, channels), axis=0).reshape(stride) % 256
        elif f == 2:    # up
            rec = (cur + prev) % 256
        elif f == 3:    # average
            rec = cur.copy()
            for x in range(w):
                lo = x * channels
                left = rec[lo - channels:lo] if x else np.zeros(channels, np.int64)
                up = prev[lo:lo + channels]
                rec[lo:lo + channels] = (cur[lo:lo + channels]
                                         + (left + up) // 2) % 256
        elif f == 4:    # paeth
            rec = cur.copy()
            for x in range(w):
                lo = x * channels
                a = rec[lo - channels:lo] if x else np.zeros(channels, np.int64)
                bb = prev[lo:lo + channels]
                c = prev[lo - channels:lo] if x else np.zeros(channels, np.int64)
                p = a + bb - c
                pa_, pb, pc = np.abs(p - a), np.abs(p - bb), np.abs(p - c)
                pred = np.where((pa_ <= pb) & (pa_ <= pc), a,
                                np.where(pb <= pc, bb, c))
                rec[lo:lo + channels] = (cur[lo:lo + channels] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter {f}")
        prev = rec
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, channels)


def encode_png(arr: np.ndarray) -> bytes:
    """Encode (h, w[, c]) uint8 → PNG (filter 0 rows, one IDAT)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    rows = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * c)], axis=1)
    comp = zlib.compress(rows.tobytes(), 6)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp)
            + chunk(b"IEND", b""))


# ------------------------------------------------------------------ BMP ----

def decode_bmp(b: bytes) -> np.ndarray:
    """Decode uncompressed 24/32-bit BMP → (h, w, 3|4) RGB(A) uint8."""
    if b[:2] != b"BM" or len(b) < 54:
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", b[10:14])
    w, hgt = struct.unpack("<ii", b[18:26])
    (bpp,) = struct.unpack("<H", b[28:30])
    (compression,) = struct.unpack("<I", b[30:34])
    if compression != 0 or bpp not in (24, 32) or w <= 0:
        raise ValueError("only uncompressed 24/32-bit BMP supported")
    nch = bpp // 8
    stride = ((w * nch + 3) // 4) * 4
    h = abs(hgt)
    data = np.frombuffer(b, dtype=np.uint8, count=stride * h,
                         offset=off).reshape(h, stride)
    px = data[:, :w * nch].reshape(h, w, nch)
    if hgt > 0:           # bottom-up storage
        px = px[::-1]
    px = px[..., ::-1] if nch == 3 else px[..., [2, 1, 0, 3]]  # BGR(A)→RGB(A)
    return np.ascontiguousarray(px)


# ------------------------------------------------------------- PPM/PGM ----

def _ppm_header(b: bytes):
    """Parse magic, width, height, maxval; return (magic, w, h, data_off)."""
    tokens, pos = [], 2
    if b[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    while len(tokens) < 3:
        while pos < len(b) and b[pos:pos + 1].isspace():
            pos += 1
        if b[pos:pos + 1] == b"#":
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("only maxval<=255 PPM supported")
    return b[:2], w, h, pos


def decode_ppm(b: bytes) -> np.ndarray:
    magic, w, h, off = _ppm_header(b)
    nch = 3 if magic == b"P6" else 1
    px = np.frombuffer(b, dtype=np.uint8, count=h * w * nch, offset=off)
    return px.reshape(h, w, nch).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c == 3:
        return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()
    if c == 1:
        return b"P5\n%d %d\n255\n" % (w, h) + arr.tobytes()
    raise ValueError("PPM encodes 1 or 3 channels")


def split_ppm_stream(b: bytes) -> list[bytes]:
    """Split a concatenation of binary PPM/PGM frames (the deterministic
    'video' container the frame-sample stage understands) into frames."""
    frames, pos = [], 0
    while pos + 2 <= len(b) and b[pos:pos + 2] in (b"P6", b"P5"):
        magic, w, h, off = _ppm_header(b[pos:])
        nch = 3 if magic == b"P6" else 1
        end = pos + off + h * w * nch
        if end > len(b):
            raise ValueError("truncated PPM stream")
        frames.append(b[pos:end])
        pos = end
    if pos != len(b) or not frames:
        raise ValueError("not a PPM stream")
    return frames


# ------------------------------------------------------------------ WAV ----

def parse_wav(b: bytes):
    """(sample_rate, n_channels, samples) with samples float32 in [-1, 1]
    of shape (frames, channels). PCM 8/16-bit via stdlib ``wave``."""
    import io
    import wave

    with wave.open(io.BytesIO(b)) as w:
        rate, nch, sw = w.getframerate(), w.getnchannels(), w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if sw == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    else:
        raise ValueError("only PCM 8/16-bit WAV supported")
    return rate, nch, x.reshape(-1, nch)


# ------------------------------------------------------------- kernels ----

def decode_image(payload: bytes) -> tuple[np.ndarray, str] | None:
    """(pixels, codec_name) for any pure-decodable image, else None."""
    kind = sniff(payload)
    try:
        if kind == "png":
            return decode_png(payload), "pure-png"
        if kind == "bmp":
            return decode_bmp(payload), "pure-bmp"
        if kind == "ppm":
            return decode_ppm(payload), "pure-ppm"
    except ValueError:
        return None
    return None


def resize_nearest(arr: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Nearest-neighbor resize of (h, w[, c]) to (th, tw[, c])."""
    h, w = arr.shape[:2]
    yi = (np.arange(th) * h) // th
    xi = (np.arange(tw) * w) // tw
    return np.ascontiguousarray(arr[yi][:, xi])
