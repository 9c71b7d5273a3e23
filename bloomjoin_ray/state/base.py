"""MergeableSketch protocol + compact binary serialization.

Every sketch in this package is a *mergeable UDAF*: partial sketches built
independently per Arrow block can be merged in any order / grouping to the
same (or boundedly-equivalent) global state. That property is what lets the
engine run sketch builds as embarrassingly-parallel ``map_batches`` passes
with a tiny tree-merge at the end — no shuffle of the raw data.

Serialization is an explicit header+buffers format (no pickle in the data
path): ``MAGIC | name | JSON meta | raw little-endian array buffers``.
Partial states travel between Ray tasks as single binary cells inside Arrow
blocks.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Protocol, runtime_checkable

import numpy as np

_MAGIC = b"BJRS1"


@runtime_checkable
class MergeableSketch(Protocol):
    """create → update_batch* → merge* → estimate; to/from_bytes round-trips."""

    def merge(self, other: "MergeableSketch") -> "MergeableSketch": ...
    def to_bytes(self) -> bytes: ...


def pack_state(name: str, meta: dict[str, Any], arrays: dict[str, np.ndarray]) -> bytes:
    """Serialize scalar metadata + named ndarrays to one bytes blob."""
    header = {
        "name": name,
        "meta": meta,
        "arrays": [
            {"key": k, "dtype": str(a.dtype), "shape": list(a.shape)}
            for k, a in arrays.items()
        ],
    }
    hj = json.dumps(header, separators=(",", ":")).encode()
    parts = [_MAGIC, struct.pack("<I", len(hj)), hj]
    for a in arrays.values():
        parts.append(np.ascontiguousarray(a).tobytes())
    return b"".join(parts)


def unpack_state(blob: bytes) -> tuple[str, dict[str, Any], dict[str, np.ndarray]]:
    """Inverse of :func:`pack_state`."""
    if blob[:5] != _MAGIC:
        raise ValueError("not a bloomjoin_ray sketch blob")
    (hlen,) = struct.unpack_from("<I", blob, 5)
    header = json.loads(blob[9 : 9 + hlen].decode())
    arrays: dict[str, np.ndarray] = {}
    off = 9 + hlen
    for spec in header["arrays"]:
        dt = np.dtype(spec["dtype"])
        count = int(np.prod(spec["shape"])) if spec["shape"] else 1
        nbytes = dt.itemsize * count
        arr = np.frombuffer(blob, dtype=dt, count=count, offset=off).reshape(spec["shape"])
        arrays[spec["key"]] = arr.copy()  # writable
        off += nbytes
    return header["name"], header["meta"], arrays


_REGISTRY: dict[str, Any] = {}


def register_sketch(name: str):
    """Class decorator: register a sketch type for ``sketch_from_bytes``."""

    def deco(cls):
        _REGISTRY[name] = cls
        cls.SKETCH_NAME = name
        return cls

    return deco


def _ensure_registry() -> None:
    # populate lazily: a Ray worker may deserialize a blob having imported
    # only this module, not the concrete sketch modules
    if len(_REGISTRY) < 13:
        from . import (  # noqa: F401
            ams, bloom, cms, ddsketch, hll, kll, misra_gries, reservoir,
            tdigest, theta, tprofile)


def sketch_from_bytes(blob: bytes):
    """Deserialize any registered sketch from its blob."""
    _ensure_registry()
    name, meta, arrays = unpack_state(blob)
    cls = _REGISTRY.get(name)
    if cls is None:
        raise ValueError(f"unknown sketch type {name!r}")
    return cls._from_state(meta, arrays)


def merge_all(sketches):
    """Left-fold merge of an iterable of sketches; returns None if empty."""
    acc = None
    for s in sketches:
        acc = s if acc is None else acc.merge(s)
    return acc
