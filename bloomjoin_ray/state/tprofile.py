"""TableProfile: a one-pass, mergeable whole-dataset profile.

The "profile before you process" operator a 100 TB corpus needs: per
column — row/null counts, HLL distinct estimate, min/max, and for
numeric columns exact float64 moments (mean/std) plus KLL quantiles;
for string/binary columns the mean byte/char length. ALL of it from a
single streaming pass (one partial per Arrow block, tree merge), so
profiling costs one read of the data and moves only sketch bytes.

Composite mergeable UDAF: the per-column sub-states (HLL, KLL, moment
accumulators, min/max) each merge associatively, so the composite does
too — same contract as every other sketch in ``state/``. Serialized as
one blob: JSON scalars + the sub-sketches' own binary blobs nested as
uint8 buffers.

Column kinds: numeric (int/float/decimal/bool) gets moments+quantiles;
temporal (timestamp/date) is profiled on its raw epoch scale (int64
cast) — min/max/quantiles are epoch values in the column's unit;
string/binary gets lexicographic min/max and mean length; anything
else (list/struct) gets counts only. Distinct estimation hashes with
the raw per-value hash (``buckets.hash_raw64``) — within-column
consistency is all distinct-counting needs, and unlike the canonical
cross-type hash it accepts full-range int64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import pack_state, register_sketch, unpack_state
from .hll import HllSketch
from .kll import KllSketch

_KIND_NUM, _KIND_STR, _KIND_OTHER = "num", "str", "other"


def _kind_of(t: pa.DataType) -> str:
    if (pa.types.is_integer(t) or pa.types.is_floating(t)
            or pa.types.is_decimal(t) or pa.types.is_boolean(t)
            or pa.types.is_timestamp(t) or pa.types.is_date(t)):
        return _KIND_NUM
    if (pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
        return _KIND_STR
    return _KIND_OTHER


def _to_float64(arr: pa.Array) -> np.ndarray:
    t = arr.type
    if pa.types.is_timestamp(t) or pa.types.is_date64(t):
        arr = arr.cast(pa.int64())
    elif pa.types.is_date32(t):
        arr = arr.cast(pa.int32())
    return np.asarray(arr.cast(pa.float64()))


@register_sketch("tprofile")
class TableProfile:
    def __init__(self, columns, dtypes=None, *, p: int = 14, k: int = 200):
        self.columns = list(columns)
        self.p, self.k = int(p), int(k)
        self.dtypes = list(dtypes) if dtypes else [""] * len(self.columns)
        self.stats = {c: {"kind": None, "n": 0, "nulls": 0,
                          "vmin": None, "vmax": None,
                          "sum": 0.0, "sumsq": 0.0, "sum_len": 0}
                      for c in self.columns}
        self.hll = {c: HllSketch(self.p) for c in self.columns}
        self.kll = {c: KllSketch(self.k) for c in self.columns}

    # -- update --------------------------------------------------------------

    def update_table(self, t: pa.Table) -> None:
        from ..pipelines.buckets import hash_raw64

        for c in self.columns:
            if c not in t.schema.names:
                raise KeyError(f"profiled column {c!r} missing from batch "
                               f"schema {t.schema.names}")
            col = t.column(c)
            col = (col.combine_chunks()
                   if isinstance(col, pa.ChunkedArray) else col)
            s = self.stats[c]
            kind = _kind_of(col.type)
            if s["kind"] is None:
                s["kind"] = kind
            elif s["kind"] != kind:
                raise TypeError(f"column {c!r} changed kind across batches "
                                f"({s['kind']} vs {kind})")
            if not self.dtypes[self.columns.index(c)]:
                self.dtypes[self.columns.index(c)] = str(col.type)
            s["nulls"] += col.null_count
            valid = col.drop_null()
            if len(valid) == 0:
                continue
            s["n"] += len(valid)
            if kind != _KIND_OTHER:
                h = valid
                if pa.types.is_date32(h.type):
                    h = h.cast(pa.int32())
                elif pa.types.is_date64(h.type):
                    h = h.cast(pa.int64())
                elif pa.types.is_decimal(h.type):
                    h = h.cast(pa.float64())
                self.hll[c].update_batch(hash_raw64(pa.table({c: h}), [c]))
            if kind == _KIND_NUM:
                vals = _to_float64(valid)
                finite = vals[np.isfinite(vals)]
                if finite.size:
                    lo, hi = float(finite.min()), float(finite.max())
                    s["vmin"] = lo if s["vmin"] is None else min(s["vmin"], lo)
                    s["vmax"] = hi if s["vmax"] is None else max(s["vmax"], hi)
                    s["sum"] += float(finite.sum())
                    s["sumsq"] += float((finite * finite).sum())
                    self.kll[c].update_batch(finite)
            elif kind == _KIND_STR:
                if pa.types.is_binary(valid.type) or \
                        pa.types.is_large_binary(valid.type):
                    lens = pc.binary_length(valid)
                else:
                    lens = pc.utf8_length(valid)
                s["sum_len"] += int(pc.sum(lens).as_py() or 0)
                mm = pc.min_max(valid)
                lo = mm["min"].as_py()
                hi = mm["max"].as_py()
                if isinstance(lo, bytes):
                    lo, hi = lo.decode("utf-8", "replace"), \
                        hi.decode("utf-8", "replace")
                s["vmin"] = lo if s["vmin"] is None else min(s["vmin"], lo)
                s["vmax"] = hi if s["vmax"] is None else max(s["vmax"], hi)

    # -- merge ---------------------------------------------------------------

    def merge(self, other: "TableProfile") -> "TableProfile":
        if self.columns != other.columns or (self.p, self.k) != \
                (other.p, other.k):
            raise ValueError("cannot merge profiles with different "
                             "columns or sketch params")
        for i, c in enumerate(self.columns):
            a, b = self.stats[c], other.stats[c]
            if a["kind"] is None:
                a["kind"] = b["kind"]
            elif b["kind"] is not None and a["kind"] != b["kind"]:
                raise TypeError(f"column {c!r} kinds differ across partials")
            if not self.dtypes[i]:
                self.dtypes[i] = other.dtypes[i]
            a["n"] += b["n"]
            a["nulls"] += b["nulls"]
            a["sum"] += b["sum"]
            a["sumsq"] += b["sumsq"]
            a["sum_len"] += b["sum_len"]
            for key, fn in (("vmin", min), ("vmax", max)):
                if b[key] is not None:
                    a[key] = b[key] if a[key] is None else fn(a[key], b[key])
            self.hll[c].merge(other.hll[c])
            self.kll[c].merge(other.kll[c])
        return self

    # -- report --------------------------------------------------------------

    def finalize(self, qs=(0.5, 0.95, 0.99)) -> pa.Table:
        """One row per profiled column."""
        rows = {"column": [], "dtype": [], "n": [], "nulls": [],
                "distinct_est": [], "min": [], "max": [], "mean": [],
                "std": [], "mean_len": []}
        qcols = {f"p{round(q * 100)}": [] for q in qs}
        for i, c in enumerate(self.columns):
            s = self.stats[c]
            rows["column"].append(c)
            rows["dtype"].append(self.dtypes[i])
            rows["n"].append(s["n"])
            rows["nulls"].append(s["nulls"])
            rows["distinct_est"].append(
                float(self.hll[c].estimate()) if s["kind"] != _KIND_OTHER
                and s["n"] else None)
            rows["min"].append(None if s["vmin"] is None else str(s["vmin"]))
            rows["max"].append(None if s["vmax"] is None else str(s["vmax"]))
            if s["kind"] == _KIND_NUM and s["n"]:
                mean = s["sum"] / s["n"]
                var = max(s["sumsq"] / s["n"] - mean * mean, 0.0)
                rows["mean"].append(mean)
                rows["std"].append(float(np.sqrt(var)))
                qv = np.atleast_1d(self.kll[c].quantile(
                    np.asarray(qs, dtype=np.float64)))
                for name, v in zip(qcols, qv):
                    qcols[name].append(float(v))
            else:
                rows["mean"].append(None)
                rows["std"].append(None)
                for name in qcols:
                    qcols[name].append(None)
            rows["mean_len"].append(
                s["sum_len"] / s["n"] if s["kind"] == _KIND_STR and s["n"]
                else None)
        rows.update(qcols)
        return pa.table(rows)

    # -- serde ---------------------------------------------------------------

    def to_bytes(self) -> bytes:
        arrays = {}
        for i, c in enumerate(self.columns):
            arrays[f"h{i}"] = np.frombuffer(self.hll[c].to_bytes(), np.uint8)
            arrays[f"k{i}"] = np.frombuffer(self.kll[c].to_bytes(), np.uint8)
        meta = {"columns": self.columns, "dtypes": self.dtypes,
                "p": self.p, "k": self.k,
                "stats": [self.stats[c] for c in self.columns]}
        return pack_state("tprofile", meta, arrays)

    @classmethod
    def _from_state(cls, meta, arrays) -> "TableProfile":
        from .base import sketch_from_bytes

        obj = cls(meta["columns"], meta["dtypes"], p=int(meta["p"]),
                  k=int(meta["k"]))
        for i, c in enumerate(obj.columns):
            obj.stats[c] = dict(meta["stats"][i])
            obj.hll[c] = sketch_from_bytes(arrays[f"h{i}"].tobytes())
            obj.kll[c] = sketch_from_bytes(arrays[f"k{i}"].tobytes())
        return obj

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TableProfile":
        name, meta, arrays = unpack_state(blob)
        if name != "tprofile":
            raise ValueError(f"expected tprofile blob, got {name!r}")
        return cls._from_state(meta, arrays)
