"""DDSketch: quantiles with RELATIVE-error guarantees (Masson, Lee &
Rim, "DDSketch: A Fast and Fully-Mergeable Quantile Sketch with
Relative-Error Guarantees", VLDB 2019 — public paper, implemented from
scratch in numpy).

Log-spaced buckets with ratio ``γ = (1+α)/(1−α)``: value ``x > 0`` lands
in bucket ``i = ceil(log_γ x)`` and is reported back as the log-midpoint
``2γ^i/(γ+1)``, which is within relative error α of every value in the
bucket. Negative values mirror into a second store keyed by ``|x|``;
exact zeros (and subnormals below the smallest indexable magnitude)
count separately. So unlike t-digest/KLL (rank-error sketches), the
VALUE returned for any quantile is within ``α·|true|`` — uniformly,
including the extreme tails — as long as the store is uncollapsed.

Fully mergeable: bucket counts add (offset-aligned), zero counts add —
merge is exact and associative, so partial sketches from ``map_batches``
blocks combine in any order to the bit-identical store a single pass
builds (the property the grouped/salted aggregation paths rely on).

Bounded memory: at most ``max_buckets`` buckets per sign; overflow
collapses the LOWEST-magnitude buckets into one (the paper's collapsing
variant), which preserves the α guarantee for all quantiles above the
collapsed mass — the upper quantiles a latency/length monitor cares
about. ``collapsed`` records whether that ever happened.
"""

from __future__ import annotations

import numpy as np

from .base import pack_state, register_sketch, unpack_state

# magnitudes below this underflow the log-index math; they count as zero
# (their relative-error envelope is a no-op at these scales anyway)
_MIN_MAG = 1e-280


@register_sketch("ddsketch")
class DDSketch:
    def __init__(self, alpha: float = 0.01, max_buckets: int = 2048):
        if not 0.0 < alpha < 1.0:
            raise ValueError("alpha must be in (0, 1)")
        if max_buckets < 16:
            raise ValueError("max_buckets must be >= 16")
        self.alpha = float(alpha)
        self.max_buckets = int(max_buckets)
        self.gamma = (1.0 + alpha) / (1.0 - alpha)
        self._lg = np.log(self.gamma)
        # per-sign stores: counts[j] holds bucket index offset + j
        self.pos = np.zeros(0, dtype=np.int64)
        self.pos_off = 0
        self.neg = np.zeros(0, dtype=np.int64)  # indexed by |x|
        self.neg_off = 0
        self.zero = 0
        self.collapsed = False

    @property
    def total(self) -> int:
        return int(self.pos.sum() + self.neg.sum() + self.zero)

    # -- store plumbing ----------------------------------------------------

    def _indices(self, mags: np.ndarray) -> np.ndarray:
        # ceil(log_gamma(x)); the +tiny nudge keeps exact powers of gamma
        # from flapping across the boundary under float roundoff
        return np.ceil(np.log(mags) / self._lg - 1e-12).astype(np.int64)

    @staticmethod
    def _add_counts(counts: np.ndarray, off: int, idx: np.ndarray,
                    add: np.ndarray) -> tuple[np.ndarray, int]:
        lo = min(int(idx.min()), off) if counts.size else int(idx.min())
        hi = max(int(idx.max()), off + len(counts) - 1) if counts.size \
            else int(idx.max())
        out = np.zeros(hi - lo + 1, dtype=np.int64)
        if counts.size:
            out[off - lo:off - lo + len(counts)] = counts
        np.add.at(out, idx - lo, add)
        return out, lo

    def _collapse(self) -> None:
        """Fold the lowest-magnitude overflow buckets into one."""
        for name in ("pos", "neg"):
            counts = getattr(self, name)
            if len(counts) <= self.max_buckets:
                continue
            cut = len(counts) - self.max_buckets
            spill = int(counts[:cut + 1].sum())
            counts = counts[cut:].copy()
            counts[0] = spill
            setattr(self, name, counts)
            setattr(self, name + "_off", getattr(self, name + "_off") + cut)
            self.collapsed = True

    # -- updates -----------------------------------------------------------

    def update_batch(self, values: np.ndarray,
                     counts: np.ndarray | None = None) -> None:
        v = np.asarray(values, dtype=np.float64)
        if counts is None:
            counts = np.ones(v.size, dtype=np.int64)
        else:
            counts = np.asarray(counts, dtype=np.int64)
        keep = np.isfinite(v)
        if not keep.all():
            v, counts = v[keep], counts[keep]
        if v.size == 0:
            return
        mags = np.abs(v)
        tiny = mags < _MIN_MAG
        self.zero += int(counts[tiny].sum())
        for store, mask in (("pos", (v > 0) & ~tiny),
                            ("neg", (v < 0) & ~tiny)):
            if not mask.any():
                continue
            idx = self._indices(mags[mask])
            tbl, off = self._add_counts(getattr(self, store),
                                        getattr(self, store + "_off"),
                                        idx, counts[mask])
            setattr(self, store, tbl)
            setattr(self, store + "_off", off)
        self._collapse()

    def merge(self, other: "DDSketch") -> "DDSketch":
        if abs(self.alpha - other.alpha) > 1e-12:
            raise ValueError("cannot merge DDSketches with different alpha")
        self.max_buckets = min(self.max_buckets, other.max_buckets)
        for store in ("pos", "neg"):
            oc = getattr(other, store)
            if oc.size:
                nz = np.nonzero(oc)[0]
                idx = nz + getattr(other, store + "_off")
                tbl, off = self._add_counts(getattr(self, store),
                                            getattr(self, store + "_off"),
                                            idx, oc[nz])
                setattr(self, store, tbl)
                setattr(self, store + "_off", off)
        self.zero += other.zero
        self.collapsed = self.collapsed or other.collapsed
        self._collapse()
        return self

    # -- queries -----------------------------------------------------------

    def _bucket_values(self) -> tuple[np.ndarray, np.ndarray]:
        """All non-empty buckets as (representative value, count), in
        ascending value order: negatives (most negative first), zero,
        positives."""
        mid = 2.0 / (self.gamma + 1.0)
        parts_v, parts_c = [], []
        if self.neg.size:
            nz = np.nonzero(self.neg)[0]
            idx = nz + self.neg_off
            v = -mid * np.power(self.gamma, idx.astype(np.float64))
            order = np.argsort(v)  # most negative (largest |x|) first
            parts_v.append(v[order])
            parts_c.append(self.neg[nz][order])
        if self.zero:
            parts_v.append(np.zeros(1))
            parts_c.append(np.asarray([self.zero], dtype=np.int64))
        if self.pos.size:
            nz = np.nonzero(self.pos)[0]
            idx = nz + self.pos_off
            parts_v.append(mid * np.power(self.gamma,
                                          idx.astype(np.float64)))
            parts_c.append(self.pos[nz])
        if not parts_v:
            return np.zeros(0), np.zeros(0, dtype=np.int64)
        return np.concatenate(parts_v), np.concatenate(parts_c)

    def quantile(self, qs) -> np.ndarray:
        """Value estimates for quantiles ``qs`` (array-like in [0,1]);
        each within ``α·|true value|`` while uncollapsed."""
        qs = np.atleast_1d(np.asarray(qs, dtype=np.float64))
        if ((qs < 0) | (qs > 1)).any():
            raise ValueError("quantiles must be in [0, 1]")
        vals, counts = self._bucket_values()
        if vals.size == 0:
            return np.full(qs.shape, np.nan)
        cum = np.cumsum(counts)
        n = cum[-1]
        # element at 0-indexed rank floor(q*(n-1)) — the first bucket
        # whose cumulative count covers it (1e-9 guards float equality)
        ranks = np.floor(qs * (n - 1))
        pos = np.searchsorted(cum, ranks + 1.0 - 1e-9, side="left")
        return vals[np.minimum(pos, len(vals) - 1)]

    # -- serde ---------------------------------------------------------------

    def to_bytes(self) -> bytes:
        return pack_state(
            "ddsketch",
            {"alpha": self.alpha, "max_buckets": self.max_buckets,
             "pos_off": self.pos_off, "neg_off": self.neg_off,
             "zero": self.zero, "collapsed": int(self.collapsed)},
            {"pos": self.pos, "neg": self.neg})

    @classmethod
    def _from_state(cls, meta, arrays) -> "DDSketch":
        obj = cls(float(meta["alpha"]), int(meta["max_buckets"]))
        obj.pos = arrays["pos"].astype(np.int64, copy=False)
        obj.neg = arrays["neg"].astype(np.int64, copy=False)
        obj.pos_off = int(meta["pos_off"])
        obj.neg_off = int(meta["neg_off"])
        obj.zero = int(meta["zero"])
        obj.collapsed = bool(meta["collapsed"])
        return obj

    @classmethod
    def from_bytes(cls, blob: bytes) -> "DDSketch":
        name, meta, arrays = unpack_state(blob)
        if name != "ddsketch":
            raise ValueError(f"expected ddsketch blob, got {name!r}")
        return cls._from_state(meta, arrays)
