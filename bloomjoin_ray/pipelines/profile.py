"""Key-distribution profiling — the diagnostic you run BEFORE choosing
a partitioning/salting strategy for a wide operation. A 100-TB groupby
or co-partitioned join lives or dies on key skew; these operators
answer "how many keys, how big is the biggest, how heavy is the tail"
without hand-rolled driver loops.

Two tiers:

* exact (``key_skew_summary`` / ``heavy_keys``) — per-key counts via
  the packed count exchange, then a single-task reduce over ONE int64
  per distinct key. Envelope: the distinct-key count must fit one
  reducer (~125M keys/GiB); above that use the sketch tier.
* sketch (``key_skew_sketch``) — one streaming pass, no shuffle:
  HyperLogLog distinct estimate + Misra–Gries heavy hitters + row
  count, merged as partials. Works at any cardinality; heavy-hitter
  counts are lower bounds (MG guarantee: true count within n/capacity).
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pyarrow as pa

from .aggregate import grouped_assoc_agg, hll_distinct, mg_heavy_hitters


def _qdisc_index(nk: int, q: float) -> int:
    """SQL ``quantile_disc`` element index on a sorted array: the value
    at ``ceil(nk * q) - 1`` (clamped) — bit-identical to DuckDB."""
    return min(max(math.ceil(nk * q) - 1, 0), nk - 1)


def key_skew_summary(ds, cols: str | Sequence[str], *,
                     qs: Sequence[float] = (0.5, 0.9, 0.99)):
    """One-row exact skew summary of the key distribution of ``cols``:
    ``n_rows`` (total), ``n_keys`` (distinct), ``max_n`` (largest
    group), ``p{q}_n`` (``quantile_disc`` of group sizes per ``qs``),
    ``avg_n`` (mean group size) and ``skew`` (``max_n / avg_n`` — 1.0
    is perfectly uniform; a packed exchange needs salting well before
    ``skew`` reaches the reducer count).

    Scale shape: the packed count exchange reduces the input to one
    int64 per distinct key; the final reduce sorts those counts in ONE
    task (envelope: distinct keys fit a reducer — use
    ``key_skew_sketch`` beyond that). Float fields use the same IEEE
    expression order as the SQL oracle (cast-then-multiply-then-divide)
    so results hash-match exactly."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    qs = [float(q) for q in qs]
    if any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError("qs must satisfy 0 <= q <= 1")
    qnames = [f"p{round(q * 100)}_n" for q in qs]
    if len(set(qnames)) != len(qnames):
        raise ValueError(f"qs collide after rounding to {qnames}")

    counts = grouped_assoc_agg(ds.select_columns(cols), cols,
                               count_col="n")

    def final(batch: pa.Table) -> pa.Table:
        n = np.sort(np.asarray(batch.column("n"), dtype=np.int64))
        nk = len(n)
        if nk == 0:
            return pa.table(
                {"n_rows": pa.array([], pa.int64()),
                 "n_keys": pa.array([], pa.int64()),
                 "max_n": pa.array([], pa.int64()),
                 **{nm: pa.array([], pa.int64()) for nm in qnames},
                 "avg_n": pa.array([], pa.float64()),
                 "skew": pa.array([], pa.float64())})
        tot = int(n.sum())
        mx = int(n[-1])
        row = {"n_rows": [tot], "n_keys": [nk], "max_n": [mx]}
        for q, nm in zip(qs, qnames):
            row[nm] = [int(n[_qdisc_index(nk, q)])]
        row["avg_n"] = [float(tot) / nk]
        row["skew"] = [float(mx) * nk / float(tot)]
        return pa.table(row)

    return (counts.select_columns(["n"]).repartition(1)
            .map_batches(final, batch_size=None, batch_format="pyarrow"))


def heavy_keys(ds, cols: str | Sequence[str], k: int = 10):
    """EXACT top-``k`` keys by row count, ordered (count desc, key asc)
    — the keys you salt. Per-block local top-k bounds what moves (≤ k
    rows per count-exchange output block), one tiny final reduce.
    Returns Dataset[cols…, n]."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    if k < 1:
        raise ValueError("k must be >= 1")

    counts = grouped_assoc_agg(ds.select_columns(cols), cols,
                               count_col="n")

    def topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        n = np.asarray(batch.column("n"), dtype=np.int64)
        keys = [np.asarray(batch.column(c)) for c in reversed(cols)]
        order = np.lexsort((*keys, -n))[:k]
        return batch.take(pa.array(order))

    return (counts.map_batches(topk, batch_format="pyarrow")
            .repartition(1)
            .map_batches(topk, batch_size=None, batch_format="pyarrow"))


def key_skew_sketch(ds, cols: str | Sequence[str], *, topk: int = 10,
                    p: int = 14, capacity: int = 512) -> dict:
    """Shuffle-free skew profile for UNBOUNDED key cardinality: one
    streaming pass of partials per structure (HyperLogLog distinct +
    Misra–Gries heavy hitters + row count), merged as sketches — no
    per-key state ever shuffles. Returns ``{"n_rows", "distinct_est",
    "avg_n_est", "heavy"}`` where ``heavy`` is a ``pa.Table`` of the
    top keys with ``est_count`` (lower bound; MG guarantees the true
    count is within ``n_rows / (capacity + 1)`` above it) and
    ``share_lb``. The decision rule at scale: salt any key whose
    ``share_lb × reducers`` exceeds ~1."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    n_rows = ds.count()
    if n_rows == 0:
        return {"n_rows": 0, "distinct_est": 0.0, "avg_n_est": 0.0,
                "heavy": None}
    distinct = float(hll_distinct(ds, cols, p=p))
    hh = mg_heavy_hitters(ds, cols, topk=topk, k=capacity)
    if hh is not None:
        share = np.asarray(hh.column("est_count"), dtype=np.float64) / n_rows
        hh = hh.append_column("share_lb", pa.array(share))
    return {"n_rows": n_rows, "distinct_est": distinct,
            "avg_n_est": n_rows / max(distinct, 1.0), "heavy": hh}


def dataset_profile(ds, columns: Sequence[str] | None = None, *,
                    qs: Sequence[float] = (0.5, 0.95, 0.99),
                    p: int = 14, k: int = 200) -> pa.Table:
    """ONE-PASS whole-dataset profile — the 100 TB "look before you
    process" operator: per column, row/null counts, HLL distinct
    estimate, min/max, exact float64 moments (mean/std) + KLL quantiles
    for numeric columns (temporal on its epoch scale), mean length for
    string/binary. One partial ``TableProfile`` per Arrow block, tree
    merge — the whole report costs a single column-pruned read and
    moves only sketch bytes (no shuffle, nothing materialized).

    Returns a ``pa.Table`` with one row per profiled column. Error
    envelopes: distinct within HLL's ~1.04/sqrt(2^p); quantiles within
    KLL rank error; counts/min/max/mean/std exact (float64
    accumulation). ``columns=None`` profiles every non-nested column.
    """
    from ..state.tprofile import TableProfile, _kind_of
    from .aggregate import sketch_aggregate_global
    from .asof import _schema_of

    schema = _schema_of(ds)
    if columns is None:
        columns = [f.name for f in schema
                   if _kind_of(f.type) != "other"]
    else:
        columns = list(columns)
        missing = [c for c in columns if c not in schema.names]
        if missing:
            raise ValueError(f"profiled columns {missing} not in schema "
                             f"{schema.names}")
    if not columns:
        raise ValueError("no profilable columns")
    dtypes = [str(schema.field(c).type) for c in columns]
    prof = sketch_aggregate_global(
        ds, lambda: TableProfile(columns, dtypes, p=p, k=k),
        lambda s, t: s.update_table(t), input_cols=columns)
    if prof is None:
        prof = TableProfile(columns, dtypes, p=p, k=k)
    return prof.finalize(qs=qs)


def pipeline_stats(ds) -> "pa.Table":
    """Parse a MATERIALIZED Dataset's ``ds.stats()`` report into one row
    per operator — the "read the stats and iterate" loop as a table you
    can sort/filter instead of a wall of text. Columns: ``operator``,
    ``tasks``, ``blocks``, ``wall_s`` (operator wall-clock), ``udf_s``
    (total in-UDF time), ``rows_out``, ``bytes_out``,
    ``rows_per_s`` (Ray Data throughput). Driver-side string parsing
    only — no extra execution; call after ``materialize()`` (a lazy
    Dataset has no stats yet)."""
    import re

    import pyarrow as pa

    text = ds.stats()
    ops = []
    for m in re.finditer(
            r"Operator (\d+) (.+?): (\d+) tasks executed, "
            r"(\d+) blocks produced in ([\d.]+)s", text):
        ops.append({"idx": int(m.group(1)), "operator": m.group(2),
                    "tasks": int(m.group(3)), "blocks": int(m.group(4)),
                    "wall_s": float(m.group(5)), "end": m.end()})
    units = {"us": 1e-6, "ms": 1e-3, "s": 1.0}
    rows = []
    for i, op in enumerate(ops):
        nxt = text.find("Operator ", op["end"])
        seg = text[op["end"]: nxt if nxt != -1 else len(text)]
        udf = re.search(r"UDF time:.*?([\d.]+)(us|ms|s) total", seg)
        nrows = re.search(r"Output num rows per block:.*?(\d+) total", seg)
        nbytes = re.search(r"Output size bytes per block:.*?(\d+) total",
                           seg)
        thr = re.search(r"Ray Data throughput: ([\d.]+) rows/s", seg)
        rows.append({
            "operator": op["operator"], "tasks": op["tasks"],
            "blocks": op["blocks"], "wall_s": op["wall_s"],
            "udf_s": (float(udf.group(1)) * units[udf.group(2)]
                      if udf else None),
            "rows_out": int(nrows.group(1)) if nrows else None,
            "bytes_out": int(nbytes.group(1)) if nbytes else None,
            "rows_per_s": float(thr.group(1)) if thr else None,
        })
    if not rows:
        return pa.table({"operator": pa.array([], type=pa.string())})
    return pa.Table.from_pylist(rows)
