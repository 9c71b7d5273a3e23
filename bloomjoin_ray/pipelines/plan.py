"""Join planning — pure, unit-testable functions.

The decision procedure is the reference's, verbatim:

* by-spec resolution incl. mixed named/unnamed specs
  (``/root/reference/R/bloomjoin.R:145-183``);
* n_hint normalization (``R/bloomjoin.R:192-221``);
* distinct-count estimation: exact below the 50k sample cap, else scaled
  sample uniques (``R/bloomjoin.R:223-238``);
* selectivity: ≤5k probe-key sample membership-tested against ≤50k build
  uniques (``R/bloomjoin.R:240-257``);
* side choice honoring join semantics — full joins never prefilter,
  left/semi/anti may only filter ``y``, right only ``x``, inner+auto picks
  the denser side by ``density = n_probe / max(1, distinct_build)``
  (``R/bloomjoin.R:326-377``);
* skip heuristics with the reference's constants: probe < 1024 rows, build
  distinct < 16, expected reduction ≤ 0.02 (``R/bloomjoin.R:379-393``);
* ``expected_pass = sel + (1 − sel)·fpr`` (``R/bloomjoin.R:300-302``).

Deviation at scale (documented): the reference samples keys evenly-spaced
from an in-memory vector; on a streaming Dataset we sample the head blocks
(``ds.limit(n)``) — cheap, and only planner quality (never correctness)
depends on it. Callers with better knowledge pass ``n_hint``.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field
from typing import Any

import numpy as np

JOIN_TYPES = ("inner", "left", "right", "full", "semi", "anti")
ENGINES = ("auto", "bloom", "fuse")

DISTINCT_SAMPLE_LIMIT = 50_000
SELECTIVITY_PROBE_LIMIT = 5_000
MIN_PROBE_ROWS = 1024        # should_skip_prefilter constants (R/bloomjoin.R:379-393)
MIN_BUILD_DISTINCT = 16
MIN_EXPECTED_REDUCTION = 0.02


@dataclass
class OnSpec:
    x_cols: list[str]
    y_cols: list[str]


def resolve_on(x_names: list[str], y_names: list[str], on) -> OnSpec:
    """Resolve a join spec like dplyr's ``by`` (R/bloomjoin.R:145-183).

    Accepts ``None`` (natural join on common names), a str, a list of
    str / (x, y) tuples (mixed allowed), or a dict ``{x_col: y_col}``.
    """
    if on is None:
        common = [c for c in x_names if c in set(y_names)]
        if not common:
            raise ValueError("No common columns and no 'on' argument supplied")
        return OnSpec(common, list(common))
    if isinstance(on, str):
        on = [on]
    if isinstance(on, dict):
        on = list(on.items())
    x_cols, y_cols = [], []
    for item in on:
        if isinstance(item, str):
            x_cols.append(item)
            y_cols.append(item)
        elif isinstance(item, (tuple, list)) and len(item) == 2:
            x_cols.append(item[0])
            y_cols.append(item[1])
        else:
            raise ValueError(f"invalid 'on' element: {item!r}")
    missing_x = [c for c in x_cols if c not in x_names]
    missing_y = [c for c in y_cols if c not in y_names]
    if missing_x:
        raise ValueError("Join columns not found in x: " + ", ".join(missing_x))
    if missing_y:
        raise ValueError("Join columns not found in y: " + ", ".join(missing_y))
    return OnSpec(x_cols, y_cols)


def normalize_n_hint(n_hint) -> dict[str, float | None]:
    """Scalar → both sides; mapping with 'x'/'y' entries (R/bloomjoin.R:192-221)."""
    hints: dict[str, float | None] = {"x": None, "y": None}
    if n_hint is None:
        return hints
    if isinstance(n_hint, dict):
        for nm in ("x", "y"):
            if nm in n_hint and n_hint[nm] is not None:
                hints[nm] = float(n_hint[nm])
        return hints
    if isinstance(n_hint, (int, float)):
        hints["x"] = hints["y"] = float(n_hint)
        return hints
    raise ValueError("n_hint must be None, numeric, or a dict with 'x'/'y'")


def estimate_distinct_count(sample_keys: np.ndarray, total_n: int,
                            hint: float | None = None) -> int:
    """Reference estimator (R/bloomjoin.R:223-238): exact uniques when the
    sample covers everything, else scaled sample uniques."""
    if hint is not None:
        return max(0, int(round(hint)))
    if total_n == 0:
        return 0
    n_sample = len(sample_keys)
    uniq = len(np.unique(sample_keys))
    if n_sample >= total_n:
        return uniq
    if n_sample == 0:
        return 0
    return max(0, int(round(uniq / n_sample * total_n)))


def estimate_selectivity(probe_sample: np.ndarray, build_sample: np.ndarray) -> float:
    """Mean membership of a probe-key sample in the build-key uniques
    (R/bloomjoin.R:240-257)."""
    if probe_sample.size == 0 or build_sample.size == 0:
        return 0.0
    probe = probe_sample[:SELECTIVITY_PROBE_LIMIT]
    build_unique = np.unique(build_sample[:DISTINCT_SAMPLE_LIMIT])
    return float(np.isin(probe, build_unique).mean())


def choose_prefilter_target(join_type: str, prefilter_side: str, n_x: int,
                            n_y: int, distinct_x: int, distinct_y: int):
    """(target | None, reason, forced) — join-semantics-safe side choice
    (R/bloomjoin.R:326-377). Warns when overriding an unsafe request."""

    def forced(target, reason):
        warnings.warn(reason, stacklevel=3)
        return target, reason, True

    if prefilter_side in ("x", "y"):
        if join_type == "full":
            return forced(None, "Full joins retain all rows")
        if join_type in ("left", "semi", "anti") and prefilter_side == "x":
            return forced(
                "y",
                "prefilter_side = 'x' is incompatible with left/semi/anti joins; using 'y' instead",
            )
        if join_type == "right" and prefilter_side == "y":
            return forced(
                "x", "prefilter_side = 'y' is incompatible with right joins; using 'x' instead"
            )
        return prefilter_side, None, False
    if join_type == "full":
        return None, "Full joins retain all rows", False
    if join_type in ("left", "semi", "anti"):
        return "y", "Preserving left-side row semantics", False
    if join_type == "right":
        return "x", "Right join retains all rows from 'y'", False
    if n_x == 0 or n_y == 0:
        return None, "One of the inputs has zero rows", False
    density_x = n_x / max(1, distinct_y)
    density_y = n_y / max(1, distinct_x)
    if density_x >= density_y:
        return "x", "Auto-selected to prefilter 'x'", False
    return "y", "Auto-selected to prefilter 'y'", False


def should_skip_prefilter(probe_n: int, build_distinct: int,
                          expected_reduction: float) -> bool:
    """Skip constants pinned by the reference (R/bloomjoin.R:379-393)."""
    if probe_n == 0 or build_distinct == 0:
        return True
    if probe_n < MIN_PROBE_ROWS:
        return True
    if build_distinct < MIN_BUILD_DISTINCT:
        return True
    if expected_reduction <= MIN_EXPECTED_REDUCTION:
        return True
    return False


@dataclass
class PrefilterPlan:
    use_prefilter: bool
    target: str | None = None
    expected_elements: int | None = None
    metadata: dict[str, Any] = field(default_factory=dict)


def plan_prefilter(join_type: str, engine: str, prefilter_side: str,
                   n_x: int, n_y: int, distinct_x: int, distinct_y: int,
                   fpr: float, sample_keys_x: np.ndarray,
                   sample_keys_y: np.ndarray) -> PrefilterPlan:
    """The reference's full planning procedure (R/bloomjoin.R:259-324).

    Divergence from the reference: it reserves ``engine="fuse"`` and
    raises (``R/bloomjoin.R:261-264``); here the slot is FILLED — a real
    xor filter engine (``state/xorfuse.py``), ~20-40% smaller than Bloom
    at equal FPR. The skip/side heuristics are engine-independent."""
    chosen_engine = "bloom" if engine == "auto" else engine
    if chosen_engine not in ("bloom", "fuse"):
        raise ValueError(f"unknown engine {engine!r}")

    md: dict[str, Any] = {
        "join_type": join_type,
        "engine": chosen_engine,
        "fpr": fpr,
        "estimated_distinct_x": distinct_x,
        "estimated_distinct_y": distinct_y,
    }
    if prefilter_side in ("x", "y"):
        md["requested_prefilter_side"] = prefilter_side

    target, reason, was_forced = choose_prefilter_target(
        join_type, prefilter_side, n_x, n_y, distinct_x, distinct_y
    )
    if target is None:
        md["reason"] = reason
        if was_forced:
            md["override_requested_side"] = True
        md["bloom_filter_used"] = False
        return PrefilterPlan(False, metadata=md)
    md["chosen_prefilter_side"] = target
    if reason is not None:
        md["reason"] = reason
    if was_forced:
        md["override_requested_side"] = True

    if target == "x":
        build_sample, probe_sample = sample_keys_y, sample_keys_x
        build_distinct, probe_n = distinct_y, n_x
    else:
        build_sample, probe_sample = sample_keys_x, sample_keys_y
        build_distinct, probe_n = distinct_x, n_y

    selectivity = estimate_selectivity(probe_sample, build_sample)
    expected_pass = selectivity + (1.0 - selectivity) * fpr
    expected_reduction = max(0.0, 1.0 - expected_pass)
    md["estimated_selectivity"] = selectivity
    md["expected_reduction"] = expected_reduction
    md["probe_rows"] = probe_n

    if should_skip_prefilter(probe_n, build_distinct, expected_reduction):
        md["reason"] = "prefilter skip heuristic triggered"
        md["bloom_filter_used"] = False
        return PrefilterPlan(False, metadata=md)

    expected_elements = max(1, build_distinct)
    md["expected_elements"] = expected_elements
    md["bloom_filter_used"] = True
    return PrefilterPlan(True, target, expected_elements, md)
