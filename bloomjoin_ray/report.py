"""Join diagnostics — the engine-side equivalent of the reference's
``bloom_metadata`` attribute (``/root/reference/R/bloomjoin.R:266-322,
395-433``). Kept out-of-band (returned alongside the Dataset) instead of
attached to the data: Ray Datasets stream, so runtime counters (rows pruned
by the Bloom stage) are only final once the pipeline has been consumed —
call :meth:`JoinReport.finalize` after that."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass
class JoinReport:
    """Planner decisions + runtime prefilter counters for one bloom_join."""

    join_type: str = "inner"
    engine: str = "bloom"
    fpr: float = 0.01
    estimated_distinct_x: int = 0
    estimated_distinct_y: int = 0
    requested_prefilter_side: str | None = None
    chosen_prefilter_side: str | None = None
    override_requested_side: bool = False
    reason: str | None = None
    estimated_selectivity: float | None = None
    expected_reduction: float | None = None
    probe_rows: int | None = None
    expected_elements: int | None = None
    bloom_filter_used: bool = False
    bloom_m_bits: int | None = None
    bloom_k: int | None = None
    # runtime counters (valid after finalize())
    filtered_rows_x: int = 0
    filtered_rows_y: int = 0
    retained_rows: int | None = None
    reduction_ratio: float = 0.0
    extra: dict[str, Any] = field(default_factory=dict)
    _counter: Any = None

    def finalize(self) -> "JoinReport":
        """Pull runtime counters from the prune-stage counter actor. Call
        after the result Dataset has been consumed."""
        if self._counter is None:
            return self
        import time

        import ray

        # probe-stage increments are fire-and-forget; poll until stable so
        # in-flight adds from worker processes have landed
        probed, retained = ray.get(self._counter.totals.remote())
        for _ in range(40):
            time.sleep(0.05)
            nxt = ray.get(self._counter.totals.remote())
            if nxt == (probed, retained):
                break
            probed, retained = nxt
        filtered = probed - retained
        if self.chosen_prefilter_side == "x":
            self.filtered_rows_x = filtered
        else:
            self.filtered_rows_y = filtered
        self.retained_rows = retained
        self.reduction_ratio = (filtered / probed) if probed else 0.0
        return self

    def to_dict(self) -> dict[str, Any]:
        d = {k: v for k, v in self.__dict__.items() if k not in ("_counter", "extra")}
        d.update(self.extra)
        return d
