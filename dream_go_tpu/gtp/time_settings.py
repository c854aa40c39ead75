"""GTP time-control bookkeeping per color.

Replaces `src/dg/gtp/time_settings.rs`: None / Absolute / Canadian / ByoYomi
variants tracking remaining main time and period state, updated by
``time_left`` and after each generated move.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class TimeSettings:
    kind: str = "none"           # none | absolute | canadian | byo_yomi
    main_time: float = 0.0
    period_time: float = 0.0
    period_count: int = 0

    # per-color remaining state
    remaining: dict = dataclasses.field(
        default_factory=lambda: {1: 0.0, 2: 0.0})
    periods_left: dict = dataclasses.field(
        default_factory=lambda: {1: 0, 2: 0})

    def reset(self):
        for c in (1, 2):
            self.remaining[c] = self.main_time
            self.periods_left[c] = self.period_count

    def set_none(self):
        self.kind = "none"
        self.main_time = self.period_time = 0.0
        self.period_count = 0
        self.reset()

    def set_absolute(self, main_time: float):
        self.kind = "absolute"
        self.main_time = main_time
        self.period_time = 0.0
        self.period_count = 0
        self.reset()

    def set_canadian(self, main_time: float, period_time: float,
                     stones: int):
        self.kind = "canadian"
        self.main_time = main_time
        self.period_time = period_time
        self.period_count = stones
        self.reset()

    def set_byo_yomi(self, main_time: float, period_time: float,
                     periods: int):
        self.kind = "byo_yomi"
        self.main_time = main_time
        self.period_time = period_time
        self.period_count = periods
        self.reset()

    def time_left(self, color: int, time: float, stones: int):
        self.remaining[color] = time
        self.periods_left[color] = stones

    def budget(self, color: int, moves_left_estimate: int = 40) -> float:
        """Seconds to spend on the next move (regret-weighted heuristic,
        `byo_yomi.rs:49-120` simplified to a fixed moves-left estimate)."""
        if self.kind == "none":
            return float("inf")
        main = max(self.remaining[color], 0.0)
        if self.kind == "absolute":
            return main / max(moves_left_estimate, 1)
        if self.kind in ("byo_yomi", "canadian"):
            per_period = self.period_time / max(
                1, self.period_count if self.kind == "canadian" else 1)
            return main / max(moves_left_estimate, 1) + per_period
        return float("inf")
