"""WindowDefinition — reference window algebra.

Reference: ``src/utils/WindowDefinition.h:27-103`` —
measure ROW_BASED|RANGE_BASED (``:13``), type TUMBLING|SLIDING|SESSION
(``:14,44-58``; SESSION is declared but dead in the reference — here it
is actually executable via ``session_window``). Pane size =
gcd(size, slide) (``:80-90``) is consumed by the pane-optimized
aggregation path (operators/window_agg.py), not exposed.
"""

from __future__ import annotations

import enum
import math


class WindowMeasure(enum.Enum):
    ROW_BASED = "row"
    RANGE_BASED = "range"


class WindowType(enum.Enum):
    TUMBLING = "tumbling"
    SLIDING = "sliding"
    SESSION = "session"


class WindowDefinition:
    def __init__(
        self,
        measure: WindowMeasure = WindowMeasure.ROW_BASED,
        size: int = 1,
        slide: int | None = None,
        gap: int | None = None,
    ) -> None:
        self.measure = measure
        if gap is not None:  # session ctor (WindowDefinition.h:55-58)
            self.type = WindowType.SESSION
            self.gap = gap
            self.size = self.slide = 0
            return
        self.gap = None
        self.size = size
        self.slide = size if slide is None else slide
        if self.slide > self.size:
            raise ValueError("slide > size not supported (reference semantics)")
        self.type = WindowType.TUMBLING if self.slide == self.size else WindowType.SLIDING

    def is_row_based(self) -> bool:
        return self.measure == WindowMeasure.ROW_BASED

    def is_range_based(self) -> bool:
        return self.measure == WindowMeasure.RANGE_BASED

    def is_tumbling(self) -> bool:
        return self.type == WindowType.TUMBLING

    def pane_size(self) -> int:
        """gcd pane (WindowDefinition.h:80-90)."""
        if self.type == WindowType.SESSION:
            raise ValueError("session windows have no panes")
        return math.gcd(self.size, self.slide)

    def number_of_panes(self) -> int:
        return self.size // self.pane_size()

    def __repr__(self) -> str:
        if self.type == WindowType.SESSION:
            return f"WindowDefinition(SESSION gap={self.gap})"
        return (
            f"WindowDefinition({self.type.value} {self.measure.value} "
            f"size={self.size} slide={self.slide})"
        )
