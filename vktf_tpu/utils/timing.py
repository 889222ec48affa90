"""Frame timing and FPS accounting.

The reference exposes only DeltaTime; FPS is the north-star metric for the
TPU build (SURVEY.md §5.1), so a small windowed frame timer is first-class.
"""

from __future__ import annotations

import time
from collections import deque


class FrameTimer:
    """Sliding-window FPS / frame-ms counter."""

    def __init__(self, window: int = 120) -> None:
        self._stamps: deque[float] = deque(maxlen=window + 1)

    def tick(self) -> None:
        self._stamps.append(time.monotonic())

    @property
    def frame_ms(self) -> float:
        if len(self._stamps) < 2:
            return 0.0
        span = self._stamps[-1] - self._stamps[0]
        return 1000.0 * span / (len(self._stamps) - 1)

    @property
    def fps(self) -> float:
        ms = self.frame_ms
        return 1000.0 / ms if ms > 0.0 else 0.0
