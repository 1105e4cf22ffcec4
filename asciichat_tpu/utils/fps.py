"""FPS counter (lib/ui/fps_counter.c): exponential moving average over ticks."""

from __future__ import annotations

import time


class FpsCounter:
    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.fps = 0.0
        self._last: float | None = None
        self.frames = 0

    def tick(self) -> float:
        now = time.monotonic()
        if self._last is not None:
            dt = now - self._last
            if dt > 0:
                inst = 1.0 / dt
                self.fps = inst if self.fps == 0.0 else (
                    self.alpha * inst + (1 - self.alpha) * self.fps
                )
        self._last = now
        self.frames += 1
        return self.fps
