"""Tracing / profiling: named timers with rate-limited breakdown logging.

Parity with lib/util/time.c's START_TIMER / STOP_TIMER_AND_LOG_EVERY macros
and the ASCII_BREAKDOWN line the render path emits (lib/video/ascii/
ascii.c:268-382): sections accumulate wall time; `breakdown()` prints an
"alloc=.., resize=.., print=.., pad=.." style summary, rate-limited.
"""

from __future__ import annotations

import contextlib
import threading
import time

from asciichat_tpu.utils.logsys import RateLimited, get_logger

log = get_logger("trace")


def pretty_duration(seconds: float) -> str:
    if seconds < 1e-6:
        return f"{seconds * 1e9:.0f}ns"
    if seconds < 1e-3:
        return f"{seconds * 1e6:.1f}us"
    if seconds < 1.0:
        return f"{seconds * 1e3:.2f}ms"
    return f"{seconds:.2f}s"


class Tracer:
    """Named section timers (thread-safe)."""

    def __init__(self, name: str = "trace", log_every_s: float = 3.0):
        self.name = name
        self._lock = threading.Lock()
        self._totals: dict[str, float] = {}
        self._counts: dict[str, int] = {}
        self._rate = RateLimited(log_every_s)

    @contextlib.contextmanager
    def section(self, label: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self._totals[label] = self._totals.get(label, 0.0) + dt
                self._counts[label] = self._counts.get(label, 0) + 1

    def snapshot(self) -> dict[str, tuple[float, int]]:
        with self._lock:
            return {k: (self._totals[k], self._counts[k]) for k in self._totals}

    def breakdown(self, reset: bool = True, force: bool = False) -> str | None:
        """Rate-limited "BREAKDOWN: a=1.2ms, b=300us (total=1.5ms)" log line."""
        if not force and not self._rate.should_log(self.name):
            return None
        snap = self.snapshot()
        if not snap:
            return None
        parts = []
        total = 0.0
        for label, (t, n) in snap.items():
            avg = t / max(n, 1)
            parts.append(f"{label}={pretty_duration(avg)}")
            total += avg
        line = f"{self.name.upper()}_BREAKDOWN: {', '.join(parts)} (total={pretty_duration(total)})"
        log.debug(line)
        if reset:
            with self._lock:
                self._totals.clear()
                self._counts.clear()
        return line
