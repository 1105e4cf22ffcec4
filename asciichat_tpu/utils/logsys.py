"""Logging system: leveled, rotating, grep-filterable.

Maps the reference's log stack (lib/log/, SURVEY §2c): levels DEV..FATAL
(log.h:59-62), 3 MB file rotation (log.h:67), terminal colorization, JSON
sink (lib/log/json.c), regex --grep filtering applied at init
(lib/log/grep.c, src/main.c:522-535), and rate-limited log_debug_every.
"""

from __future__ import annotations

import json
import logging
import logging.handlers
import re
import sys
import time

DEV = 5  # below DEBUG, like the reference's LOG_DEV
logging.addLevelName(DEV, "DEV")

ROTATE_BYTES = 3 * 1024 * 1024  # log.h:67
_COLORS = {
    "DEV": "\x1b[90m", "DEBUG": "\x1b[36m", "INFO": "\x1b[32m",
    "WARNING": "\x1b[33m", "ERROR": "\x1b[31m", "CRITICAL": "\x1b[35m",
}


class GrepFilter(logging.Filter):
    """PCRE-style include filter (lib/log/grep.c analog)."""

    def __init__(self, pattern: str):
        super().__init__()
        self.rx = re.compile(pattern)

    def filter(self, record: logging.LogRecord) -> bool:
        return bool(self.rx.search(record.getMessage()))


class ColorFormatter(logging.Formatter):
    def format(self, record):
        base = super().format(record)
        color = _COLORS.get(record.levelname)
        if color and sys.stderr.isatty():
            return f"{color}{base}\x1b[0m"
        return base


class JsonFormatter(logging.Formatter):
    def format(self, record):
        return json.dumps({
            "ts": record.created,
            "level": record.levelname,
            "logger": record.name,
            "msg": record.getMessage(),
        })


class RingLogHandler(logging.Handler):
    """In-memory ring of recent records with regex search (the reference's
    named ring-buffer logs + search, lib/log/{named,search}.c, mmap ring)."""

    def __init__(self, capacity: int = 2048):
        super().__init__()
        from collections import deque

        self.ring = deque(maxlen=capacity)

    def emit(self, record):
        try:
            self.ring.append((record.created, record.levelname, record.name,
                              record.getMessage()))
        except Exception:
            pass

    def search(self, pattern: str, limit: int = 100) -> list[tuple]:
        rx = re.compile(pattern)
        return [e for e in self.ring if rx.search(e[3])][-limit:]

    def tail(self, n: int = 50) -> list[tuple]:
        return list(self.ring)[-n:]


ring_log = RingLogHandler()

_configured = False


def configure(
    level: str = "INFO",
    log_file: str | None = None,
    grep: str | None = None,
    json_output: bool = False,
) -> None:
    global _configured
    root = logging.getLogger("asciichat")
    root.handlers.clear()
    root.setLevel(DEV if level.upper() == "DEV" else level.upper())
    fmt = "%(asctime)s %(levelname)-7s %(name)s: %(message)s"
    stream = logging.StreamHandler(sys.stderr)
    stream.setFormatter(JsonFormatter() if json_output else ColorFormatter(fmt))
    root.addHandler(stream)
    root.addHandler(ring_log)  # always-on in-memory ring for search/inspector
    if log_file:
        fh = logging.handlers.RotatingFileHandler(
            log_file, maxBytes=ROTATE_BYTES, backupCount=3
        )
        fh.setFormatter(logging.Formatter(fmt))
        root.addHandler(fh)
    if grep:
        for h in root.handlers:
            h.addFilter(GrepFilter(grep))
    _configured = True


def get_logger(name: str) -> logging.Logger:
    if not _configured:
        configure()
    return logging.getLogger(f"asciichat.{name}")


class RateLimited:
    """log_debug_every analog: emit at most once per interval."""

    def __init__(self, interval_s: float):
        self.interval = interval_s
        self._last: dict[str, float] = {}

    def should_log(self, key: str) -> bool:
        now = time.monotonic()
        if now - self._last.get(key, 0.0) >= self.interval:
            self._last[key] = now
            return True
        return False
