"""SQLite-backed rate limiter for the discovery service.

Parity with lib/network/rate_limit/ (rate_limiter_create_sqlite, used at
src/discovery-service/server.c:216): sliding-window counts per (client,
action) persisted in SQLite so restarts keep limits.
"""

from __future__ import annotations

import sqlite3
import time

DEFAULT_LIMITS = {
    "session_create": (10, 60.0),  # 10 per minute
    "session_lookup": (60, 60.0),
    "session_join": (30, 60.0),
    "string_reserve": (5, 60.0),
    "connection": (30, 60.0),
}


class RateLimiter:
    def __init__(self, path: str = ":memory:", limits: dict | None = None):
        self.db = sqlite3.connect(path)
        self.db.execute(
            "CREATE TABLE IF NOT EXISTS rate_events ("
            " client TEXT NOT NULL, action TEXT NOT NULL, at REAL NOT NULL)"
        )
        self.db.execute(
            "CREATE INDEX IF NOT EXISTS idx_rate ON rate_events (client, action, at)"
        )
        self.limits = dict(DEFAULT_LIMITS)
        if limits:
            self.limits.update(limits)

    def allow(self, client: str, action: str) -> bool:
        """Record + check; False when over the window limit."""
        limit, window = self.limits.get(action, (60, 60.0))
        now = time.time()
        self.db.execute("DELETE FROM rate_events WHERE at < ?", (now - window,))
        (count,) = self.db.execute(
            "SELECT COUNT(*) FROM rate_events WHERE client=? AND action=? AND at >= ?",
            (client, action, now - window),
        ).fetchone()
        if count >= limit:
            self.db.commit()
            return False
        self.db.execute(
            "INSERT INTO rate_events VALUES (?,?,?)", (client, action, now)
        )
        self.db.commit()
        return True
