"""Discovery sessions: memorable word-strings + SQLite session database.

Parity with lib/discovery/ + src/discovery-service/server.c:209-223:
- session strings are "adjective-noun-noun" (lib/discovery/strings.c:6)
  drawn from word lists (ours are original, not the reference's lists)
- sessions persist in SQLite with host/participant addressing, join/leave/
  reconnect, expiry, and string reservations (ACIP_STRING_RESERVE/RENEW/
  RELEASE, packet.h:6020-6023)
"""

from __future__ import annotations

import dataclasses
import secrets
import sqlite3
import time

# Original word lists (the reference ships its own 360/725-word lists; these
# are this project's, same format and role).
ADJECTIVES = [
    "amber", "arctic", "bold", "brave", "bright", "brisk", "calm", "cedar",
    "clever", "cobalt", "cosmic", "crimson", "crisp", "daring", "dawn",
    "deep", "dusty", "eager", "early", "ember", "fable", "fleet", "frosty",
    "gentle", "gilded", "glad", "golden", "grand", "green", "happy", "hardy",
    "hidden", "humble", "indigo", "ivory", "jade", "jolly", "keen", "kind",
    "late", "lively", "lucky", "lunar", "mellow", "mighty", "misty", "noble",
    "north", "old", "opal", "pale", "polar", "proud", "quick", "quiet",
    "rapid", "rosy", "rustic", "sable", "sage", "sandy", "scarlet", "sharp",
    "silent", "silver", "sleek", "smooth", "snowy", "solar", "steady",
    "stormy", "sunny", "swift", "tall", "tidal", "topaz", "tranquil", "true",
    "vivid", "warm", "wild", "windy", "wise", "young", "zesty",
]
NOUNS = [
    "anchor", "arrow", "aspen", "badger", "bay", "beacon", "bear", "birch",
    "bison", "bluff", "brook", "canyon", "cave", "cliff", "cloud", "comet",
    "coral", "crane", "creek", "crow", "delta", "dune", "eagle", "echo",
    "elk", "ember", "falcon", "fern", "field", "fjord", "flame", "forest",
    "fox", "gale", "garden", "geyser", "glacier", "glade", "grove", "harbor",
    "hawk", "heron", "hill", "island", "jungle", "lagoon", "lake", "lark",
    "lily", "lynx", "maple", "marsh", "meadow", "mesa", "moon", "moose",
    "moss", "mountain", "oak", "ocean", "orchid", "osprey", "otter", "owl",
    "peak", "pebble", "pine", "plain", "pond", "prairie", "rain", "raven",
    "reef", "ridge", "river", "rock", "rose", "sea", "shore", "sky",
    "sparrow", "spring", "star", "stone", "storm", "stream", "summit",
    "sun", "thicket", "thunder", "tide", "trail", "tundra", "valley",
    "vine", "water", "wave", "willow", "wind", "wolf", "wren",
]


def generate_session_string() -> str:
    """adjective-noun-noun, e.g. "swift-river-mountain" (strings.c:6)."""
    return "-".join(
        (
            secrets.choice(ADJECTIVES),
            secrets.choice(NOUNS),
            secrets.choice(NOUNS),
        )
    )


def validate_session_string(s: str) -> bool:
    parts = s.split("-")
    return (
        len(parts) == 3
        and parts[0] in ADJECTIVES
        and parts[1] in NOUNS
        and parts[2] in NOUNS
    )


@dataclasses.dataclass
class SessionInfo:
    session_string: str
    session_id: str
    host_id: str
    host_address: str
    host_port: int
    created_at: float
    participants: list[str]


SESSION_TTL_S = 24 * 3600
RESERVATION_TTL_S = 300


class SessionDatabase:
    """SQLite session store (src/discovery-service/server.c:209-223 analog)."""

    def __init__(self, path: str = ":memory:"):
        self.db = sqlite3.connect(path)
        self.db.executescript(
            """
            CREATE TABLE IF NOT EXISTS sessions (
                session_string TEXT PRIMARY KEY,
                session_id TEXT NOT NULL,
                host_id TEXT NOT NULL,
                host_address TEXT NOT NULL,
                host_port INTEGER NOT NULL,
                created_at REAL NOT NULL,
                ended INTEGER DEFAULT 0
            );
            CREATE TABLE IF NOT EXISTS participants (
                session_string TEXT NOT NULL,
                participant_id TEXT NOT NULL,
                address TEXT,
                port INTEGER,
                joined_at REAL NOT NULL,
                PRIMARY KEY (session_string, participant_id)
            );
            CREATE TABLE IF NOT EXISTS reservations (
                session_string TEXT PRIMARY KEY,
                owner_id TEXT NOT NULL,
                reserved_at REAL NOT NULL
            );
            """
        )

    # -- sessions ---------------------------------------------------------
    def create_session(
        self, host_id: str, host_address: str, host_port: int,
        session_string: str | None = None,
    ) -> SessionInfo:
        for _ in range(32):
            s = session_string or generate_session_string()
            session_id = secrets.token_hex(8)
            try:
                self.db.execute(
                    "INSERT INTO sessions VALUES (?,?,?,?,?,?,0)",
                    (s, session_id, host_id, host_address, host_port, time.time()),
                )
                break
            except sqlite3.IntegrityError:
                if session_string:  # explicit (reserved) string already taken
                    raise ValueError(f"session string {s!r} already in use")
                continue
        else:
            raise RuntimeError("could not allocate a session string")
        self.db.execute(
            "INSERT OR REPLACE INTO participants VALUES (?,?,?,?,?)",
            (s, host_id, host_address, host_port, time.time()),
        )
        self.db.commit()
        return self.lookup(s)

    def lookup(self, session_string: str) -> SessionInfo | None:
        self._expire()
        row = self.db.execute(
            "SELECT session_string, session_id, host_id, host_address, host_port,"
            " created_at FROM sessions WHERE session_string=? AND ended=0",
            (session_string,),
        ).fetchone()
        if not row:
            return None
        parts = [
            r[0]
            for r in self.db.execute(
                "SELECT participant_id FROM participants WHERE session_string=?"
                " ORDER BY joined_at",
                (session_string,),
            )
        ]
        return SessionInfo(*row, participants=parts)

    def join(self, session_string: str, participant_id: str,
             address: str = "", port: int = 0) -> SessionInfo:
        info = self.lookup(session_string)
        if info is None:
            raise KeyError(f"no such session: {session_string}")
        self.db.execute(
            "INSERT OR REPLACE INTO participants VALUES (?,?,?,?,?)",
            (session_string, participant_id, address, port, time.time()),
        )
        self.db.commit()
        return self.lookup(session_string)

    def leave(self, session_string: str, participant_id: str) -> None:
        self.db.execute(
            "DELETE FROM participants WHERE session_string=? AND participant_id=?",
            (session_string, participant_id),
        )
        self.db.commit()

    def end_session(self, session_string: str, host_id: str) -> bool:
        cur = self.db.execute(
            "UPDATE sessions SET ended=1 WHERE session_string=? AND host_id=?",
            (session_string, host_id),
        )
        self.db.commit()
        return cur.rowcount > 0

    def set_host(self, session_string: str, host_id: str,
                 address: str, port: int) -> None:
        """Host migration after consensus election / failover."""
        self.db.execute(
            "UPDATE sessions SET host_id=?, host_address=?, host_port=?"
            " WHERE session_string=?",
            (host_id, address, port, session_string),
        )
        self.db.commit()

    # -- string reservations (packet.h:6020-6023) --------------------------
    def reserve_string(self, session_string: str, owner_id: str) -> bool:
        self._expire()
        if not validate_session_string(session_string):
            return False
        taken = self.db.execute(
            "SELECT 1 FROM sessions WHERE session_string=? AND ended=0",
            (session_string,),
        ).fetchone()
        if taken:
            return False
        try:
            self.db.execute(
                "INSERT INTO reservations VALUES (?,?,?)",
                (session_string, owner_id, time.time()),
            )
        except sqlite3.IntegrityError:
            row = self.db.execute(
                "SELECT owner_id FROM reservations WHERE session_string=?",
                (session_string,),
            ).fetchone()
            return bool(row and row[0] == owner_id)
        self.db.commit()
        return True

    def reservation_owner(self, session_string: str) -> str | None:
        """Current (unexpired) reservation holder, or None."""
        self._expire()
        row = self.db.execute(
            "SELECT owner_id FROM reservations WHERE session_string=?",
            (session_string,),
        ).fetchone()
        return row[0] if row else None

    def renew_string(self, session_string: str, owner_id: str) -> bool:
        cur = self.db.execute(
            "UPDATE reservations SET reserved_at=? WHERE session_string=? AND owner_id=?",
            (time.time(), session_string, owner_id),
        )
        self.db.commit()
        return cur.rowcount > 0

    def release_string(self, session_string: str, owner_id: str) -> None:
        self.db.execute(
            "DELETE FROM reservations WHERE session_string=? AND owner_id=?",
            (session_string, owner_id),
        )
        self.db.commit()

    def _expire(self) -> None:
        now = time.time()
        self.db.execute("DELETE FROM sessions WHERE created_at < ?", (now - SESSION_TTL_S,))
        self.db.execute(
            "DELETE FROM reservations WHERE reserved_at < ?", (now - RESERVATION_TTL_S,)
        )
        self.db.commit()
