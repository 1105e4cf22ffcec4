"""UI chrome: splash banner, status line, keyboard help overlay.

Parity with lib/ui/ (splash.c animated banner, fps_counter.c overlay,
status screen, keyboard help).
"""

from __future__ import annotations

import time

SPLASH = r"""
   __ _ ___  ___(_|_)       ___| |__   __ _| |_
  / _` / __|/ __| | |_____ / __| '_ \ / _` | __|
 | (_| \__ \ (__| | |_____| (__| | | | (_| | |_
  \__,_|___/\___|_|_|      \___|_| |_|\__,_|\__|  tpu
"""

KEY_HELP = [
    ("q", "quit"),
    ("f", "flip horizontally"),
    ("m", "toggle matrix rain"),
    ("c", "cycle color filter"),
    ("?", "toggle this help"),
]


def splash_frames(columns: int = 60, steps: int = 8) -> list[bytes]:
    """Simple reveal animation of the banner (splash.c analog)."""
    lines = [ln for ln in SPLASH.strip("\n").split("\n")]
    frames = []
    for step in range(1, steps + 1):
        visible = int(len(lines[0]) * step / steps) + 4
        frame = "\n".join(ln[:visible].center(columns)[:columns] for ln in lines)
        frames.append(frame.encode())
    return frames


def help_overlay() -> bytes:
    width = max(len(f"  {k}  {desc}") for k, desc in KEY_HELP) + 4
    top = "+" + "-" * (width - 2) + "+"
    rows = [top, "|" + " keys ".center(width - 2, "-") + "|"]
    for k, desc in KEY_HELP:
        rows.append(("| " + f"{k}  {desc}").ljust(width - 1) + "|")
    rows.append(top)
    return "\n".join(rows).encode()


def status_line(fps: float, frames: int, mode: str, size: tuple[int, int],
                extra: str = "") -> bytes:
    uptime = ""
    s = (f"\x1b[7m {fps:5.1f} fps | {frames} frames | {mode} | "
         f"{size[0]}x{size[1]} {extra}{uptime}\x1b[0m")
    return s.encode()


class Stats:
    """Server stats aggregate (src/server/stats.c analog)."""

    def __init__(self):
        self.start = time.monotonic()
        self.frames_rendered = 0
        self.frames_sent = 0
        self.bytes_sent = 0
        self.clients_peak = 0

    def report(self, num_clients: int) -> str:
        self.clients_peak = max(self.clients_peak, num_clients)
        up = time.monotonic() - self.start
        fps = self.frames_rendered / up if up > 0 else 0.0
        return (f"uptime={up:.0f}s clients={num_clients} (peak {self.clients_peak}) "
                f"rendered={self.frames_rendered} ({fps:.1f}/s) "
                f"sent={self.frames_sent} bytes={self.bytes_sent}")
