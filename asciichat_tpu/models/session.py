"""Shared session framework: the capture/display/retry layer every mode uses.

Counterpart of src/common/session/ (client_like.c, pipeline.c, display.c —
8.3k LoC shared by mirror/client/discovery in the reference). Round 1 had
each app re-implement these; this module is the single implementation:

- FrameTransform: the capture-side frame chain (flip, digital rain overlay,
  color filter, upload fit) with its carried state — used by the mirror's
  convert stage and the client's capture task (pipeline.c stage 1→2).
- DisplaySink: terminal frame writing with first-frame reset, chat lines,
  help/fps overlays (display.c + client display semantics).
- ReconnectPolicy: the reference's backoff-with-reset connect retry
  (client_like.c reconnect loop).
- Pacer: fps-cap pacing shared by thread loops and asyncio tasks.
"""

from __future__ import annotations

import time

import numpy as np

from asciichat_tpu.utils import term, ui
from asciichat_tpu.utils.fps import FpsCounter


class FrameTransform:
    """Capture-side frame chain (pipeline.c capture→convert hand-off):
    flips → digital-rain overlay → color filter → optional upload fit.
    All fields are live-mutable (keybindings toggle them mid-session)."""

    def __init__(self, flip_x: bool = False, flip_y: bool = False,
                 matrix: bool = False, color_filter: str = "none",
                 max_upload: tuple[int, int] | None = None):
        self.flip_x = flip_x
        self.flip_y = flip_y
        self.matrix = matrix
        self.color_filter = color_filter
        self.max_upload = max_upload
        self._rain = None
        self._t0 = time.monotonic()

    def __call__(self, frame: np.ndarray) -> np.ndarray:
        frame = np.asarray(frame)
        if self.flip_x:
            frame = frame[:, ::-1]
        if self.flip_y:
            frame = frame[::-1]
        if self.matrix:
            import jax.numpy as jnp

            from asciichat_tpu.ops.rain import DigitalRain

            if (self._rain is None
                    or self._rain.num_columns != frame.shape[1]
                    or self._rain.num_rows != frame.shape[0]):
                # BOTH dims: a height-only change (file source switching
                # clips) with a stale num_rows shape-mismatches in apply()
                self._rain = DigitalRain(frame.shape[1], frame.shape[0])
            frame = np.asarray(
                self._rain.apply(jnp.asarray(np.ascontiguousarray(frame)),
                                 time.monotonic() - self._t0)
            )
        if self.color_filter != "none":
            from asciichat_tpu.ops import filters as filters_ops

            frame = filters_ops.apply_color_filter_reference(
                np.asarray(frame), self.color_filter, time.monotonic()
            )
        if self.max_upload is not None:
            mw, mh = self.max_upload
            h, w = frame.shape[:2]
            if w > mw or h > mh:
                from asciichat_tpu.render.oracle import resize_image
                from asciichat_tpu.utils.aspect import fit_dimensions_pixel

                nw, nh = fit_dimensions_pixel(w, h, mw, mh)
                frame = resize_image(frame, nw, nh)
        return frame


class DisplaySink:
    """Terminal display with first-frame reset, overlays, and chat lines
    (src/common/session/display.c + src/client/display.c semantics)."""

    def __init__(self, stream=None, show_fps: bool = False):
        self.writer = term.FrameWriter(stream)
        self.show_fps = show_fps
        self.show_help = False
        self.fps = FpsCounter()
        self.frames_written = 0
        self._meta: tuple[str, tuple[int, int]] = ("", (0, 0))

    def setup(self) -> None:
        self.writer.setup()

    def teardown(self) -> None:
        self.writer.teardown()

    def set_meta(self, renderer_key: str, size: tuple[int, int]) -> None:
        self._meta = (renderer_key, size)

    def reset(self) -> None:
        """Force a full clear before the next frame (CLEAR_CONSOLE)."""
        self.writer._first = True

    def write_frame(self, frame: bytes) -> None:
        out = bytes(frame)
        if self.show_help:
            out += b"\x1b[0m\n" + ui.help_overlay()
        if self.show_fps:
            out += b"\x1b[0m\n" + ui.status_line(
                self.fps.fps, self.fps.frames, self._meta[0], self._meta[1])
        self.writer.write_frame(out)
        self.fps.tick()
        self.frames_written += 1

    def chat_line(self, text: bytes) -> None:
        """Inline chat below the frame (client text chat). SANITIZED: the
        bytes come from a relayed peer — raw control characters would let
        any chat participant inject ANSI/OSC escapes into every viewer's
        terminal (title spoofing, cursor games, emulator escape-handling
        bugs). Filtering must happen at the CODEPOINT level: a byte-level
        `b >= 0x80` allowlist passed C1 controls (raw 0x80-0x9F AND the
        UTF-8-encoded U+009B CSI, b'\\xc2\\x9b'), which terminals honoring
        8-bit controls execute exactly like ESC[. Printable text only;
        everything else becomes '?'."""
        s = text[:200].decode("utf-8", errors="replace")
        clean = "".join(
            ch if ch.isprintable() else "?" for ch in s
        ).encode("utf-8")
        self.writer.stream.write(b"\x1b[0m\r\n> " + clean + b"\r\n")
        self.writer.stream.flush()


class ReconnectPolicy:
    """Backoff-with-reset retry schedule (client_like.c reconnect loop)."""

    SCHEDULE = (0.5, 1.0, 2.0, 5.0)

    def __init__(self, enabled: bool = True, schedule: tuple[float, ...] = SCHEDULE):
        self.enabled = enabled
        self.schedule = schedule
        self._it = iter(schedule)

    def next_delay(self) -> float:
        return next(self._it, self.schedule[-1])

    def reset(self) -> None:
        self._it = iter(self.schedule)


class Pacer:
    """fps-cap pacing usable from thread loops and asyncio tasks alike:
    sleep_for(t0) returns how long to wait to hold the cadence."""

    def __init__(self, fps: float):
        self.interval = 1.0 / fps if fps else 0.0
        self._last = 0.0

    def sleep_for(self, t0: float, now: float) -> float:
        return max(0.0, self.interval - (now - t0))

    def should_drop(self, now: float) -> bool:
        """Display-side cap: drop frames arriving faster than the cadence
        (the mirror render loop's stay-at-cap rule)."""
        if now - self._last < self.interval:
            return True
        self._last = now
        return False
