"""Mirror mode: local capture -> ASCII -> terminal, no network.

Equivalent of mirror_main -> session_render_loop (src/mirror/main.c:379,
src/common/session/render.c:55) with the reference's 3-stage pipeline
(capture -> convert -> display, src/common/session/pipeline.c): capture runs
on a thread feeding a drop-on-full queue; the main loop converts on the TPU
and writes frames. --snapshot renders one frame and exits
(session/render.c:128-143).
"""

from __future__ import annotations

import threading
import time

from asciichat_tpu.ops import filters as filters_ops
from asciichat_tpu.render.pipeline import AsciiRenderer
from asciichat_tpu.render.types import TerminalCapabilities
from asciichat_tpu.runtime.double_buffer import FrameQueue
from asciichat_tpu.runtime.framesource import FrameSource
from asciichat_tpu.utils import term, ui
from asciichat_tpu.utils.fps import FpsCounter
from asciichat_tpu.utils.keyboard import KeyboardReader


class MirrorSession:
    def __init__(
        self,
        source: FrameSource,
        caps: TerminalCapabilities,
        width: int,
        height: int,
        palette: str,
        fps_limit: float = 60.0,
        color_filter: str = "none",
        flip_x: bool = False,
        flip_y: bool = False,
        stretch: bool = False,
        show_fps: bool = False,
        matrix: bool = False,
    ):
        self.source = source
        self.caps = caps
        self.width = width
        self.height = height
        self.renderer = AsciiRenderer(palette)
        self.fps_limit = fps_limit
        self.color_filter = color_filter
        self.flip_x = flip_x
        self.flip_y = flip_y
        self.stretch = stretch
        self.show_fps = show_fps
        self.matrix = matrix
        self._rain = None
        self._t0 = time.monotonic()
        self.queue = FrameQueue(maxsize=2)
        self.writer = term.FrameWriter()
        self.fps = FpsCounter()
        self._stop = threading.Event()
        self._show_help = False
        self._filter_cycle = ["none", "green", "cyan", "orange", "rainbow"]

    def _on_key(self, key: str) -> None:
        """Live keybindings (session keyboard_handler.c analog)."""
        if key in ("q", "\x03"):
            self._stop.set()
        elif key == "f":
            self.flip_x = not self.flip_x
        elif key == "m":
            self.matrix = not self.matrix
        elif key == "c":
            i = (self._filter_cycle.index(self.color_filter) + 1
                 if self.color_filter in self._filter_cycle else 0)
            self.color_filter = self._filter_cycle[i % len(self._filter_cycle)]
        elif key == "?":
            self._show_help = not self._show_help

    def _capture_thread(self) -> None:
        interval = 1.0 / getattr(self.source, "fps", 30.0)
        while not self._stop.is_set():
            t0 = time.monotonic()
            frame = self.source.read()
            if frame is None:
                self.queue.push(None)
                return
            self.queue.push(frame)
            dt = time.monotonic() - t0
            if dt < interval:
                time.sleep(interval - dt)

    def _convert(self, frame) -> bytes:
        import numpy as np

        if self.flip_x:
            frame = frame[:, ::-1]
        if self.flip_y:
            frame = frame[::-1]
        if self.matrix:
            import jax.numpy as jnp

            from asciichat_tpu.ops.rain import DigitalRain

            if self._rain is None or self._rain.num_columns != frame.shape[1]:
                self._rain = DigitalRain(frame.shape[1], frame.shape[0])
            frame = np.asarray(
                self._rain.apply(jnp.asarray(np.ascontiguousarray(frame)),
                                 time.monotonic() - self._t0)
            )
        if self.color_filter != "none":
            frame = filters_ops.apply_color_filter_reference(
                np.asarray(frame), self.color_filter, time.monotonic()
            )
        return self.renderer.convert(
            frame, self.width, self.height, self.caps, stretch=self.stretch
        )

    def run_snapshot(self) -> bytes:
        frame = self.source.read()
        out = self._convert(frame)
        self.writer.write_frame(out)
        return out

    def run(self, max_frames: int | None = None) -> int:
        cap = threading.Thread(target=self._capture_thread, daemon=True)
        cap.start()
        keyboard = KeyboardReader(self._on_key)
        keyboard.start()
        self.writer.setup()
        rendered = 0
        min_interval = 1.0 / self.fps_limit if self.fps_limit else 0.0
        last = 0.0
        try:
            while not self._stop.is_set():
                frame = self.queue.pop(timeout=1.0)
                if frame is None:
                    break
                now = time.monotonic()
                if now - last < min_interval:
                    continue  # drop: stay at the fps cap
                last = now
                out = self._convert(frame)
                if self._show_help:
                    out += b"\x1b[0m\n" + ui.help_overlay()
                if self.show_fps:
                    out += b"\x1b[0m\n" + ui.status_line(
                        self.fps.fps, self.fps.frames, self.caps.renderer_key(),
                        (self.width, self.height))
                self.writer.write_frame(out)
                self.fps.tick()
                rendered += 1
                if max_frames and rendered >= max_frames:
                    break
        except KeyboardInterrupt:
            pass
        finally:
            self._stop.set()
            keyboard.stop()
            self.writer.teardown()
            self.source.close()
        return rendered
