"""Media sources: TEST pattern / FILE / STDIN (media source abstraction,
include/ascii-chat/media/source.h:81-86, lib/media/source.c).

Webcam capture (V4L2/AVFoundation/MediaFoundation in the reference) needs
camera hardware; in this environment the synthetic test pattern
(lib/video/webcam/webcam.c:21-27, MEDIA_SOURCE_TEST) is the capture device,
exactly as the reference's own test suite uses it. FILE decode uses PIL for
images and the ffmpeg CLI for video when present (the reference links
libav*; this runtime shells out — gated on availability).
"""

from __future__ import annotations

import shutil
import subprocess
import sys
import time

import numpy as np


class FrameSource:
    """Iterator of uint8 [H, W, 3] frames at a native size."""

    width: int
    height: int

    def read(self) -> np.ndarray | None:  # None = end of stream
        raise NotImplementedError

    def close(self) -> None:
        pass


class TestPatternSource(FrameSource):
    """Animated gradient + moving bars (synthetic webcam)."""

    def __init__(self, width: int = 640, height: int = 480, fps: float = 30.0):
        self.width = width
        self.height = height
        self.fps = fps
        self._t0 = time.monotonic()
        yy, xx = np.mgrid[0:height, 0:width]
        self._r = (xx * 255 // max(width - 1, 1)).astype(np.uint8)
        self._g = (yy * 255 // max(height - 1, 1)).astype(np.uint8)
        self._xx = xx

    def read(self) -> np.ndarray:
        t = time.monotonic() - self._t0
        phase = int(t * 60) % 256
        b = ((self._xx + phase) % 256).astype(np.uint8)
        frame = np.stack([self._r, self._g, b], axis=-1)
        # moving vertical bar for motion
        bar = int((t * self.width / 4) % self.width)
        frame[:, bar : min(bar + 8, self.width)] = (255, 255, 255)
        return frame


class ImageFileSource(FrameSource):
    """Still image via PIL, yielded repeatedly (like --file with an image)."""

    def __init__(self, path: str):
        from PIL import Image

        img = Image.open(path).convert("RGB")
        self._frame = np.asarray(img, dtype=np.uint8)
        self.height, self.width = self._frame.shape[:2]

    def read(self) -> np.ndarray:
        return self._frame


class FFmpegFileSource(FrameSource):
    """Video decode by piping rgb24 from the ffmpeg CLI (gated on PATH)."""

    def __init__(self, path: str, loop: bool = False):
        if not shutil.which("ffmpeg") or not shutil.which("ffprobe"):
            raise RuntimeError("ffmpeg/ffprobe not available on PATH")
        probe = subprocess.run(
            ["ffprobe", "-v", "error", "-select_streams", "v:0",
             "-show_entries", "stream=width,height", "-of", "csv=p=0", path],
            capture_output=True, text=True, check=True,
        )
        self.width, self.height = (int(v) for v in probe.stdout.strip().split(","))
        cmd = ["ffmpeg", "-v", "error"]
        if loop:
            cmd += ["-stream_loop", "-1"]
        cmd += ["-i", path, "-f", "rawvideo", "-pix_fmt", "rgb24", "-"]
        self._proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)
        self._frame_bytes = self.width * self.height * 3

    def read(self) -> np.ndarray | None:
        buf = self._proc.stdout.read(self._frame_bytes)
        if buf is None or len(buf) < self._frame_bytes:
            return None
        return np.frombuffer(buf, np.uint8).reshape(self.height, self.width, 3)

    def close(self) -> None:
        self._proc.kill()


class StdinSource(FrameSource):
    """Raw rgb24 frames on stdin at a declared size (--stdin, memory AVIO
    analog of ffmpeg_decoder.c:160-207)."""

    def __init__(self, width: int, height: int):
        self.width = width
        self.height = height
        self._n = width * height * 3

    def read(self) -> np.ndarray | None:
        buf = sys.stdin.buffer.read(self._n)
        if len(buf) < self._n:
            return None
        return np.frombuffer(buf, np.uint8).reshape(self.height, self.width, 3)


class WebcamSource(FrameSource):
    """Live camera via the V4L2 backend (runtime/webcam.py)."""

    def __init__(self, device: str = "/dev/video0", width: int = 640, height: int = 480):
        from asciichat_tpu.runtime.webcam import open_webcam

        self._cam = open_webcam(device, width, height)
        self.width = self._cam.width
        self.height = self._cam.height
        self.fps = 30.0

    def read(self):
        return self._cam.read()

    def close(self) -> None:
        self._cam.close()


def open_source(
    test_pattern: bool = False,
    file: str | None = None,
    stdin_size: tuple[int, int] | None = None,
    loop: bool = False,
    width: int = 640,
    height: int = 480,
) -> FrameSource:
    if stdin_size:
        return StdinSource(*stdin_size)
    if file:
        lower = file.lower()
        if lower.startswith(("http://", "https://")):
            # yt-dlp URL resolution fallback (lib/media/yt_dlp.c): resolve the
            # page URL to a direct media URL, then decode via ffmpeg
            if shutil.which("yt-dlp"):
                resolved = subprocess.run(
                    ["yt-dlp", "-g", "-f", "best", file],
                    capture_output=True, text=True, timeout=60,
                )
                if resolved.returncode == 0 and resolved.stdout.strip():
                    file = resolved.stdout.strip().split("\n")[0]
            return FFmpegFileSource(file, loop=loop)
        if lower.endswith((".png", ".jpg", ".jpeg", ".bmp", ".gif", ".webp")):
            return ImageFileSource(file)
        return FFmpegFileSource(file, loop=loop)
    if not test_pattern:
        # default capture device: webcam when present, else the synthetic
        # pattern (MEDIA_SOURCE_TEST fallback, webcam.c:21-27)
        from asciichat_tpu.runtime.webcam import WebcamUnavailable

        try:
            return WebcamSource(width=width, height=height)
        except WebcamUnavailable:
            pass
    return TestPatternSource(width, height)
