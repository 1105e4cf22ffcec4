"""--render-file: offline render of the ASCII stream to a video file.

The reference rasters its terminal output through libvterm + FreeType into
pixels and encodes via libav (lib/media/render/renderer.c:28,
lib/media/ffmpeg_encoder.c). TPU-native reformulation: the renderer's cell
records are converted BACK to pixels on-device — one fused kernel colors each
cell from its fg/bg record (half-block cells render their true top/bottom
colors; glyph cells approximate ink coverage from the luminance ramp) — and
frames stream to a Y4M (YCbCr 4:4:4, BT.601 full-range) file that any player
or ffmpeg (when present) can consume. Glyph-accurate font rasterization is a
documented divergence (no FreeType here).
"""

from __future__ import annotations

import functools
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np

from asciichat_tpu.ops import cells as cells_mod
from asciichat_tpu.render.pipeline import AsciiRenderer, plan_render
from asciichat_tpu.render.types import TerminalCapabilities


@functools.partial(jax.jit, static_argnames=("mode", "scale"))
def cells_to_pixels(records: dict, mode: str, scale: int = 8) -> jax.Array:
    """Cell records -> uint8 RGB frames [B, rows*scale, cols*scale(/1), 3]."""
    if mode == "halfblock_truecolor":
        top, bot = records["top"].astype(jnp.uint8), records["bot"].astype(jnp.uint8)
        px = jnp.stack([top, bot], axis=2)  # [B, R, 2, W, 3]
        b, r, _, w, _ = px.shape
        px = px.reshape(b, r * 2, w, 3)
    elif mode == "truecolor_fg":
        rgb = records["rgb"].astype(jnp.int32)
        cov = records["luma"].astype(jnp.int32)[..., None]
        px = ((rgb * cov) // 255).astype(jnp.uint8)  # ink-coverage approx
    elif mode == "mono":
        key = records["key"].astype(jnp.int32)
        v = jnp.clip(key * 255 // 63, 0, 255).astype(jnp.uint8)
        px = jnp.stack([v, v, v], axis=-1)
    else:
        raise ValueError(f"render-file unsupported for mode {mode!r}")
    # nearest upscale so cells are visible blocks
    px = jnp.repeat(jnp.repeat(px, scale // 2 if mode.startswith("halfblock") else scale,
                               axis=-3), scale, axis=-2)
    return px


@jax.jit
def rgb_to_ycbcr444(rgb: jax.Array) -> jax.Array:
    """BT.601 full-range integer RGB -> YCbCr (for Y4M C444)."""
    px = rgb.astype(jnp.int32)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = (77 * r + 150 * g + 29 * b + 128) >> 8
    cb = jnp.clip(128 + ((-43 * r - 85 * g + 128 * b + 128) >> 8), 0, 255)
    cr = jnp.clip(128 + ((128 * r - 107 * g - 21 * b + 128) >> 8), 0, 255)
    return jnp.stack([y, cb, cr], axis=-1).astype(jnp.uint8)


class Y4MWriter:
    """Minimal YUV4MPEG2 writer, C444 colorspace."""

    def __init__(self, path: str, width: int, height: int, fps: int = 30):
        self.f = open(path, "wb")
        self.f.write(
            f"YUV4MPEG2 W{width} H{height} F{fps}:1 Ip A1:1 C444\n".encode()
        )

    def write(self, ycbcr: np.ndarray) -> None:
        self.f.write(b"FRAME\n")
        # planar: all Y, all Cb, all Cr
        self.f.write(np.ascontiguousarray(ycbcr[..., 0]).tobytes())
        self.f.write(np.ascontiguousarray(ycbcr[..., 1]).tobytes())
        self.f.write(np.ascontiguousarray(ycbcr[..., 2]).tobytes())

    def close(self) -> None:
        self.f.close()


def render_to_file(
    source,
    out_path: str,
    caps: TerminalCapabilities,
    width: int,
    height: int,
    palette: str,
    max_frames: int = 300,
    fps: int = 30,
    scale: int = 8,
) -> int:
    """Offline render loop: source frames -> cell records -> pixel frames ->
    Y4M (transcoded via ffmpeg when out_path isn't .y4m and ffmpeg exists)."""
    renderer = AsciiRenderer(palette)
    y4m_path = out_path if out_path.endswith(".y4m") else out_path + ".y4m"

    writer = None
    rendered = 0
    for _ in range(max_frames):
        frame = source.read()
        if frame is None:
            break
        frame = np.asarray(frame)
        plan = plan_render(frame.shape[1], frame.shape[0], width, height, caps)
        records = renderer.cells_for_plan(jnp.asarray(frame[None]), plan)
        px = cells_to_pixels(records, plan.mode, scale)
        ycbcr = np.asarray(rgb_to_ycbcr444(px))[0]
        if writer is None:
            writer = Y4MWriter(y4m_path, ycbcr.shape[1], ycbcr.shape[0], fps)
        writer.write(ycbcr)
        rendered += 1
    if writer:
        writer.close()
    if out_path != y4m_path and shutil.which("ffmpeg"):
        subprocess.run(["ffmpeg", "-y", "-v", "error", "-i", y4m_path, out_path],
                       check=True)
    return rendered
