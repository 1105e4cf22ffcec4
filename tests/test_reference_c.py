"""Ground-truth byte-exactness: the oracle vs the COMPILED reference C.

Every other render test bottoms out at render/oracle.py, which was
hand-derived from reading the reference sources — a misreading would be
invisibly "green" everywhere. This module closes that loop the way the
reference's own simd_scalar_comparison_test does for SIMD-vs-scalar: it
compiles the REAL reference renderer sources (scalar/foreground.c,
halfblock.c, background.c, output_buffer.c, terminal/ansi.c, rgba/image.c,
ascii.c dispatch + padding, palette/common caches) into a TEST-ONLY
sanitized executable (native/refc/driver.c) and asserts
C output == oracle output across all mode/level combos and a fuzz corpus.

The driver is never linked into the product; reference code is treated as
untrusted (ASan/UBSan, subprocess isolation). Compile-or-skip: systems
without g++ or without /root/reference skip cleanly.
"""

import os
import struct
import subprocess
from pathlib import Path

import numpy as np
import pytest

from asciichat_tpu.render import oracle
from asciichat_tpu.render import palette as pal
from asciichat_tpu.render.types import ColorLevel, RenderMode, TerminalCapabilities

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
REFC_DIR = REPO / "native" / "refc"
BUILD_DIR = REPO / "native" / "build"

# Reference translation units compiled unmodified (read directly from the
# read-only reference tree; nothing is copied into this repo).
REF_SOURCES = [
    "lib/video/ascii/common.c",
    "lib/video/ascii/palette.c",
    "lib/video/ascii/output_buffer.c",
    "lib/video/ascii/rle.c",
    "lib/video/ascii/sgr.c",
    "lib/video/ascii/scalar/foreground.c",
    "lib/video/ascii/scalar/background.c",
    "lib/video/ascii/scalar/halfblock.c",
    "lib/video/terminal/ansi.c",
    "lib/video/rgba/image.c",
    "lib/util/aspect_ratio.c",
    "lib/util/utf8.c",
    "lib/util/image.c",
]

MAGIC = 0x31434652  # "RFC1"


def _build_driver() -> Path:
    import shutil

    if not shutil.which("g++"):
        pytest.skip("no g++")
    if not REFERENCE.is_dir():
        pytest.skip("reference tree not present")
    exe = BUILD_DIR / "refc_driver"
    srcs = [REFC_DIR / "driver.c", *(REFC_DIR / "stubinc").rglob("*.h")]
    newest = max(p.stat().st_mtime for p in srcs)
    if exe.exists() and exe.stat().st_mtime >= newest:
        return exe
    BUILD_DIR.mkdir(exist_ok=True)
    san = ["-fsanitize=address,undefined", "-fno-sanitize-recover=all"]
    base = ["g++", "-x", "c", "-std=gnu17", "-O1", "-g", *san,
            f"-I{REFC_DIR / 'stubinc'}", f"-I{REFERENCE / 'include'}"]
    objdir = BUILD_DIR / "refc_obj"
    objdir.mkdir(exist_ok=True)
    objs = []
    try:
        for rel in REF_SOURCES:
            obj = objdir / (rel.replace("/", "_") + ".o")
            subprocess.run([*base, "-c", "-o", str(obj), str(REFERENCE / rel)],
                           check=True, capture_output=True, timeout=300)
            objs.append(str(obj))
        # ascii.c with SIMD_SUPPORT: selects the PRODUCTION truecolor dispatch
        # (image_print_color_simd in sgr.c, whose "SIMD" paths fall through to
        # the scalar renderers — sgr.c:413-436)
        obj = objdir / "ascii.c.o"
        subprocess.run([*base, "-DSIMD_SUPPORT", "-c", "-o", str(obj),
                        str(REFERENCE / "lib/video/ascii/ascii.c")],
                       check=True, capture_output=True, timeout=300)
        objs.append(str(obj))
        dobj = objdir / "driver.o"
        subprocess.run([*base, "-c", "-o", str(dobj), str(REFC_DIR / "driver.c")],
                       check=True, capture_output=True, timeout=300)
        subprocess.run(["g++", *san, "-o", str(exe), str(dobj), *objs,
                        "-lpthread", "-lm"],
                       check=True, capture_output=True, timeout=300)
    except subprocess.CalledProcessError as e:
        pytest.skip(f"reference C not buildable here: {e.stderr.decode()[-500:]}")
    return exe


class RefC:
    """One driver process serving many conversion requests over stdio."""

    def __init__(self, exe: Path):
        env = {**os.environ,
               "LSAN_OPTIONS": f"suppressions={REFC_DIR / 'lsan_suppressions.txt'}"}
        self.proc = subprocess.Popen([str(exe)], stdin=subprocess.PIPE,
                                     stdout=subprocess.PIPE, env=env)

    def convert(self, rgb: np.ndarray, width: int, height: int,
                caps: TerminalCapabilities, use_aspect: bool = True,
                stretch: bool = False, palette: str = pal.DEFAULT_PALETTE) -> bytes:
        pb = palette.encode()
        h, w = rgb.shape[:2]
        req = struct.pack(
            "<IiiiiBBBBBH", MAGIC, w, h, width, height,
            int(caps.color_level), int(caps.render_mode),
            1 if caps.wants_padding else 0, 1 if use_aspect else 0,
            1 if stretch else 0, len(pb),
        ) + pb + np.ascontiguousarray(rgb, np.uint8).tobytes()
        self.proc.stdin.write(req)
        self.proc.stdin.flush()
        hdr = self.proc.stdout.read(4)
        assert len(hdr) == 4, "reference driver died (sanitizer abort?)"
        (n,) = struct.unpack("<I", hdr)
        assert n != 0xFFFFFFFF, "reference C returned NULL"
        return self.proc.stdout.read(n)

    def close(self) -> int:
        self.proc.stdin.close()
        return self.proc.wait(timeout=60)


@pytest.fixture(scope="module")
def refc():
    c = RefC(_build_driver())
    yield c
    # exit code surfaces LSan/ASan failures found at shutdown
    assert c.close() == 0, "sanitizers flagged the reference run"


ALL_COMBOS = [
    (lvl, mode)
    for mode in (RenderMode.FOREGROUND, RenderMode.BACKGROUND, RenderMode.HALF_BLOCK)
    for lvl in (ColorLevel.NONE, ColorLevel.COLOR_16, ColorLevel.COLOR_256,
                ColorLevel.TRUECOLOR)
]


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 255 // max(w - 1, 1)), (yy * 255 // max(h - 1, 1)),
                     ((xx + yy) % 256)], -1).astype(np.uint8)


@pytest.mark.parametrize("lvl,mode", ALL_COMBOS)
def test_all_modes_match_compiled_c(refc, lvl, mode):
    """Every renderer family x color depth, on structured + random + black
    content (black exercises the transparency/space paths)."""
    caps = TerminalCapabilities(lvl, mode)
    rng = np.random.default_rng(int(lvl) * 10 + int(mode))
    frames = [
        _gradient(48, 64),
        rng.integers(0, 256, (33, 47, 3), dtype=np.uint8),
        np.zeros((20, 30, 3), np.uint8),
    ]
    for f in frames:
        got_c = refc.convert(f, 40, 12, caps)
        want = oracle.ascii_convert_with_capabilities(f, 40, 12, caps)
        assert got_c == want, f"{mode.name}/{lvl.name} src={f.shape}"


def test_geometry_padding_aspect_vs_c(refc):
    """aspect/stretch/padding/odd-size geometry paths (ascii.c:214-253,
    ascii_pad_frame_width/height, halfblock height doubling)."""
    f = _gradient(37, 61)
    cases = [
        dict(caps=TerminalCapabilities(ColorLevel.TRUECOLOR, RenderMode.FOREGROUND),
             width=80, height=40),                      # centering pads
        dict(caps=TerminalCapabilities(ColorLevel.TRUECOLOR, RenderMode.FOREGROUND,
                                       wants_padding=False), width=80, height=40),
        dict(caps=TerminalCapabilities(ColorLevel.NONE, RenderMode.FOREGROUND),
             width=7, height=3),                        # tiny
        dict(caps=TerminalCapabilities(ColorLevel.TRUECOLOR, RenderMode.HALF_BLOCK),
             width=31, height=17),                      # odd halfblock height
        dict(caps=TerminalCapabilities(ColorLevel.COLOR_256, RenderMode.FOREGROUND),
             width=50, height=20, stretch=True),
        dict(caps=TerminalCapabilities(ColorLevel.COLOR_16, RenderMode.HALF_BLOCK),
             width=24, height=9, use_aspect=False),
    ]
    for kw in cases:
        got_c = refc.convert(f, **kw)
        want = oracle.ascii_convert_with_capabilities(
            f, kw["width"], kw["height"], kw["caps"],
            use_aspect_ratio=kw.get("use_aspect", True),
            stretch=kw.get("stretch", False))
        assert got_c == want, f"case {kw}"


def test_palettes_vs_c(refc):
    """Built-in palettes incl. UTF-8 glyph ramps (palette cache, display
    widths, the multi-byte bypass in the truecolor RLE renderer)."""
    f = _gradient(24, 40)
    for palette in (pal.PALETTE_STANDARD, pal.PALETTE_BLOCKS, pal.PALETTE_MINIMAL,
                    " .:-=+*#%@", "@%#*+=-:. "):
        for caps in (TerminalCapabilities(ColorLevel.TRUECOLOR, RenderMode.FOREGROUND),
                     TerminalCapabilities(ColorLevel.NONE, RenderMode.FOREGROUND),
                     TerminalCapabilities(ColorLevel.COLOR_256, RenderMode.HALF_BLOCK)):
            got_c = refc.convert(f, 32, 10, caps, palette=palette)
            want = oracle.ascii_convert_with_capabilities(f, 32, 10, caps,
                                                          palette=palette)
            assert got_c == want, f"palette={palette!r} caps={caps.renderer_key()}"


def test_fuzz_vs_compiled_c(refc):
    """Fuzz corpus vs the compiled C (>=200 seeds; ASCIICHAT_FUZZ_SEEDS
    widens). Mirrors tests/test_fuzz_render.py's generator so the same
    corpus that gates the fast path also gates the oracle itself."""
    from tests.test_fuzz_render import CAPS_POOL, PALETTES

    n = max(200, int(os.environ.get("ASCIICHAT_FUZZ_SEEDS", "0")))
    for seed in range(3000, 3000 + n):
        rng = np.random.default_rng(seed)
        src_h = int(rng.integers(2, 90))
        src_w = int(rng.integers(2, 120))
        width = int(rng.integers(2, 70))
        height = int(rng.integers(2, 30))
        stretch = bool(rng.integers(0, 2))
        caps = CAPS_POOL[seed % len(CAPS_POOL)]
        palette = PALETTES[seed % len(PALETTES)]
        frame = rng.integers(0, 256, (src_h, src_w, 3), dtype=np.uint8)
        if seed % 3 == 0:
            frame[:, : src_w // 2] = frame[:, :1]  # long runs
        if seed % 4 == 0:
            frame[: src_h // 2] = 0  # transparency regions
        got_c = refc.convert(frame, width, height, caps, stretch=stretch,
                             palette=palette)
        want = oracle.ascii_convert_with_capabilities(
            frame, width, height, caps, stretch=stretch, palette=palette)
        assert got_c == want, (
            f"seed={seed} src={src_w}x{src_h} dst={width}x{height} "
            f"caps={caps.renderer_key()} stretch={stretch} palette={palette!r}"
        )


# ---------------------------------------------------------------------------
# Color filters vs the compiled reference color_filter.c
# ---------------------------------------------------------------------------

def _build_filter_driver() -> Path:
    import shutil

    if not shutil.which("g++"):
        pytest.skip("no g++")
    if not REFERENCE.is_dir():
        pytest.skip("reference tree not present")
    exe = BUILD_DIR / "refc_filter_driver"
    src = REFC_DIR / "filter_driver.c"
    if exe.exists() and exe.stat().st_mtime >= src.stat().st_mtime:
        return exe
    BUILD_DIR.mkdir(exist_ok=True)
    san = ["-fsanitize=address,undefined", "-fno-sanitize-recover=all"]
    # compile-then-link like _build_driver: g++'s one-shot compile+link
    # ignores `-x c` and runs cc1plus on the reference C
    base = ["g++", "-x", "c", "-std=gnu17", "-O1", "-g", *san,
            f"-I{REFC_DIR / 'stubinc'}", f"-I{REFERENCE / 'include'}"]
    objdir = BUILD_DIR / "refc_obj"
    objdir.mkdir(exist_ok=True)
    try:
        objs = []
        for label, path in (("filter_driver", src),
                            ("color_filter", REFERENCE / "lib/video/rgba/color_filter.c")):
            obj = objdir / f"fd_{label}.o"
            subprocess.run([*base, "-c", "-o", str(obj), str(path)],
                           check=True, capture_output=True, timeout=300)
            objs.append(str(obj))
        subprocess.run(["g++", *san, "-o", str(exe), *objs, "-lm"],
                       check=True, capture_output=True, timeout=300)
    except subprocess.CalledProcessError as e:
        pytest.skip(f"reference color_filter.c not buildable: "
                    f"{e.stderr.decode()[-500:]}")
    return exe


FD_MAGIC = 0x31464652  # "RFF1"


class RefFilter:
    def __init__(self, exe: Path):
        env = {**os.environ,
               "LSAN_OPTIONS": f"suppressions={REFC_DIR / 'lsan_suppressions.txt'}"}
        self.proc = subprocess.Popen([str(exe)], stdin=subprocess.PIPE,
                                     stdout=subprocess.PIPE, env=env)

    def rainbow(self, time_s: float) -> tuple:
        self.proc.stdin.write(struct.pack("<IBf", FD_MAGIC, 0,
                                          np.float32(time_s)))
        self.proc.stdin.flush()
        out = self.proc.stdout.read(3)
        assert len(out) == 3, "filter driver died (sanitizer abort?)"
        return tuple(out)

    def apply(self, name: str, frame: np.ndarray, time_s: float = 0.0) -> np.ndarray:
        h, w = frame.shape[:2]
        nb = name.encode()
        req = (struct.pack("<IBH", FD_MAGIC, 1, len(nb)) + nb
               + struct.pack("<IIf", w, h, np.float32(time_s))
               + np.ascontiguousarray(frame, np.uint8).tobytes())
        self.proc.stdin.write(req)
        self.proc.stdin.flush()
        hdr = self.proc.stdout.read(4)
        assert len(hdr) == 4, "filter driver died (sanitizer abort?)"
        (n,) = struct.unpack("<I", hdr)
        assert n == w * h * 3, "reference apply_color_filter failed"
        buf = self.proc.stdout.read(n)
        return np.frombuffer(buf, np.uint8).reshape(h, w, 3)

    def close(self) -> int:
        self.proc.stdin.close()
        return self.proc.wait(timeout=60)


@pytest.fixture(scope="module")
def reff():
    c = RefFilter(_build_filter_driver())
    yield c
    assert c.close() == 0, "sanitizers flagged the reference filter run"


def test_rainbow_color_vs_c(reff):
    """rainbow_color must reproduce color_filter_calculate_rainbow's float32
    arithmetic bit-for-bit (fmodf/floorf segments, +0.5f rounding, fminf
    luminance boost) — float64 evaluation diverges +-1 on boundary
    timestamps (color_filter.c:169-243)."""
    from asciichat_tpu.ops.filters import rainbow_color

    rng = np.random.default_rng(77)
    times = [0.0, 0.5833333, 1.1666666, 1.75, 2.3333333, 2.9166666, 3.4999999,
             3.5, 7.0, 1e6 + 0.25]
    times += list(rng.uniform(0, 3.5, 400))
    times += list(rng.uniform(0, 1e5, 100))
    # NEGATIVE times (clock skew / epoch-relative offsets): C's truncating
    # `i % 6` yields a negative segment -> the switch default (red), where
    # Python's floored % would wrap into a valid hue segment and diverge
    times += [-1.0, -0.25, -3.4999, -7.5] + list(rng.uniform(-100, 0, 50))
    for t in times:
        want = reff.rainbow(t)
        got = rainbow_color(t)
        assert got == want, f"time={t!r}: py={got} c={want}"


def test_apply_color_filter_vs_c(reff):
    """The batched device kernel AND the numpy reference vs the compiled C
    per-pixel loop, every registered filter (apply_color_filter,
    color_filter.c:274-345)."""
    import jax.numpy as jnp

    from asciichat_tpu.ops import filters

    rng = np.random.default_rng(13)
    frames = [rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
              for _ in range(2)]
    frames.append(np.zeros((8, 8, 3), np.uint8))
    frames.append(np.full((8, 8, 3), 255, np.uint8))
    t = 1.234
    names = filters.FILTER_NAMES
    for frame in frames:
        want_c = np.stack([reff.apply(n, frame, t) for n in names])
        got_np = np.stack(
            [filters.apply_color_filter_reference(frame, n, t) for n in names])
        np.testing.assert_array_equal(got_np, want_c)
        tint, fg, rb, en = filters.filter_params(names, time_s=t)
        got_dev = np.asarray(filters.apply_color_filter(
            jnp.broadcast_to(jnp.asarray(frame), (len(names),) + frame.shape),
            jnp.asarray(tint), jnp.asarray(fg), jnp.asarray(rb),
            jnp.asarray(en)))
        np.testing.assert_array_equal(got_dev, want_c)
