"""Unit tests for the exact-math primitives (resize, luma, quantizers,
palettes, aspect fitting, REP grammar) against hand-computed values."""

import numpy as np
import pytest

from asciichat_tpu.render import oracle
from asciichat_tpu.render import palette as pal
from asciichat_tpu.utils.aspect import aspect_ratio, resize_indices


def test_resize_indices_fixed_point():
    # image.c:293: ratio = ((src<<16)/dst)+1; src_i = (i*ratio)>>16
    idx = resize_indices(640, 80)
    ratio = ((640 << 16) // 80) + 1
    want = [min((i * ratio) >> 16, 639) for i in range(80)]
    assert idx.tolist() == want
    # Upscale duplicates indices, never exceeds src-1
    up = resize_indices(16, 40)
    assert up.min() == 0 and up.max() == 15
    # Identity-ish: the +1 bias still floors correctly for same-size
    same = resize_indices(100, 100)
    assert same.tolist() == list(range(100))


def test_luminance_formula():
    assert oracle.luminance(255, 255, 255) == 255
    assert oracle.luminance(0, 0, 0) == 0
    # (77*10 + 150*20 + 29*30 + 128) >> 8 = (770+3000+870+128)>>8 = 4768>>8 = 18
    assert oracle.luminance(10, 20, 30) == 18


def test_quantize_256_exact():
    # gray: avg=100, diff 0 -> 232 + 100*23//255 = 232+9 = 241
    assert oracle.rgb_to_256color(100, 100, 100) == 241
    # cube: (255,0,0) -> 16 + 5*36 = 196
    assert oracle.rgb_to_256color(255, 0, 0) == 196
    # near-gray threshold: diff < 30 stays gray
    assert oracle.rgb_to_256color(100, 105, 110) == 232 + (105 * 23) // 255


def test_quantize_16_first_wins():
    # (64,64,64) is equidistant from black(0) and gray... verify first-wins
    d = ((oracle.ANSI16_RGB - np.array([64, 64, 64])) ** 2).sum(axis=1)
    best = int(np.argmin(d))
    assert oracle.rgb_to_16color(64, 64, 64) == best


def test_rep_profitability_boundary():
    # output_buffer.c:148: run>2 and run-1 > digits(run-1)+3
    assert not oracle.rep_is_profitable(2)
    assert not oracle.rep_is_profitable(5)  # k=4, digits(4)+3=4, 4>4 false
    assert oracle.rep_is_profitable(6)  # k=5 > 4
    assert not oracle.rep_is_profitable(1)


def test_palette_double_indirection():
    """Mono glyph = chars[ramp[ramp[luma>>2]]] (foreground.c:97-102)."""
    cache = pal.get_palette_cache(pal.DEFAULT_PALETTE)
    n = cache.char_count
    assert n == 23
    # luma bucket 63 -> ramp[63] = 22 -> cache64[22] = chars[ramp[22]]
    k = cache.char_index_ramp[63]
    assert k == 22
    inner = cache.char_index_ramp[22]  # (22*22+31)//63 = 8
    assert inner == (22 * 22 + 31) // 63
    assert cache.mono_glyphs()[k] == cache.chars[inner]


def test_palette_utf8_parsing():
    chars = pal.parse_utf8_chars(pal.PALETTE_BLOCKS)
    assert len(chars) == 11
    assert chars[0] == b" "
    assert chars[3] == "░".encode()
    assert all(len(c) in (1, 3) for c in chars)


def test_aspect_ratio_char_correction():
    # 2:1 cell aspect: a square 100x100 image in an 80x24 terminal
    w, h = aspect_ratio(100, 100, 80, 24, stretch=False)
    # width_from_height = round(24 * 1 * 2.0) = 48 <= 80 -> (48, 24)
    assert (w, h) == (48, 24)
    # width-constrained case
    w, h = aspect_ratio(400, 100, 80, 24, stretch=False)
    # width_from_height = round(24*4*2)=192 > 80 -> (80, round(80/2*100/400)=10)
    assert (w, h) == (80, 10)
    assert aspect_ratio(100, 100, 80, 24, stretch=True) == (80, 24)


def test_pad_frames():
    f = b"ab\ncd"
    assert oracle.pad_frame_width(f, 2) == b"  ab\n  cd"
    assert oracle.pad_frame_height(f, 2) == b"\n\nab\ncd"
    # padding spaces are NOT added to the blank top rows (height pads after width)
    assert oracle.pad_frame_height(oracle.pad_frame_width(f, 1), 1) == b"\n ab\n cd"


def test_fs_dither_c_truncation():
    # C truncation toward zero for negative errors: (-7*7)/16 = -3 (not -4)
    assert oracle._c_div16(-49) == -3
    assert oracle._c_div16(49) == 3


def test_mono_rep_in_output():
    """A 20-wide flat row must REP-compress: glyph + ESC[19b."""
    frame = np.full((1, 20, 3), 200, dtype=np.uint8)
    out = oracle.render_mono(frame)
    lum = oracle.luminance(200, 200, 200)
    cache = pal.get_palette_cache(pal.DEFAULT_PALETTE)
    glyph = cache.mono_glyphs()[cache.char_index_ramp[lum >> 2]]
    assert out == glyph + b"\x1b[19b"


def test_ordered_dither_matches_reference_formula():
    """Bayer ordered dithering (neon/common.c:369-397): strength 0 is the
    production no-op; strength>0 matches a scalar reimplementation of the
    NEON integer math (saturating add of (bayer[(pos+ch)&15]*s)>>4)."""
    import numpy as np

    from asciichat_tpu.ops.pixel import ordered_dither

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    assert np.array_equal(np.asarray(ordered_dither(rgb, 0)), rgb)

    bayer = [0, 8, 2, 10, 12, 4, 14, 6, 3, 11, 1, 9, 15, 7, 13, 5]
    for s in (1, 8, 255):
        got = np.asarray(ordered_dither(rgb, s))
        want = rgb.astype(np.int64).copy()
        h, w, _ = rgb.shape
        for y in range(h):
            for x in range(w):
                # row-relative column index, identical per row (the NEON row
                # loop passes x as pixel_offset, neon/color.c)
                for c in range(3):
                    want[y, x, c] += (bayer[(x + c) & 15] * s) >> 4
        want = np.clip(want, 0, 255).astype(np.uint8)
        assert np.array_equal(got, want), s
