"""Compositor: gather-map plan + device gather vs an independent per-pixel
loop reference implementing src/server/stream.c:664-779 directly."""

import numpy as np
import pytest

from asciichat_tpu.ops import compositor as C
from asciichat_tpu.utils.aspect import resize_indices

from conftest import synthetic_frame


def _loop_composite(frames: list[np.ndarray], term_w: int, term_h: int) -> np.ndarray:
    """Direct re-expression of create_multi_source_composite's nested loops."""
    sizes = [(f.shape[1], f.shape[0]) for f in frames]
    cols, rows = C.optimal_grid_layout(sizes, term_w, term_h)
    comp_w, comp_h = term_w, term_h * 2
    comp = np.zeros((comp_h, comp_w, 3), np.uint8)
    for i, src in enumerate(frames[:9]):
        row, col = i // cols, i % cols
        cell_w, cell_h = comp_w // cols, comp_h // rows
        src_h, src_w = src.shape[:2]
        src_aspect = np.float32(src_w) / np.float32(src_h)
        cell_aspect = np.float32(cell_w) / np.float32(cell_h)
        if src_aspect > cell_aspect:
            tw = cell_w
            th = int(np.float32(cell_w) / src_aspect + np.float32(0.5))
        else:
            th = cell_h
            tw = int(np.float32(cell_h) * src_aspect + np.float32(0.5))
        tw, th = max(tw, 1), max(th, 1)
        ry, rx = resize_indices(src_h, th), resize_indices(src_w, tw)
        resized = src[ry][:, rx]
        x0, y0 = col * cell_w, row * cell_h
        xp, yp = (cell_w - tw) // 2, (cell_h - th) // 2
        for y in range(th):
            for x in range(tw):
                dx, dy = x0 + xp + x, y0 + yp + y
                if dx < x0 or dx > x0 + cell_w - 1 or dy < y0 or dy > y0 + cell_h - 1:
                    continue
                if dx < 0 or dx >= comp_w or dy < 0 or dy >= comp_h:
                    continue
                comp[dy, dx] = resized[y, x]
    return comp


@pytest.mark.parametrize("n_clients", [1, 2, 3, 4, 5, 9])
def test_composite_matches_loop_reference(n_clients):
    import jax.numpy as jnp

    sizes = [(80 + 16 * i, 60 + 8 * i) for i in range(n_clients)]
    frames = [synthetic_frame(h, w, seed=i) for i, (w, h) in enumerate(sizes)]
    term_w, term_h = 120, 40

    want = _loop_composite(frames, term_w, term_h)

    hmax = max(f.shape[0] for f in frames)
    wmax = max(f.shape[1] for f in frames)
    stack = np.zeros((n_clients, hmax, wmax, 3), np.uint8)
    for i, f in enumerate(frames):
        stack[i, : f.shape[0], : f.shape[1]] = f
    plan = C.plan_composite(sizes, term_w, term_h)
    got = np.asarray(C.composite_gather(jnp.asarray(stack), plan))
    np.testing.assert_array_equal(got, want)
    # host reference agrees too
    np.testing.assert_array_equal(C.composite_reference(stack, plan), want)


def test_grid_layout_cases():
    # single source -> 1x1 (stream.c:532-536)
    assert C.optimal_grid_layout([(100, 100)], 120, 40) == (1, 1)
    # 4 similar sources in a wide terminal: expect 2x2 (cells >= 20x10)
    cols, rows = C.optimal_grid_layout([(160, 120)] * 4, 120, 40)
    assert (cols, rows) == (2, 2)
    # tiny terminal -> constraints unsatisfiable, falls back to 1 x N
    cols, rows = C.optimal_grid_layout([(160, 120)] * 3, 30, 12)
    assert (cols, rows) == (1, 3)
    # empty
    assert C.optimal_grid_layout([], 80, 24) == (0, 0)


def test_composite_max_nine_sources():
    sizes = [(32, 24)] * 12
    plan = C.plan_composite(sizes, 200, 60)
    # only sources 0..8 appear in the maps (stream.c:687)
    assert plan.client_idx.max() == 8


def test_ascii_grid_single_source_centered():
    """ascii_create_grid single-source path (ascii.c:610-706): space canvas,
    newline-terminated rows, centered both ways using ANSI-aware widths."""
    from asciichat_tpu.render import asciigrid as ag

    out = ag.create_grid([b"ab\ncd"], 6, 4)
    rows = out.split(b"\n")[:-1]
    assert rows == [b"      ", b"  ab  ", b"  cd  ", b"      "]

    # ANSI sequences are zero-width for centering/truncation math
    colored = b"\x1b[38;2;1;2;3mab\x1b[0m"
    assert ag.ansi_visual_width(colored) == 2
    assert ag.ansi_truncate_to_visual_width(colored, len(colored), 1) == len(
        b"\x1b[38;2;1;2;3ma")
    # ...and a line whose BYTE length exceeds the remaining canvas is
    # dropped, exactly like the reference's bounds check (ascii.c:694-696) —
    # grids are built from mono frames in practice (host.c:696 converts
    # with color=false)
    out = ag.create_grid([colored + b"\ncd"], 6, 2)
    rows = out.split(b"\n")[:-1]
    assert rows[0] == b"      "


def test_ascii_grid_two_sources_separators():
    """Multi-source grid: |/_/+ separators, per-cell truncation, horizontal
    layout for 2 sources on a wide terminal (ascii.c:744-752 weighting)."""
    from asciichat_tpu.render import asciigrid as ag

    a = b"\n".join([b"A" * 20] * 10)
    b_ = b"\n".join([b"B" * 20] * 10)
    width, height = 41, 10  # 2 cols of 20 + 1 separator column
    out = ag.create_grid([a, b_], width, height)
    rows = out.split(b"\n")[:-1]
    assert len(rows) == height and all(len(r) == width for r in rows)
    assert rows[0] == b"A" * 20 + b"|" + b"B" * 20

    # 4 sources on a square-ish canvas -> 2x2 with a + corner
    srcs = [b"\n".join([ch * 12] * 4) for ch in (b"1", b"2", b"3", b"4")]
    out = ag.create_grid(srcs, 25, 9)
    rows = out.split(b"\n")[:-1]
    assert rows[0][:12] == b"1" * 12 and rows[0][12:13] == b"|"
    assert rows[4][:12] == b"_" * 12 and rows[4][12:13] == b"+"
    assert rows[5][13:25] == b"4" * 12

    # cells too small -> first source unchanged (ascii.c:779-792)
    tiny = ag.create_grid([b"xy", b"zw"], 12, 3)
    assert tiny == b"xy"


def test_ascii_grid_layout_scoring_matches_reference_rules():
    """Grid-shape scoring (ascii.c:714-772): 2 sources go horizontal on wide
    terminals and vertical on tall ones; >50%-empty layouts are skipped."""
    from asciichat_tpu.render import asciigrid as ag

    assert ag._grid_shape(2, 200, 24) == (2, 1)   # wide -> side by side
    assert ag._grid_shape(2, 24, 60) == (1, 2)    # tall -> stacked
    assert ag._grid_shape(4, 100, 40) == (2, 2)   # square bonus
    assert ag._grid_shape(3, 100, 40)[0] * ag._grid_shape(3, 100, 40)[1] >= 3
