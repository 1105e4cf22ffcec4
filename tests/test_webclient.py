"""Browser client: ANSI->cell-grid parser golden tests + asset serving.

The browser render core (web/ansi.js) parses oracle-grammar frames into
typed-array cell grids. Its Python twin (web/ansiparse.py, same algorithm)
is golden-tested here against EVERY oracle render mode: for random frames,
parse(oracle_bytes) must reproduce the per-cell (glyph, fg, bg) derived
independently from the pixel math. When a node interpreter is available the
actual JS file is run against the same corpus (skip otherwise — this image
has no JS runtime; see README 'web client' notes).

Reference grammars: lib/video/ascii/scalar/foreground.c, halfblock.c,
output_buffer.c:107-164, terminal/ansi.c:360-583.
"""

from __future__ import annotations

import json
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from asciichat_tpu.render import oracle
from asciichat_tpu.render import palette as pal
from asciichat_tpu.web import ansiparse

REPO = Path(__file__).resolve().parent.parent


def _pack(r, g, b):
    return (int(r) << 16) | (int(g) << 8) | int(b)


def _luma(px):
    return oracle.clamp_rgb(oracle.luminance(int(px[0]), int(px[1]), int(px[2])))


def _cp(glyph_bytes: bytes) -> int:
    return ord(glyph_bytes.decode())


def _mode_seed(mode: str) -> int:
    """Deterministic per-mode seed: hash() is randomized per process, which
    made one full-suite run hit a frame no rerun could reproduce."""
    import zlib

    return zlib.crc32(mode.encode())


def _rand_frames(seed, n=3, hmax=24, wmax=40):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        h = int(rng.integers(2, hmax))
        w = int(rng.integers(2, wmax))
        kind = rng.integers(0, 3)
        if kind == 0:
            rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        elif kind == 1:  # flat runs + black regions (exercises RLE/REP paths)
            rgb = np.zeros((h, w, 3), np.uint8)
            for _ in range(int(rng.integers(1, 6))):
                y0, x0 = int(rng.integers(0, h)), int(rng.integers(0, w))
                y1, x1 = int(rng.integers(y0, h)) + 1, int(rng.integers(x0, w)) + 1
                rgb[y0:y1, x0:x1] = rng.integers(0, 256, 3, dtype=np.uint8)
        else:  # gradient
            yy, xx = np.mgrid[0:h, 0:w]
            rgb = np.stack([xx * 255 // max(w - 1, 1),
                            yy * 255 // max(h - 1, 1),
                            (xx + yy) % 256], -1).astype(np.uint8)
        yield rgb


# --------------------------------------------------------------------------
# expected cells per mode, derived from pixel math (NOT from the emitters)

def _cells_mono(rgb, cache):
    h, w = rgb.shape[:2]
    g = np.zeros((h, w), np.int64)
    f = np.full((h, w), -1, np.int64)
    b = np.full((h, w), -1, np.int64)
    for y in range(h):
        for x in range(w):
            key = cache.char_index_ramp[_luma(rgb[y, x]) >> 2]
            g[y, x] = _cp(cache.mono_glyphs()[key])
    return g, f, b


def _cells_truecolor_fg(rgb, cache):
    h, w = rgb.shape[:2]
    g = np.zeros((h, w), np.int64)
    f = np.zeros((h, w), np.int64)
    b = np.full((h, w), -1, np.int64)
    for y in range(h):
        for x in range(w):
            g[y, x] = _cp(cache.cache256[_luma(rgb[y, x])])
            f[y, x] = _pack(*rgb[y, x])
    return g, f, b


def _cells_256(rgb, cache):
    h, w = rgb.shape[:2]
    g = np.zeros((h, w), np.int64)
    f = np.zeros((h, w), np.int64)
    b = np.full((h, w), -1, np.int64)
    for y in range(h):
        for x in range(w):
            px = rgb[y, x]
            g[y, x] = _cp(cache.cache256[_luma(px)])
            f[y, x] = ansiparse.xterm256(
                oracle.rgb_to_256color(int(px[0]), int(px[1]), int(px[2])))
    return g, f, b


def _cells_16(rgb, cache):
    h, w = rgb.shape[:2]
    g = np.zeros((h, w), np.int64)
    f = np.zeros((h, w), np.int64)
    b = np.full((h, w), -1, np.int64)
    for y in range(h):
        for x in range(w):
            px = rgb[y, x]
            idx = oracle.rgb_to_16color(int(px[0]), int(px[1]), int(px[2]))
            g[y, x] = _cp(cache.cache256[cache.char_index_ramp[_luma(px) >> 2]])
            f[y, x] = ansiparse.ANSI16[idx]
    return g, f, b


def _cells_16_dithered(rgb, cache):
    h, w = rgb.shape[:2]
    idxs = oracle._fs_dither_indices(rgb)
    g = np.zeros((h, w), np.int64)
    f = np.zeros((h, w), np.int64)
    b = np.full((h, w), -1, np.int64)
    for y in range(h):
        for x in range(w):
            g[y, x] = _cp(cache.cache256[cache.char_index_ramp[_luma(rgb[y, x]) >> 2]])
            f[y, x] = ansiparse.ANSI16[int(idxs[y, x])]
    return g, f, b


def _cells_16_dithered_bg(rgb, cache):
    h, w = rgb.shape[:2]
    idxs = oracle._fs_dither_indices(rgb)
    g = np.zeros((h, w), np.int64)
    f = np.zeros((h, w), np.int64)
    b = np.zeros((h, w), np.int64)
    for y in range(h):
        for x in range(w):
            idx = int(idxs[y, x])
            br = oracle.ANSI16_RGB[idx]
            bg_lum = (int(br[0]) * 77 + int(br[1]) * 150 + int(br[2]) * 29) // 256
            g[y, x] = _cp(cache.cache256[_luma(rgb[y, x])])
            b[y, x] = ansiparse.ANSI16[idx]
            f[y, x] = ansiparse.ANSI16[15 if bg_lum < 127 else 0]
    return g, f, b


def _cells_halfblock_truecolor(rgb, cache):
    rows = list(oracle._hb_rows(rgb))
    h, w = len(rows), rgb.shape[1]
    g = np.full((h, w), 32, np.int64)
    f = np.full((h, w), -1, np.int64)
    b = np.full((h, w), -1, np.int64)
    for y, (top, bot, _last) in enumerate(rows):
        for x in range(w):
            t = tuple(int(v) for v in top[x])
            btm = tuple(int(v) for v in bot[x])
            if t == (0, 0, 0) and btm == (0, 0, 0):
                continue  # transparent: space, no colors
            g[y, x] = 0x2580
            f[y, x] = _pack(*t)
            b[y, x] = _pack(*btm)
    return g, f, b


def _cells_halfblock_indexed(rgb, cache, quant, resolve):
    """Indexed halfblocks run on QUANTIZED (fg,bg) pairs, and transparency
    is decided by the RUN'S FIRST pixel being raw-black (halfblock.c:297-405
    run-start rule): a run that starts black renders as spaces even where
    later members are non-black (they quantize equal), and vice versa —
    so expectations must walk runs, not cells."""
    rows = list(oracle._hb_rows(rgb))
    h, w = len(rows), rgb.shape[1]
    g = np.full((h, w), 32, np.int64)
    f = np.full((h, w), -1, np.int64)
    b = np.full((h, w), -1, np.int64)
    for y, (top, bot, _last) in enumerate(rows):
        x = 0
        while x < w:
            t = tuple(int(v) for v in top[x])
            btm = tuple(int(v) for v in bot[x])
            cf, cb = quant(*t), quant(*btm)
            j = x + 1
            while j < w:
                t2 = tuple(int(v) for v in top[j])
                b2 = tuple(int(v) for v in bot[j])
                if quant(*t2) != cf or quant(*b2) != cb:
                    break
                j += 1
            if not (t == (0, 0, 0) and btm == (0, 0, 0)):
                g[y, x:j] = 0x2580
                f[y, x:j] = resolve(cf)
                b[y, x:j] = resolve(cb)
            x = j
    return g, f, b


def _cells_halfblock_mono(rgb, cache):
    rows = list(oracle._hb_rows(rgb))
    h, w = len(rows), rgb.shape[1]
    g = np.full((h, w), 32, np.int64)
    f = np.full((h, w), -1, np.int64)
    b = np.full((h, w), -1, np.int64)
    shades = [0x2591, 0x2592, 0x2593, 0x2588]
    for y, (top, bot, _last) in enumerate(rows):
        for x in range(w):
            t = tuple(int(v) for v in top[x])
            btm = tuple(int(v) for v in bot[x])
            lum_top = (t[0] * 76 + t[1] * 150 + t[2] * 29) >> 8
            lum_bot = (btm[0] * 76 + btm[1] * 150 + btm[2] * 29) >> 8
            if lum_top < 16 and lum_bot < 16:
                continue
            g[y, x] = shades[lum_top >> 6]
    return g, f, b


MODES = {
    "mono": (oracle.render_mono, _cells_mono),
    "truecolor_fg": (oracle.render_truecolor_fg, _cells_truecolor_fg),
    "truecolor_fg_utf8": (oracle.render_truecolor_fg_utf8, _cells_truecolor_fg),
    "256color": (oracle.render_256color, _cells_256),
    "16color": (oracle.render_16color, _cells_16),
    "16color_dithered": (oracle.render_16color_dithered, _cells_16_dithered),
    "16color_dithered_bg": (
        lambda rgb, palette: oracle.render_16color_dithered_bg(rgb, True, palette),
        _cells_16_dithered_bg,
    ),
    "halfblock_truecolor": (
        lambda rgb, palette: oracle.render_halfblock_truecolor(rgb),
        _cells_halfblock_truecolor,
    ),
    "halfblock_256": (
        oracle.render_halfblock_256,
        lambda rgb, cache: _cells_halfblock_indexed(
            rgb, cache, oracle.rgb_to_256color, ansiparse.xterm256),
    ),
    "halfblock_16": (
        oracle.render_halfblock_16,
        lambda rgb, cache: _cells_halfblock_indexed(
            rgb, cache, oracle.rgb_to_16color, lambda i: ansiparse.ANSI16[i]),
    ),
    "halfblock_mono": (oracle.render_halfblock_mono, _cells_halfblock_mono),
}


@pytest.mark.parametrize("mode", sorted(MODES))
def test_parser_reconstructs_cells(mode):
    """parse(oracle bytes) == cells derived from pixel math, per mode."""
    render, expect = MODES[mode]
    cache = pal.get_palette_cache(pal.DEFAULT_PALETTE)
    grid = ansiparse.AnsiGrid()
    for i, rgb in enumerate(_rand_frames(seed=_mode_seed(mode), n=4)):
        frame = render(rgb, pal.DEFAULT_PALETTE)
        grid.parse(frame)
        eg, ef, eb = expect(rgb, cache)
        assert (grid.h, grid.w) == eg.shape, (mode, i, grid.h, grid.w, eg.shape)
        g, f, b = grid.cells()
        np.testing.assert_array_equal(g, eg, err_msg=f"{mode}[{i}] glyphs")
        np.testing.assert_array_equal(f, ef, err_msg=f"{mode}[{i}] fg")
        np.testing.assert_array_equal(b, eb, err_msg=f"{mode}[{i}] bg")


def test_parser_handles_padding_and_full_driver():
    """Full ascii_convert_with_capabilities output (aspect fit + left/top
    padding) parses to a grid with the padding as default cells and the
    content block byte-faithful."""
    from asciichat_tpu.render.types import ColorLevel, RenderMode, TerminalCapabilities

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    caps = TerminalCapabilities(ColorLevel.TRUECOLOR, RenderMode.HALF_BLOCK)
    out = oracle.ascii_convert_with_capabilities(rgb, 60, 30, caps)
    rw, rh, pad_w, pad_h = oracle.compute_render_geometry(64, 48, 60, 30, caps)
    grid = ansiparse.AnsiGrid().parse(out)
    assert grid.h == pad_h + rh // 2
    assert grid.w == pad_w + rw
    g, f, b = grid.cells()
    # padding cells are untouched defaults
    assert (g[:pad_h] == 32).all() and (f[:pad_h] == -1).all()
    assert (g[pad_h:, :pad_w] == 32).all()
    # content block equals parsing the unpadded render directly
    resized = oracle.resize_image(rgb, rw, rh)
    inner = ansiparse.AnsiGrid().parse(oracle.render_halfblock_truecolor(resized))
    gi, fi, bi = inner.cells()
    np.testing.assert_array_equal(g[pad_h:, pad_w:], gi)
    np.testing.assert_array_equal(f[pad_h:, pad_w:], fi)
    np.testing.assert_array_equal(b[pad_h:, pad_w:], bi)


def test_parser_rep_and_reset_edge_cases():
    g = ansiparse.AnsiGrid()
    # REP with active SGR repeats glyph+attrs; ESC[m empty = reset
    g.parse("\x1b[38;2;1;2;3mA\x1b[3b\x1b[mB")
    assert g.w == 5 and g.h == 1
    assert g.cell(0, 0) == (ord("A"), 0x010203, -1)
    assert g.cell(3, 0) == (ord("A"), 0x010203, -1)
    assert g.cell(4, 0) == (ord("B"), -1, -1)
    # unknown CSI finals are skipped without emitting cells
    g.parse("\x1b[2J\x1b[HX")
    assert g.w == 1 and g.cell(0, 0)[0] == ord("X")
    # 16-color bright + bg codes
    g.parse("\x1b[97m\x1b[41mZ")
    assert g.cell(0, 0) == (ord("Z"), 0xFFFFFF, 0x800000)
    # 256-color fg/bg
    g.parse("\x1b[38;5;196m\x1b[48;5;21mQ")
    assert g.cell(0, 0) == (ord("Q"), 0xFF0000, 0x0000FF)
    # gray ramp + cube resolution
    assert ansiparse.xterm256(232) == 0x080808
    assert ansiparse.xterm256(255) == 0xEEEEEE
    assert ansiparse.xterm256(16) == 0x000000
    assert ansiparse.xterm256(231) == 0xFFFFFF


def test_assets_serve_over_http():
    """serve_ws routes the static app + JSON endpoints; 404 for unknown."""
    import asyncio

    from asciichat_tpu.apps.webclient import make_http_handler
    from asciichat_tpu.net.websocket import serve_ws

    async def fetch(port, path):
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(f"GET {path} HTTP/1.1\r\nHost: x\r\n\r\n".encode())
        await writer.drain()
        status = await reader.readline()
        headers = {}
        while True:
            line = await reader.readline()
            if line in (b"\r\n", b""):
                break
            k, _, v = line.decode().partition(":")
            headers[k.strip().lower()] = v.strip()
        body = await reader.readexactly(int(headers.get("content-length", 0)))
        writer.close()
        return status.decode(), headers, body

    async def run():
        async def handler(t):
            await t.close()

        srv = await serve_ws(handler, "127.0.0.1", 0,
                             pages=make_http_handler())
        port = srv.sockets[0].getsockname()[1]
        st, hd, body = await fetch(port, "/")
        assert "200" in st and "text/html" in hd["content-type"]
        assert b"app.js" in body
        st, hd, body = await fetch(port, "/ansi.js")
        assert "200" in st and "javascript" in hd["content-type"]
        assert b"AnsiGrid" in body
        st, hd, body = await fetch(port, "/app.js")
        assert b"CanvasRenderer" in body and b"benchLocal" in body
        st, hd, body = await fetch(port, "/browse")
        assert b"servers.json" in body
        st, hd, body = await fetch(port, "/servers.json")
        assert "200" in st
        assert isinstance(json.loads(body), list)
        st, hd, body = await fetch(port, "/no-such-page")
        assert "404" in st
        srv.close()

    asyncio.run(asyncio.wait_for(run(), 30))


CORPUS_PATH = REPO / "tests" / "data" / "ansi_corpus.json"


def _committed_corpus():
    """The SHARED pinned corpus (tools/gen_ansi_corpus.py): ANSI frame text
    -> expected cell grid, consumed by BOTH twins so they cannot drift
    silently (VERDICT r03 #9). Regenerate with the tool after an
    intentional grammar change — never hand-edit."""
    return json.loads(CORPUS_PATH.read_text())["entries"]


def test_committed_corpus_matches_python_twin():
    """ansiparse must reproduce the committed expectations cell-for-cell.
    A behavior change in the Python twin trips this; the same file gates
    ansi.js under node — the twins share one contract."""
    entries = _committed_corpus()
    assert len(entries) >= 26  # 10 grammars x 2 frames + edge cases
    for e in entries:
        grid = ansiparse.AnsiGrid().parse(e["text"])
        assert (grid.w, grid.h) == (e["w"], e["h"]), e["name"]
        it = iter(e["cells"])
        for y in range(grid.h):
            for x in range(grid.w):
                assert tuple(next(it)) == grid.cell(x, y), (e["name"], x, y)


def test_corpus_is_regenerable_and_current():
    """The committed JSON equals a fresh generation — catches a grammar/
    parser change that forgot to regenerate the shared contract (and pins
    the generator itself to determinism)."""
    import importlib

    sys_path_hack = str(REPO / "tools")
    import sys as _sys

    _sys.path.insert(0, sys_path_hack)
    try:
        gen = importlib.import_module("gen_ansi_corpus")
    finally:
        _sys.path.remove(sys_path_hack)
    fresh = []
    import zlib

    for mode, render in sorted(gen.RENDERS.items()):
        for i, rgb in enumerate(gen._frames(zlib.crc32(mode.encode()), n=2)):
            fresh.append(gen.entry(f"{mode}_{i}",
                                   render(rgb, pal.DEFAULT_PALETTE).decode()))
    for name, text in gen.EDGES:
        fresh.append(gen.entry(f"edge_{name}", text))
    assert fresh == _committed_corpus(), (
        "tests/data/ansi_corpus.json is stale — rerun tools/gen_ansi_corpus.py")


@pytest.mark.skipif(shutil.which("node") is None,
                    reason="no node interpreter in this image")
def test_js_parser_matches_committed_corpus(tmp_path):
    """Run the ACTUAL web/ansi.js under node against the SAME committed
    corpus the Python twin is pinned to, comparing every cell to the
    committed expectations (not to live Python — the contract file is the
    single source of truth for both twins)."""
    entries = _committed_corpus()
    runner = tmp_path / "run.mjs"
    runner.write_text(
        "const m = await import('file://"
        + str(REPO / "asciichat_tpu/web/ansi.js")
        + "');\n"
        "const fs = await import('fs');\n"
        "const doc = JSON.parse(fs.readFileSync(process.argv[2], 'utf8'));\n"
        "const G = m.AnsiGrid || m.default.AnsiGrid;\n"
        "const out = [];\n"
        "for (const e of doc.entries) {\n"
        "  const grid = new G(); grid.parse(e.text);\n"
        "  const cells = [];\n"
        "  for (let y = 0; y < grid.h; y++) for (let x = 0; x < grid.w; x++)\n"
        "    cells.push(grid.cell(x, y));\n"
        "  out.push({name: e.name, w: grid.w, h: grid.h, cells});\n"
        "}\n"
        "fs.writeFileSync(process.argv[3], JSON.stringify(out));\n"
    )
    cout = tmp_path / "out.json"
    subprocess.run(["node", str(runner), str(CORPUS_PATH), str(cout)],
                   check=True, timeout=60)
    js = json.loads(cout.read_text())
    for e, res in zip(entries, js):
        assert (res["w"], res["h"]) == (e["w"], e["h"]), e["name"]
        assert [list(c) for c in res["cells"]] == e["cells"], e["name"]


def test_parser_survives_garbage():
    """Arbitrary bytes (truncated escapes, huge params, invalid UTF-8
    replacement chars, stray CSI finals) must never crash the parser, must
    yield sane dims, and reparsing must be idempotent — the frame stream is
    network input."""
    rng = np.random.default_rng(99)
    grid = ansiparse.AnsiGrid()
    for seed in range(60):
        raw = bytes(rng.integers(0, 256, int(rng.integers(1, 3000))))
        text = raw.decode("utf-8", errors="replace")
        grid.parse(text)
        assert 0 <= grid.w <= grid.cap_w and 1 <= grid.h <= grid.cap_h
        again = ansiparse.AnsiGrid().parse(text)
        assert (again.w, again.h) == (grid.w, grid.h)
        np.testing.assert_array_equal(grid.cells()[0], again.cells()[0])
    # pathological escapes
    for text in ["\x1b", "\x1b[", "\x1b[38;2;1;2", "\x1b[999999999999m",
                 "\x1b[;;;;;;;;m", "\x1b[38;5m", "\x1b[48;2;300;300;300mX",
                 "\x1b[3bX", "A\x1b[1000000b", "\x1b[m\x1b[m\n\n\n"]:
        g = ansiparse.AnsiGrid().parse(text)
        assert g.h >= 1
    # REP flood is bounded by capacity, not memory
    g = ansiparse.AnsiGrid().parse("X\x1b[2000000000b")
    assert g.w <= g.cap_w


# --------------------------------------------------------------------------
# REAL JS-engine execution (Qt5 QML V4 via native/qjs.cpp): this image has
# no browser or node, but libQt5Qml.so.5 ships the full ES6/ES7 V4 engine.
# These tests execute the ACTUAL shipped JS — not the Python twins — against
# the same committed contracts.

def _qjs():
    from asciichat_tpu.web import jsrun

    return jsrun if jsrun.available() else None


# V4 (Qt 5.15) predates globalThis and has no DOM TextEncoder; the app
# shims nothing (browsers have both), so the test prelude provides them.
QJS_PRELUDE = """
var globalThis = this;
var module = undefined;
function TextEncoder() {}
TextEncoder.prototype.encode = function (s) {
  var out = [];
  for (var i = 0; i < s.length; i++) {
    var c = s.codePointAt(i);
    if (c > 0xffff) i++;
    if (c < 0x80) out.push(c);
    else if (c < 0x800) out.push(0xc0 | (c >> 6), 0x80 | (c & 63));
    else if (c < 0x10000)
      out.push(0xe0 | (c >> 12), 0x80 | ((c >> 6) & 63), 0x80 | (c & 63));
    else
      out.push(0xf0 | (c >> 18), 0x80 | ((c >> 12) & 63),
               0x80 | ((c >> 6) & 63), 0x80 | (c & 63));
  }
  return new Uint8Array(out);
};
function hex(u8) {
  var s = "";
  for (var i = 0; i < u8.length; i++) s += (u8[i] + 256).toString(16).slice(1);
  return s;
}
function unhex(s) {
  var u = new Uint8Array(s.length / 2);
  for (var i = 0; i < u.length; i++) u[i] = parseInt(s.substr(2 * i, 2), 16);
  return u;
}
"""


def test_qjs_engine_available():
    """The Qt V4 shim must work on this image (guards the other tests from
    silently skipping forever)."""
    from asciichat_tpu.web import jsrun

    if not Path("/usr/lib/x86_64-linux-gnu/libQt5Qml.so.5").exists():
        pytest.skip("no libQt5Qml on this host")
    assert jsrun.eval_js("6*7") == "42"
    assert jsrun.eval_js("[...new Set([1,2,2])].map(x=>x*2).join()") == "2,4"
    with pytest.raises(jsrun.JsError, match="boom"):
        jsrun.eval_js("throw new Error('boom')")


def test_js_parser_matches_committed_corpus_qjs():
    """Run the ACTUAL web/ansi.js under the Qt V4 engine against the SAME
    committed corpus that pins the Python twin — the executed-JS evidence
    the node-gated test was waiting for."""
    jsrun = _qjs()
    if jsrun is None:
        pytest.skip("Qt V4 engine unavailable")
    corpus_text = CORPUS_PATH.read_text()
    program = (
        QJS_PRELUDE
        + jsrun.load_twin("ansi.js")
        + "\nvar G = globalThis.AsciichatAnsi.AnsiGrid;\n"
        + "var doc = JSON.parse(" + json.dumps(corpus_text) + ");\n"
        + """
var bad = [];
for (var e of doc.entries) {
  var grid = new G();
  grid.parse(e.text);
  if (grid.w !== e.w || grid.h !== e.h) {
    bad.push(e.name + " dims " + grid.w + "x" + grid.h);
    continue;
  }
  var k = 0;
  outer: for (var y = 0; y < grid.h; y++) {
    for (var x = 0; x < grid.w; x++, k++) {
      var c = grid.cell(x, y);
      var w = e.cells[k];
      if (c[0] !== w[0] || c[1] !== w[1] || c[2] !== w[2]) {
        bad.push(e.name + " cell(" + x + "," + y + ")=" + c + " want " + w);
        break outer;
      }
    }
  }
}
bad.length ? "MISMATCH " + bad.join(" | ") : "OK " + doc.entries.length;
"""
    )
    result = jsrun.eval_js(program)
    assert result.startswith("OK "), result
    assert int(result.split()[1]) >= 26


def test_js_acip_wire_interop_qjs():
    """Byte-level interop of the ACTUAL web/acip.js with the Python packet
    layer: pack in JS -> verify in Python, pack in Python -> parse in JS.
    This is the browser protocol path executed for real (packet framing +
    CRC32-C + caps/size/audio payload builders)."""
    import struct

    from asciichat_tpu.net import packet as pkt
    from asciichat_tpu.net.protocol import SIZE_STRUCT, WireCapabilities
    from asciichat_tpu.render.types import (
        ColorLevel, RenderMode, TerminalCapabilities,
    )

    jsrun = _qjs()
    if jsrun is None:
        pytest.skip("Qt V4 engine unavailable")

    payload = bytes(range(256)) * 3 + b"tail"
    py_frame = pkt.pack_ascii_frame(b"\x1b[0mHello\nrow2", 5, 2, compress=False)
    py_audio = pkt.pack_audio_batch(
        struct.pack("<4f", 0.0, 0.5, -0.25, 1.0), 4, 1, 48000, 1)
    program = (
        QJS_PRELUDE
        + jsrun.load_twin("acip.js")
        + f"""
var A = globalThis.AsciichatAcip;
var payload = unhex({json.dumps(payload.hex())});
var out = [];
out.push(hex(new Uint8Array(A.packPacket(A.T.ASCII_FRAME, payload))));
out.push(hex(A.capsPayload({{cols: 203, rows: 64, colorLevel: 3,
  renderMode: 2, paletteCustom: "", desiredFps: 60, colorFilter: 4}})));
out.push(hex(A.sizePayload(120, 40)));
out.push(hex(A.audioBatchPayload(new Float32Array([0, 0.5, -0.25, 1]), 48000)));
// parse side: Python-built ascii frame + audio batch
var f = A.parseAsciiFrame(unhex({json.dumps(py_frame.hex())}));
out.push(f.width + "x" + f.height + ":" + hex(f.body));
var ab = A.parseAudioBatch(unhex({json.dumps(py_audio.hex())}));
out.push(ab.rate + ":" + Array.prototype.join.call(ab.samples, ","));
// header roundtrip of a Python packet
var full = unhex({json.dumps(pkt.pack_packet(5001, b"ping!").hex())});
var dv = new DataView(full.buffer);
var h = A.unpackHeader(dv);
out.push(h.type + ":" + h.length + ":" +
         (A.crc32c(full.subarray(A.HEADER_SIZE)) === dv.getUint32(14)));
out.join("|");
"""
    )
    (js_pkt, js_caps, js_size, js_audio, js_frame, js_ab,
     js_hdr) = jsrun.eval_js(program).split("|")
    # JS-packed bytes are verbatim what Python would send / accepts
    assert js_pkt == pkt.pack_packet(int(pkt.PacketType.ASCII_FRAME),
                                     payload).hex()
    raw = bytes.fromhex(js_pkt)
    ptype, length, crc, _cid = pkt.unpack_header(raw[: pkt.HEADER_SIZE])
    assert (ptype, length) == (pkt.PacketType.ASCII_FRAME, len(payload))
    assert raw[pkt.HEADER_SIZE:] == payload
    assert pkt.verify_payload(payload, crc)
    want_caps = WireCapabilities(
        caps=TerminalCapabilities(ColorLevel.TRUECOLOR, RenderMode.HALF_BLOCK),
        capabilities_mask=1, width=203, height=64, term_type="xterm-web",
        colorterm="truecolor", palette_custom="", desired_fps=60,
        color_filter=4,
    ).pack()
    assert js_caps == want_caps.hex()
    assert js_size == SIZE_STRUCT.pack(120, 40).hex()
    assert js_audio == py_audio.hex()
    assert js_frame == "5x2:" + b"\x1b[0mHello\nrow2".hex()
    assert js_ab == "48000:0,0.5,-0.25,1"
    assert js_hdr == "5001:5:true"


RENDERER_DOM_SHIM = """
function Ctx(canvas) {
  this.canvas = canvas;
  this.ops = [];
  this.font = ""; this.fillStyle = ""; this.textBaseline = "";
  this.imageSmoothingEnabled = true;
}
Ctx.prototype.measureText = function (s) { return { width: 8 }; };
Ctx.prototype.createImageData = function (w, h) {
  return { width: w, height: h, data: new Uint8ClampedArray(w * h * 4) };
};
Ctx.prototype.putImageData = function (img, x, y) {
  this.canvas._img = img;
  this.ops.push(["put", img.width, img.height]);
};
Ctx.prototype.drawImage = function (src, x, y, w, h) {
  this.ops.push(["drawImage", w, h]);
};
Ctx.prototype.fillRect = function (x, y, w, h) {
  this.ops.push(["rect", x, y, w, h, this.fillStyle]);
};
Ctx.prototype.fillText = function (s, x, y) {
  this.ops.push(["text", s, x, y, this.fillStyle]);
};
function Canvas() { this.width = 0; this.height = 0; this._ctx = null; }
Canvas.prototype.getContext = function () {
  if (!this._ctx) this._ctx = new Ctx(this);
  return this._ctx;
};
var document = { createElement: function (tag) { return new Canvas(); } };
"""


def test_renderer_js_pixel_path_bytes_qjs():
    """Execute the ACTUAL web/renderer.js under the Qt V4 engine on an
    oracle-rendered half-block frame and verify the ImageData it builds
    BYTE-FOR-BYTE: every cell becomes (fg -> top px, bg -> bottom px),
    spaces/defaults become the background — the canvas-blit architecture's
    pixel math, previously unexecuted anywhere."""
    jsrun = _qjs()
    if jsrun is None:
        pytest.skip("Qt V4 engine unavailable")
    rng = np.random.default_rng(123)
    rgb = rng.integers(0, 256, (12, 17, 3), dtype=np.uint8)
    rgb[2:5, 3:9] = 0  # transparent (all-black) region -> space cells
    frame = oracle.render_halfblock_truecolor(rgb)
    program = (
        QJS_PRELUDE + RENDERER_DOM_SHIM
        + jsrun.load_twin("ansi.js")
        + jsrun.load_twin("renderer.js")
        + f"""
var grid = new globalThis.AsciichatAnsi.AnsiGrid();
grid.parse({json.dumps(frame.decode())});
var canvas = new Canvas();
var r = new globalThis.AsciichatRenderer.CanvasRenderer(canvas, {{fontPx: 14}});
var mode = r.draw(grid);
[mode, grid.w, grid.h, canvas.width, canvas.height,
 hex(new Uint8Array(r._img.data.buffer))].join("|");
"""
    )
    mode, w, h, cw, ch, img_hex = jsrun.eval_js(program).split("|")
    grid = ansiparse.AnsiGrid().parse(frame)
    assert mode == "pixel" and (int(w), int(h)) == (grid.w, grid.h)
    # canvas sized to the grid at the measured cell metrics (8 x ceil(14*1.2))
    assert (int(cw), int(ch)) == (grid.w * 8, grid.h * 17)
    # expected RGBA: glyph cells split fg/bg into two pixel rows; space cells
    # (transparent runs) take the default background
    g, f, b = grid.cells()
    expect = np.zeros((2 * grid.h, grid.w, 4), np.uint8)
    expect[..., 3] = 255
    for y in range(grid.h):
        for x in range(grid.w):
            if g[y, x] == 32:
                top = bot = 0x000000
            else:
                top = f[y, x] if f[y, x] >= 0 else 0x000000
                bot = b[y, x] if b[y, x] >= 0 else 0x000000
            expect[2 * y, x, :3] = [(top >> 16) & 255, (top >> 8) & 255, top & 255]
            expect[2 * y + 1, x, :3] = [(bot >> 16) & 255, (bot >> 8) & 255, bot & 255]
    got = np.frombuffer(bytes.fromhex(img_hex), np.uint8).reshape(expect.shape)
    np.testing.assert_array_equal(got, expect)
    # and the pixels ARE the resized source: top row = even source rows
    np.testing.assert_array_equal(got[0, :, :3][got[0, :, 2] != 0],
                                  rgb[0][rgb[0][:, 2] != 0])


def test_renderer_js_cell_diff_path_qjs():
    """The glyph (cells) path under the real engine: full first paint, then
    a one-cell change redraws exactly that cell (diff path) with the right
    styles; a lone half-block amid glyphs becomes a top-half rect."""
    jsrun = _qjs()
    if jsrun is None:
        pytest.skip("Qt V4 engine unavailable")
    program = (
        QJS_PRELUDE + RENDERER_DOM_SHIM
        + jsrun.load_twin("ansi.js")
        + jsrun.load_twin("renderer.js")
        + """
var G = globalThis.AsciichatAnsi.AnsiGrid;
var canvas = new Canvas();
var r = new globalThis.AsciichatRenderer.CanvasRenderer(canvas, {fontPx: 14});
var g1 = new G();
g1.parse("\\x1b[38;2;255;0;0mAB\\nC\\u2580");
var m1 = r.draw(g1);
var ctx = canvas.getContext();
var texts1 = ctx.ops.filter(o => o[0] === "text").length;
var clears1 = ctx.ops.filter(
  o => o[0] === "rect" && o[3] === canvas.width && o[4] === canvas.height).length;
ctx.ops.length = 0;
var g3 = new G();
g3.parse("\\x1b[38;2;0;255;0mAB\\nC\\u2580"); // SAME dims, fg color changed
r.draw(g3);
var diffOps = JSON.stringify(ctx.ops);
[m1, texts1, clears1, canvas.width + "x" + canvas.height, diffOps].join("|");
"""
    )
    m1, texts1, clears1, dims, diff_ops = jsrun.eval_js(program).split("|")
    assert m1 == "cells"
    assert dims == "16x34"  # 2x2 grid at the shim's 8x17 cell metrics
    assert int(texts1) == 3  # A, B, C drawn as text; the half-block as rects
    assert int(clears1) == 1  # first paint clears the whole canvas
    ops = json.loads(diff_ops)
    # diff pass: every cell's fg changed -> 4 bg rects + 3 glyph texts + the
    # lone half-block's top-half rect, and NO full-canvas clear
    texts = [o for o in ops if o[0] == "text"]
    rects = [o for o in ops if o[0] == "rect"]
    assert len(texts) == 3 and all(o[4] == "rgb(0,255,0)" for o in texts)
    assert len(rects) == 5
    assert not any(o[3] == 16 and o[4] == 34 for o in rects)  # no clear
    half = [o for o in rects if o[4] == "rgb(0,255,0)" or o[4] == 8.5]
    assert any(o[4] == 8.5 or o[5] == "rgb(0,255,0)" for o in rects), half


def test_js_parser_fuzz_lockstep_with_python_twin_qjs():
    """Twin lockstep on ARBITRARY input under the real engine: random
    oracle frames from every grammar plus garbage byte soup must parse to
    identical (w, h, cells) in web/ansi.js (Qt V4) and web/ansiparse.py.
    The committed corpus pins known-good frames; this pins the twins to
    each other everywhere else."""
    jsrun = _qjs()
    if jsrun is None:
        pytest.skip("Qt V4 engine unavailable")
    rng = np.random.default_rng(4242)
    texts = []
    for mode, (render, _expect) in sorted(MODES.items()):
        for rgb in _rand_frames(seed=_mode_seed(mode) ^ 0x5A5A, n=2,
                                hmax=16, wmax=24):
            texts.append(render(rgb, pal.DEFAULT_PALETTE).decode())
    for _ in range(12):  # garbage soup: truncated escapes, raw bytes
        raw = bytes(rng.integers(0, 256, int(rng.integers(1, 1500))))
        texts.append(raw.decode("utf-8", errors="replace"))
    texts += ["\x1b[38;2;1;2", "\x1b[999999999999m", "X\x1b[2000000000b",
              "\x1b[;;;;m\n\n", "\x1b[38;5m\x1b[48;2;300;300;300mQ"]
    program = (
        QJS_PRELUDE
        + jsrun.load_twin("ansi.js")
        + "\nvar G = globalThis.AsciichatAnsi.AnsiGrid;\n"
        + "var texts = JSON.parse(" + json.dumps(json.dumps(texts)) + ");\n"
        + """
var out = [];
for (var text of texts) {
  var g = new G();
  g.parse(text);
  var cells = [];
  for (var y = 0; y < g.h; y++)
    for (var x = 0; x < g.w; x++) cells.push(g.cell(x, y));
  out.push([g.w, g.h, cells]);
}
JSON.stringify(out);
"""
    )
    js = json.loads(jsrun.eval_js(program))
    assert len(js) == len(texts)
    for i, text in enumerate(texts):
        grid = ansiparse.AnsiGrid().parse(text)
        jw, jh, jcells = js[i]
        assert (jw, jh) == (grid.w, grid.h), f"case {i}: dims"
        it = iter(jcells)
        for y in range(grid.h):
            for x in range(grid.w):
                assert tuple(next(it)) == grid.cell(x, y), (i, x, y)


# --------------------------------------------------------------------------
# app.js EXECUTION under the Qt V4 engine (the last shipped JS file that
# previously had zero execution evidence — the reference executes its web
# code: /root/reference/web/ test scripts, src/web/main_wasm.c:1-37).
# tests/data/browser_shim.js provides a deterministic micro-browser: DOM,
# manually-pumped timers, WebSocket/fetch/RTCPeerConnection/getUserMedia/
# AudioContext fakes, and synchronous thenables in place of Promises (the
# V4 engine never drains promise jobs — app.js is written promise-free).

BROWSER_SHIM = (REPO / "tests" / "data" / "browser_shim.js").read_text()


def _app_program(jsrun, driver_js: str, search: str = "") -> str:
    return (
        QJS_PRELUDE
        + BROWSER_SHIM
        + "\nwindow.RTCPeerConnection = RTCPeerConnection;"
        + "\nwindow.AudioContext = AudioContext;\n"
        + jsrun.load_twin("ansi.js")
        + jsrun.load_twin("renderer.js")
        + jsrun.load_twin("acip.js")
        + jsrun.load_twin("app.js")
        + f"\nlocation.search = {json.dumps(search)};\n"
        + driver_js
    )


def _wire_caps(cols, rows, level, mode, palette="", fps=60, color_filter=0):
    from asciichat_tpu.net.protocol import WireCapabilities
    from asciichat_tpu.render.types import (
        ColorLevel, RenderMode, TerminalCapabilities,
    )

    return WireCapabilities(
        caps=TerminalCapabilities(ColorLevel(level), RenderMode(mode)),
        capabilities_mask=1, width=cols, height=rows, term_type="xterm-web",
        color_count=[2, 16, 256, 16_777_216][level],
        colorterm="truecolor" if level == 3 else "",
        palette_custom=palette, desired_fps=fps, color_filter=color_filter,
    ).pack()


def test_app_js_connect_caps_dispatch_qjs():
    """Execute the ACTUAL web/app.js: boot -> WebSocket connect -> caps
    handshake -> keepalive ping -> ASCII frame parse+draw+HUD -> server
    state -> ping/pong echo -> chat -> corrupt-packet drops -> settings
    renegotiation (select + keyboard shortcut)."""
    from asciichat_tpu.net import packet as pkt
    from asciichat_tpu.render.types import (
        ColorLevel, RenderMode, TerminalCapabilities,
    )

    jsrun = _qjs()
    if jsrun is None:
        pytest.skip("Qt V4 engine unavailable")

    # a real oracle half-block frame so the renderer takes the pixel path
    rgb = next(_rand_frames(seed=77, n=1, hmax=9, wmax=9))
    caps = TerminalCapabilities(ColorLevel.TRUECOLOR, RenderMode.HALF_BLOCK)
    # half-block: 2 pixel rows per text cell, so height=4 -> a 10x2 grid
    body = oracle.ascii_convert_with_capabilities(rgb, 10, 4, caps)
    frame_payload = pkt.pack_ascii_frame(body, 10, 2, compress=False)
    hex_frame = pkt.pack_packet(
        int(pkt.PacketType.ASCII_FRAME), frame_payload).hex()
    hex_state = pkt.pack_packet(
        int(pkt.PacketType.SERVER_STATE),
        json.dumps({"clients": 3, "max_clients": 32, "streaming": 2}).encode(),
    ).hex()
    hex_ping = pkt.pack_packet(int(pkt.PacketType.PING), b"12345").hex()
    hex_chat = pkt.pack_packet(
        int(pkt.PacketType.TEXT_MESSAGE), "hi from srv".encode()).hex()
    hex_badmagic = ("00" * 8 + pkt.pack_packet(
        int(pkt.PacketType.PING), b"x").hex()[16:])

    driver = f"""
__fire("DOMContentLoaded");
var R = {{}};
var s0 = __sockets[0];
R.url = s0.url;
R.binaryType = s0.binaryType;
s0._open();
R.status_after_open = document.getElementById("status").textContent;
R.sent_on_open = s0.sent.slice();
__pump(5001);  // keepalive interval fires at 5000
R.n_after_keepalive = s0.sent.length;
s0._recv({json.dumps(hex_frame)});
R.stats = window.__stats || null;
R.render_ops = document.getElementById("screen").getContext().ops.length;
s0._recv({json.dumps(hex_state)});
R.roster = document.getElementById("roster").textContent;
var before = s0.sent.length;
s0._recv({json.dumps(hex_ping)});
R.pong = s0.sent.slice(before);
s0._recv({json.dumps(hex_chat)});
R.chat = document.getElementById("chat").childNodes.map(
  function (c) {{ return c.textContent; }});
before = s0.sent.length;
s0._recvText("a rogue text frame");
s0._recv({json.dumps(hex_frame[:20])});
s0._recv({json.dumps(hex_badmagic)});
R.dropped = (s0.sent.length === before);
document.getElementById("mode").dispatch("change", {{ target: {{ value: "0" }} }});
R.caps_fg = s0.sent[s0.sent.length - 1];
document.dispatch("keydown", {{ key: "c", target: {{ tagName: "DIV" }} }});
R.caps_256 = s0.sent[s0.sent.length - 1];
JSON.stringify(R);
"""
    R = json.loads(jsrun.eval_js(_app_program(jsrun, driver)))
    assert R["url"] == "ws://srv.test:27226/ws"
    assert R["binaryType"] == "arraybuffer"
    assert R["status_after_open"] == "connected"
    # the open handshake sent exactly one packet: CLIENT_CAPABILITIES for
    # the fit-to-window 203x64 truecolor half-block defaults
    assert len(R["sent_on_open"]) == 1
    raw = bytes.fromhex(R["sent_on_open"][0])
    ptype, length, crc, _ = pkt.unpack_header(raw[: pkt.HEADER_SIZE])
    assert ptype == pkt.PacketType.CLIENT_CAPABILITIES
    assert raw[pkt.HEADER_SIZE:] == _wire_caps(203, 64, 3, 2)
    # keepalive PING fired at t=5000
    assert R["n_after_keepalive"] == 2
    # the frame updated stats + drew via the pixel path
    assert R["stats"]["gridW"] == 10 and R["stats"]["gridH"] == 2
    assert R["stats"]["renderPath"] == "pixel"
    assert R["stats"]["transport"] == "ws"
    assert R["render_ops"] >= 1
    assert R["roster"] == "3/32 connected, 2 streaming"
    # PING echoed as PONG with the same payload
    assert len(R["pong"]) == 1
    assert R["pong"][0] == pkt.pack_packet(
        int(pkt.PacketType.PONG), b"12345").hex()
    assert R["chat"] == ["> hi from srv"]
    assert R["dropped"], "corrupt/text frames must be dropped, not answered"
    # select change -> renderMode FG renegotiation
    fg = bytes.fromhex(R["caps_fg"])
    assert fg[pkt.HEADER_SIZE:] == _wire_caps(203, 64, 3, 0)
    # 'c' shortcut -> colorLevel 2 (256-color), renderMode still FG
    k = bytes.fromhex(R["caps_256"])
    assert k[pkt.HEADER_SIZE:] == _wire_caps(203, 64, 2, 0)


def test_app_js_reconnect_backoff_qjs():
    """app.js reconnect state machine: exponential backoff 250 -> 500 ->
    1000 -> ... capped at 8000 ms, reset to 250 on a successful open
    (src/client/keepalive.c role)."""
    jsrun = _qjs()
    if jsrun is None:
        pytest.skip("Qt V4 engine unavailable")

    driver = """
__fire("DOMContentLoaded");
var R = { delays: [], sockets: [] };
__sockets[0]._open();
__sockets[0]._drop();
for (var i = 0; i < 8; i++) {
  var pend = __timerDelays();
  R.delays.push(pend[pend.length - 1]);
  __pump(9000); // run the reconnect timer -> new socket created
  R.sockets.push(__sockets.length);
  __sockets[__sockets.length - 1]._drop(); // connect fails again
}
// now a successful open resets the ladder
var pend2 = __timerDelays();
__pump(9000);
var s = __sockets[__sockets.length - 1];
s._open();
R.status = document.getElementById("status").textContent;
s._drop();
var pend3 = __timerDelays();
R.after_reset = pend3[pend3.length - 1];
JSON.stringify(R);
"""
    R = json.loads(jsrun.eval_js(_app_program(jsrun, driver)))
    assert R["delays"] == [250, 500, 1000, 2000, 4000, 8000, 8000, 8000]
    assert R["sockets"] == [2, 3, 4, 5, 6, 7, 8, 9]
    assert R["status"] == "connected"
    assert R["after_reset"] == 250


def test_app_js_webrtc_signaling_success_qjs():
    """?transport=webrtc drives the RTCPeerConnection flow: offer ->
    POST /webrtc/offer -> answer -> setRemoteDescription; the opened
    DataChannel gets the caps handshake and carries frames like the
    WebSocket (apps/webclient.WebRtcGateway counterpart)."""
    from asciichat_tpu.net import packet as pkt

    jsrun = _qjs()
    if jsrun is None:
        pytest.skip("Qt V4 engine unavailable")

    driver = """
__fetchResponder = function (url, opts) {
  return { ok: true, status: 200, text: "v=0 fake-answer" };
};
__fire("DOMContentLoaded");
var R = {};
var pc = __pcs[0];
R.fetch_url = __fetchCalls[0].url;
R.fetch_body = __fetchCalls[0].body;
R.answer = pc.remoteDescription ? pc.remoteDescription.sdp : null;
R.answer_type = pc.remoteDescription ? pc.remoteDescription.type : null;
pc._dc._open();
R.dc_sent = pc._dc.sent.slice();
R.status = document.getElementById("status").textContent;
R.n_ws = __sockets.length;
JSON.stringify(R);
"""
    R = json.loads(jsrun.eval_js(
        _app_program(jsrun, driver, search="?transport=webrtc")))
    assert R["fetch_url"] == "/webrtc/offer"
    assert R["fetch_body"] == "v=0 fake-offer"
    assert R["answer"] == "v=0 fake-answer"
    assert R["answer_type"] == "answer"
    assert R["status"] == "connected"
    assert R["n_ws"] == 0, "no WebSocket while the DataChannel succeeds"
    raw = bytes.fromhex(R["dc_sent"][0])
    ptype, _, _, _ = pkt.unpack_header(raw[: pkt.HEADER_SIZE])
    assert ptype == pkt.PacketType.CLIENT_CAPABILITIES
    assert raw[pkt.HEADER_SIZE:] == _wire_caps(203, 64, 3, 2)


def test_app_js_webrtc_fallback_to_websocket_qjs():
    """Signaling failure (fetch rejects; separately a non-200 answer) falls
    back PERMANENTLY to the WebSocket, detaching the dead shim's handlers
    so the async dc teardown can't clear the new socket's keepalive or
    schedule a second connect."""
    jsrun = _qjs()
    if jsrun is None:
        pytest.skip("Qt V4 engine unavailable")

    for responder in (
        "null",  # network-level failure: fetch rejects
        "function (u, o) { return { ok: false, status: 404 }; }",
    ):
        driver = f"""
__fetchResponder = {responder};
__fire("DOMContentLoaded");
var R = {{}};
R.n_pc = __pcs.length;
R.n_ws = __sockets.length;        // fallback created a WebSocket
R.status = document.getElementById("status").textContent;
__pump(100);                       // run the pc.close() dc-teardown timer
R.n_ws_after = __sockets.length;   // the dead dc must not reconnect again
__sockets[0]._open();
R.caps = __sockets[0].sent.length;
__pump(10000);
R.n_ws_final = __sockets.length;
JSON.stringify(R);
"""
        R = json.loads(jsrun.eval_js(
            _app_program(jsrun, driver, search="?transport=webrtc")))
        assert R["n_pc"] == 1
        assert R["n_ws"] == 1, "fallback must dial the WebSocket"
        assert R["n_ws_after"] == 1, "dc teardown must not spawn a 2nd connect"
        assert R["caps"] == 1
        assert R["n_ws_final"] == 1, "healthy ws must not be re-dialed"


def test_app_js_bench_local_qjs():
    """?bench=local runs the built-in 203x64-default benchmark offline; with
    explicit dims it must complete through the rAF-sliced loop and publish
    window.__bench with the pixel path."""
    jsrun = _qjs()
    if jsrun is None:
        pytest.skip("Qt V4 engine unavailable")

    driver = """
__fire("DOMContentLoaded");
__pump(60000);  // drain every rAF slice (64 frames / 32 per slice)
var R = { bench: window.__bench || null,
          title: document.title,
          hud: document.getElementById("hud").textContent,
          ops: document.getElementById("screen").getContext().ops.length };
JSON.stringify(R);
"""
    R = json.loads(jsrun.eval_js(
        _app_program(jsrun, driver, search="?bench=local&cols=24&rows=8&frames=64")))
    b = R["bench"]
    assert b is not None, "bench never completed"
    assert (b["cols"], b["rows"], b["frames"]) == (24, 8, 64)
    assert b["path"] == "pixel"
    assert b["fps"] > 0
    assert R["title"].startswith("bench:")
    assert R["hud"].startswith("BENCH 24x8:")
    assert R["ops"] >= 65  # warm + 64 frames drawn


def test_app_js_audio_and_camera_uplink_qjs():
    """Audio duplex + camera uplink: a server AUDIO_BATCH schedules playback
    through the (fake) AudioContext; the mic ScriptProcessor path frames
    captured samples into 480-sample AUDIO_BATCH packets; toggleCamera
    streams RGB24 IMAGE_FRAMEs at ~15 fps (src/client/{audio,capture}.c)."""
    import struct

    from asciichat_tpu.net import packet as pkt

    jsrun = _qjs()
    if jsrun is None:
        pytest.skip("Qt V4 engine unavailable")

    hex_audio = pkt.pack_packet(
        int(pkt.PacketType.AUDIO_BATCH),
        pkt.pack_audio_batch(struct.pack("<480f", *([0.25] * 480)),
                             480, 1, 48000, 1)).hex()

    driver = f"""
__gumResult = {{}};  // grant mic + camera
__fire("DOMContentLoaded");
var R = {{}};
var s0 = __sockets[0];
s0._open();
document.getElementById("aud").dispatch("click");
var actx = AudioContext._last;
R.rate = actx.sampleRate;
R.aud_disabled = document.getElementById("aud").disabled;
s0._recv({json.dumps(hex_audio)});
R.played = actx._played;
// mic: feed 512 captured samples -> one 480-sample AUDIO_BATCH uplink
var before = s0.sent.length;
var proc = actx._procs[0];
var inp = new Float32Array(512);
for (var i = 0; i < 512; i++) inp[i] = i / 1024;
proc.onaudioprocess({{ inputBuffer: {{ getChannelData: function () {{ return inp; }} }} }});
R.mic_sent = s0.sent.slice(before);
// camera: 15 fps IMAGE_FRAME interval
before = s0.sent.length;
document.getElementById("cam").dispatch("click");
R.cam_label = document.getElementById("cam").textContent;
__pump(70);
R.cam_sent = s0.sent.slice(before);
document.getElementById("cam").dispatch("click");  // toggle off
R.cam_label_off = document.getElementById("cam").textContent;
var n = s0.sent.length;
__pump(500);
R.cam_stopped = (s0.sent.length === n);
JSON.stringify(R);
"""
    R = json.loads(jsrun.eval_js(_app_program(jsrun, driver)))
    assert R["rate"] == 48000
    assert R["aud_disabled"] is True
    assert R["played"] == [{"length": 480, "rate": 48000, "at": 0.05}]
    # mic path: exactly one 480-sample batch (32 samples remain pending)
    assert len(R["mic_sent"]) == 1
    raw = bytes.fromhex(R["mic_sent"][0])
    ptype, _, _, _ = pkt.unpack_header(raw[: pkt.HEADER_SIZE])
    assert ptype == pkt.PacketType.AUDIO_BATCH
    samples = np.frombuffer(raw[pkt.HEADER_SIZE + 16:], dtype="<f4")
    assert len(samples) == 480
    assert np.allclose(samples, np.arange(480) / 1024, atol=1e-6)
    # camera path: one IMAGE_FRAME at t=66.7ms with the shim's gradient
    assert R["cam_label"] == "stop camera"
    assert len(R["cam_sent"]) == 1
    raw = bytes.fromhex(R["cam_sent"][0])
    ptype, _, _, _ = pkt.unpack_header(raw[: pkt.HEADER_SIZE])
    assert ptype == pkt.PacketType.IMAGE_FRAME
    # image-frame payload header is 24 bytes: w, h, fmt, rsvd, crc, stamp
    w, h, fmt = struct.unpack(">III", raw[pkt.HEADER_SIZE:pkt.HEADER_SIZE + 12])
    assert (w, h, fmt) == (320, 240, 0)
    rgb = np.frombuffer(raw[pkt.HEADER_SIZE + 24:], np.uint8).reshape(-1, 3)
    assert rgb.shape[0] == 320 * 240
    assert rgb[0].tolist() == [0, 0, 7] and rgb[1].tolist() == [1, 0, 7]
    assert R["cam_label_off"] == "share camera"
    assert R["cam_stopped"]
