"""Options registry/TOML/snapshots, digital rain, frame validator, tracer,
render-file pipeline, audio analysis."""

import numpy as np
import pytest

from asciichat_tpu.utils import options as opt

from conftest import synthetic_frame


def test_options_registry_and_snapshots():
    r = opt.default_registry()
    store = opt.OptionsStore(r)
    snap = store.current
    assert snap["width"] == 0 and snap.render_mode == 0
    snap2 = store.publish(width=120, render_mode=2)
    assert snap2["width"] == 120
    assert snap["width"] == 0  # old snapshot immutable (RCU semantics)
    with pytest.raises(AttributeError):
        snap2.width = 5
    with pytest.raises(KeyError):
        store.publish(bogus=1)
    with pytest.raises(ValueError):
        store.publish(compress=99)  # validator
    with pytest.raises(ValueError):
        store.publish(color_mode="plaid")  # choices


def test_options_mode_masks():
    r = opt.default_registry()
    server_opts = {d.name for d in r.descriptors(mode=opt.Mode.SERVER)}
    assert "host" in server_opts and "test-pattern" not in server_opts
    mirror_opts = {d.name for d in r.descriptors(mode=opt.Mode.MIRROR)}
    assert "matrix" in mirror_opts and "host" not in mirror_opts


def test_options_toml_and_presets(tmp_path):
    cfg = tmp_path / "config.toml"
    cfg.write_text(
        """
[display]
width = 100
palette = "blocks"

[network]
compress = 5

[preset.lowbw]
[preset.lowbw.display]
color-mode = "16"
[preset.lowbw.network]
compress = 9
"""
    )
    store = opt.OptionsStore(opt.default_registry())
    snap = store.load_toml(str(cfg))
    assert snap["width"] == 100 and snap["palette"] == "blocks" and snap["compress"] == 5
    snap = store.load_toml(str(cfg), preset="lowbw")
    # TOML strings take the SAME cli_type codec as the command line, so the
    # snapshot carries the converted value (CLI and config agree; a raw
    # "640x480" string for stdin-size would crash StdinSource downstream)
    from asciichat_tpu.render.types import ColorLevel

    assert snap["compress"] == 9 and snap["color-mode"] == ColorLevel.COLOR_16
    with pytest.raises(KeyError):
        store.load_toml(str(cfg), preset="nope")


def test_options_generators():
    r = opt.default_registry()
    help_text = opt.generate_help(r, opt.Mode.MIRROR)
    assert "--palette" in help_text and "display options:" in help_text
    for shell in ("bash", "zsh", "fish"):
        out = opt.generate_completions(r, shell)
        assert "--palette" in out or "palette" in out


def test_digital_rain_field():
    from asciichat_tpu.ops.rain import DigitalRain

    rain = DigitalRain(40, 20)
    b0 = np.asarray(rain.brightness_field(0.0))
    b1 = np.asarray(rain.brightness_field(1.0))
    assert b0.shape == (20, 40)
    assert np.all(b0 >= 0.0) and np.all(b0 <= 1.0)
    assert not np.allclose(b0, b1)  # animates
    # deterministic per construction parameters
    rain2 = DigitalRain(40, 20)
    np.testing.assert_allclose(np.asarray(rain2.brightness_field(0.0)), b0)
    # overlay produces a mostly-green frame with default color
    import jax.numpy as jnp

    frame = synthetic_frame(20, 40, seed=1)
    out = np.asarray(rain.apply(jnp.asarray(frame), 2.0))
    assert out.shape == frame.shape
    assert out[..., 1].astype(int).sum() > out[..., 0].astype(int).sum()


def test_frame_validator():
    from asciichat_tpu.render import oracle
    from asciichat_tpu.render.validator import validate_frame, visual_width

    frame = oracle.render_truecolor_fg(synthetic_frame(8, 30, seed=2))
    rep = validate_frame(frame, expect_width=30, expect_height=8)
    assert rep.valid, rep.errors
    assert rep.max_visual_width == 30 and rep.lines == 8
    # REP expansion counts repeated cells
    mono = oracle.render_mono(np.full((1, 20, 3), 200, np.uint8))
    assert visual_width(mono) == 20
    bad = validate_frame(b"ok\x01bad")
    assert not bad.valid and "control byte" in bad.errors[0]
    trunc = validate_frame(b"hello\x1b[38;2;1")
    assert not trunc.valid


def test_tracer_breakdown():
    from asciichat_tpu.utils.trace import Tracer

    tr = Tracer("render", log_every_s=0.0)
    with tr.section("resize"):
        pass
    with tr.section("print"):
        pass
    line = tr.breakdown(force=True)
    assert line and "resize=" in line and "print=" in line and "total=" in line


def test_render_file_y4m(tmp_path):
    from asciichat_tpu.models.renderfile import render_to_file
    from asciichat_tpu.render.types import ColorLevel, RenderMode, TerminalCapabilities
    from asciichat_tpu.runtime.framesource import TestPatternSource

    out = tmp_path / "clip.y4m"
    caps = TerminalCapabilities(ColorLevel.TRUECOLOR, RenderMode.HALF_BLOCK)
    n = render_to_file(TestPatternSource(160, 120), str(out), caps,
                       width=40, height=12, palette="   .x", max_frames=5, scale=4)
    assert n == 5
    data = out.read_bytes()
    assert data.startswith(b"YUV4MPEG2 ")
    header = data.split(b"\n", 1)[0].decode()
    assert "C444" in header
    assert data.count(b"FRAME\n") == 5


def test_audio_analysis():
    import jax.numpy as jnp

    from asciichat_tpu.ops.audio import analyze_levels

    t = np.linspace(0, 1, 48000, dtype=np.float32)
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    levels = analyze_levels(jnp.asarray(sine[None]))
    np.testing.assert_allclose(float(levels["rms"][0]), 0.5 / np.sqrt(2), rtol=1e-3)
    np.testing.assert_allclose(float(levels["peak"][0]), 0.5, rtol=1e-3)
    assert abs(float(levels["peak_db"][0]) - (-6.02)) < 0.1


def test_cli_config_layering(tmp_path):
    """--config TOML + --preset apply through the real CLI."""
    import os
    import subprocess
    import sys

    cfg = tmp_path / "c.toml"
    cfg.write_text(
        "[display]\nwidth = 52\nstretch = true\ncolor-mode = \"none\"\n"
        "[preset.tiny]\n[preset.tiny.display]\nwidth = 30\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "ASCIICHAT_JAX_PLATFORM": "cpu", "PYTHONPATH": repo}

    def run(*extra):
        out = subprocess.run(
            [sys.executable, "-m", "asciichat_tpu.apps.main", "mirror",
             "--test-pattern", "--snapshot", "--height", "6",
             "--config", str(cfg), *extra],
            env=env, cwd=repo, capture_output=True, timeout=180,
        )
        assert out.returncode == 0, out.stderr.decode()[-800:]
        return out.stdout.decode().rstrip("\n").split("\n")

    assert all(len(ln) == 52 for ln in run())
    assert all(len(ln) == 30 for ln in run("--preset", "tiny"))
    # CLI overrides config
    assert all(len(ln) == 20 for ln in run("--width", "20"))


def test_lifecycle_once_and_shutdown():
    from asciichat_tpu.utils import lifecycle as lc

    calls = []
    assert lc.init_once("thing", lambda: calls.append("init"))
    assert not lc.init_once("thing", lambda: calls.append("again"))
    assert calls == ["init"] and lc.is_initialized("thing")
    order = []
    lc.on_shutdown("a", lambda: order.append("a"))
    lc.on_shutdown("b", lambda: order.append("b"))
    lc.shutdown_all()
    assert order == ["b", "a"]  # reverse registration order
    assert not lc.is_initialized("thing")


def test_framefd_roundtrip():
    import io

    from asciichat_tpu.utils.framefd import read_frame, write_frame

    buf = io.BytesIO()
    frame = b"\x1b[38;2;1;2;3mAB\nCD\x1b[0m"
    write_frame(buf.write, frame)
    write_frame(buf.write, b"second")
    buf.seek(0)
    assert read_frame(buf.read) == frame
    assert read_frame(buf.read) == b"second"
    assert read_frame(buf.read) is None


def test_strings_cli():
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "ASCIICHAT_JAX_PLATFORM": "cpu", "PYTHONPATH": repo}
    out = subprocess.run(
        [sys.executable, "-m", "asciichat_tpu.apps.main", "strings", "--count", "2"],
        env=env, cwd=repo, capture_output=True, timeout=120, text=True)
    from asciichat_tpu.net.discovery import validate_session_string

    lines = out.stdout.strip().split("\n")
    assert len(lines) == 2 and all(validate_session_string(ln) for ln in lines)


def test_framefd_truncation_and_nested_lifecycle():
    import io

    from asciichat_tpu.utils import lifecycle as lc
    from asciichat_tpu.utils.framefd import read_frame, write_frame

    buf = io.BytesIO()
    write_frame(buf.write, b"hello\nworld")
    data = buf.getvalue()
    with pytest.raises(ValueError):
        read_frame(io.BytesIO(data[:14]).read)  # truncated body
    with pytest.raises(ValueError):
        read_frame(io.BytesIO(data[:7]).read)  # truncated header
    assert read_frame(io.BytesIO(b"").read) is None  # clean EOF

    order = []
    lc.init_once("nested-outer", lambda: lc.init_once("nested-inner",
                                                      lambda: order.append("in")))
    assert order == ["in"]  # reentrant lock: no self-deadlock


def test_cli_surface_generated_from_registry():
    """Single-source guarantee: for every mode, the argparse option surface
    and the registry's descriptor set are IDENTICAL (both directions), so
    flags, TOML keys, completions, and help cannot drift
    (lib/options/builder/ + registry single source of truth)."""
    from asciichat_tpu.apps.main import build_parser
    from asciichat_tpu.utils.options import Mode, default_registry

    reg = default_registry()
    ap = build_parser()
    sub = next(a for a in ap._actions
               if isinstance(a, __import__("argparse")._SubParsersAction))
    mode_map = {"mirror": Mode.MIRROR, "server": Mode.SERVER,
                "client": Mode.CLIENT, "discovery-service": Mode.ACDS,
                "discovery": Mode.DISCOVERY}
    for cmd, mode in mode_map.items():
        parser = sub.choices[cmd]
        cli = set()
        for action in parser._actions:
            if action.dest in ("help", "fn", "mode"):
                continue
            if action.option_strings:
                cli.add(action.option_strings[-1].lstrip("-"))
            else:
                cli.add(action.dest.replace("_", "-"))
        registry = {d.name for d in reg.descriptors(mode=mode)}
        assert cli == registry, (
            f"{cmd}: CLI-only={sorted(cli - registry)}, "
            f"registry-only={sorted(registry - cli)}"
        )


def test_cli_registry_defaults_agree():
    """Parsed defaults match registry defaults (modulo documented per-mode
    overrides like the ACDS port)."""
    from asciichat_tpu.apps.main import build_parser
    from asciichat_tpu.utils.options import default_registry

    reg = default_registry()
    args = build_parser().parse_args(["server"])
    for name in ("port", "compress", "log-level", "width", "palette"):
        assert getattr(args, name.replace("-", "_")) == reg[name].default
    acds_args = build_parser().parse_args(["discovery-service"])
    assert acds_args.port == 27225  # documented per-mode override


def test_shared_session_framework():
    """models/session.py (src/common/session/ analog): the ONE
    implementation of capture transforms / display / reconnect / pacing
    shared by mirror, client, and discovery."""
    import numpy as np

    from asciichat_tpu.models.session import (
        DisplaySink, FrameTransform, Pacer, ReconnectPolicy,
    )

    # transforms: flips compose, upload fit caps dimensions
    t = FrameTransform(flip_x=True, flip_y=True, max_upload=(100, 80))
    frame = np.arange(200 * 160 * 3, dtype=np.uint8).reshape(160, 200, 3)
    out = t(frame)
    assert out.shape[0] <= 80 and out.shape[1] <= 100
    t2 = FrameTransform(flip_x=True)
    small = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert np.array_equal(t2(small), small[:, ::-1])

    # reconnect: backoff then clamp, reset restarts
    rp = ReconnectPolicy()
    delays = [rp.next_delay() for _ in range(6)]
    assert delays == [0.5, 1.0, 2.0, 5.0, 5.0, 5.0]
    rp.reset()
    assert rp.next_delay() == 0.5

    # pacer: drops frames above the cap
    p = Pacer(fps=1000.0)
    assert not p.should_drop(10.0)
    assert p.should_drop(10.0001)
    assert not p.should_drop(10.01)

    # display: overlays + chat to an in-memory stream
    import io

    buf = io.BytesIO()
    d = DisplaySink(stream=buf, show_fps=True)
    d.set_meta("truecolor_fg", (40, 12))
    d.write_frame(b"FRAME")
    d.chat_line(b"hello")
    data = buf.getvalue()
    assert b"FRAME" in data and b"> hello" in data
    assert d.frames_written == 1

    # both mirror and client are built on these exact classes
    from asciichat_tpu.apps.client import AsciiChatClient
    from asciichat_tpu.models.mirror import MirrorSession

    assert MirrorSession.__init__.__module__ == "asciichat_tpu.models.mirror"
    c = AsciiChatClient("127.0.0.1", 1)
    assert isinstance(c.transform, FrameTransform)
    assert isinstance(c.display, DisplaySink)
    assert isinstance(c.reconnect_policy, ReconnectPolicy)


def test_status_screen_and_update_banner():
    """UI chrome: status screen header + live ring-log feed (lib/ui/status.c),
    multi-pane ASCII grid, update banner version rules
    (lib/ui/update_banner.c) with the network check gated off."""
    from asciichat_tpu.utils import logsys, ui

    logsys.configure(level="INFO")
    # the framework's logger namespace is "asciichat.*" (get_logger)
    logsys.get_logger("statustest").info("feed line one")
    logsys.get_logger("statustest").warning("feed line two")
    screen = ui.StatusScreen("server", lambda: {"clients": "3/32"},
                             width=60, height=12)
    out = screen.render().decode()
    lines = out.split("\n")
    assert len(lines) == 12
    assert "ascii-chat server" in lines[1]
    assert "clients: 3/32" in out
    assert "feed line two" in out  # live log feed
    grepped = ui.StatusScreen("server", lambda: {}, width=60, height=12,
                              grep="line two").render().decode()
    assert "feed line two" in grepped and "feed line one" not in grepped

    panes = ui.multi_pane([b"\n".join([b"A" * 12] * 4),
                           b"\n".join([b"B" * 12] * 4)], 25, 4)
    assert b"A" * 12 + b"|" + b"B" * 12 in panes

    assert ui.parse_version("v1.2.3") == (1, 2, 3)
    assert ui.update_banner("0.2.0", "0.2.0") is None
    assert b"update available" in ui.update_banner("0.2.0", "1.0.0")
    assert ui.check_for_update(fetch=lambda: "v0.0.1") is None
    assert ui.check_for_update() is None  # gated off by default (no egress)

    def boom():
        raise OSError("no network")

    assert ui.check_for_update(fetch=boom) is None  # fails silently


def _fake_release_server(tag: str):
    """GitHub-API-shaped fake release server (same pattern as the fake
    UPnP/NAT-PMP routers): /repos/zfogg/ascii-chat/releases/latest JSON."""
    import http.server
    import json as _json
    import threading

    hits = []

    class Api(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            hits.append(self.path)
            if self.path != "/repos/zfogg/ascii-chat/releases/latest":
                self.send_response(404)
                self.end_headers()
                return
            body = _json.dumps({
                "tag_name": tag,
                "target_commitish": "abc123def",
                "html_url": f"https://github.com/zfogg/ascii-chat/releases/{tag}",
            }).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    httpd = http.server.HTTPServer(("127.0.0.1", 0), Api)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, f"http://127.0.0.1:{httpd.server_address[1]}", hits


def test_update_checker_against_fake_release_server(tmp_path):
    """Full update-checker subsystem (lib/network/update_checker.c analog)
    against a protocol-faithful fake GitHub API: fetch + semver compare +
    7-day cache file (3-line format), cache hit avoids the network, stale
    cache refetches, failures silent."""
    import time as _time

    from asciichat_tpu.net.update_checker import (UpdateChecker,
                                                  UpdateCheckResult,
                                                  version_compare)

    httpd, base, hits = _fake_release_server("v9.9.9")
    cache = tmp_path / "last_update_check"
    try:
        c = UpdateChecker(current_version="0.2.0", api_base=base,
                          cache_path=cache)
        assert c.check() == "v9.9.9"
        assert len(hits) == 1
        # cache file: timestamp / version / sha (update_checker.c format)
        lines = cache.read_text().splitlines()
        assert lines[1] == "v9.9.9" and lines[2] == "abc123def"
        # fresh cache: second check answers without touching the network
        assert c.check() == "v9.9.9"
        assert len(hits) == 1
        # stale cache (8 days old): refetches
        c.save_cache(UpdateCheckResult(int(_time.time()) - 8 * 86400,
                                       "v9.9.9", "abc123def"))
        assert c.check() == "v9.9.9"
        assert len(hits) == 2
        # running the latest version: no banner
        newer = UpdateChecker(current_version="9.9.9", api_base=base,
                              cache_path=tmp_path / "c2")
        assert newer.check() is None
        # dead server: silent None
        dead = UpdateChecker(current_version="0.2.0",
                             api_base="http://127.0.0.1:1",
                             cache_path=tmp_path / "c3", timeout=0.5)
        assert dead.check() is None
    finally:
        httpd.shutdown()

    assert version_compare("v1.2.3", "1.2.3") == 0
    assert version_compare("v2.0.0", "v1.9.9") == 1
    assert version_compare("0.9.1", "0.10.0") == -1


def test_update_banner_shown_by_cli(tmp_path, capsys, monkeypatch):
    """End-to-end: --update-check on a real CLI run surfaces the banner fed
    by the fake release server (VERDICT r2 item 8 done-criterion)."""
    from asciichat_tpu.apps.main import main

    httpd, base, _hits = _fake_release_server("v99.0.0")
    monkeypatch.setenv("ASCIICHAT_UPDATE_URL", base)
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path))
    try:
        rc = main(["mirror", "--test-pattern", "--snapshot", "--update-check",
                   "--width", "24", "--height", "8", "--log-level", "WARNING"])
    finally:
        httpd.shutdown()
    assert rc == 0
    err = capsys.readouterr().err
    assert "update available: v99.0.0" in err


def test_prefetch_and_pts_pacing():
    """Decoder fidelity (ffmpeg_decoder.c:276 prefetch, :316 pacing): the
    prefetch thread decodes ahead into a bounded queue; PTS pacing holds
    playback at the stream's native rate and re-anchors instead of bursting
    when the consumer falls behind."""
    import time

    import numpy as np

    from asciichat_tpu.runtime.framesource import PacedSource, PrefetchSource

    class CountingSource:
        width, height, fps = 4, 2, 50.0

        def __init__(self, n):
            self.n = n
            self.reads = 0
            self.closed = False

        def read(self):
            if self.reads >= self.n:
                return None
            self.reads += 1
            return np.full((2, 4, 3), self.reads, np.uint8)

        def close(self):
            self.closed = True

    # prefetch decodes ahead without being read
    inner = CountingSource(100)
    pf = PrefetchSource(inner, depth=4)
    time.sleep(0.2)
    assert 4 <= inner.reads <= 6  # queue-bounded decode-ahead, not a flood
    first = pf.read()
    assert first is not None and first[0, 0, 0] == 1  # order preserved
    pf.close()
    assert inner.closed

    # end-of-stream propagates through the queue
    pf2 = PrefetchSource(CountingSource(2), depth=4)
    assert pf2.read() is not None and pf2.read() is not None
    assert pf2.read() is None
    pf2.close()

    # pacing: 10 frames at 50 fps must take ~9/50 s, not decode speed
    paced = PacedSource(CountingSource(10), fps=50.0)
    t0 = time.monotonic()
    frames = [paced.read() for _ in range(10)]
    dt = time.monotonic() - t0
    assert all(f is not None for f in frames)
    assert dt >= 9 / 50.0 * 0.9, f"played at decode speed ({dt:.3f}s)"

    # slow consumer: the clock re-anchors, no burst of late frames
    paced2 = PacedSource(CountingSource(10), fps=50.0)
    paced2.read()
    time.sleep(0.5)  # fall far behind
    t0 = time.monotonic()
    paced2.read()
    paced2.read()
    assert time.monotonic() - t0 >= 0.015  # second frame still paced


def test_syncdebug_registry_and_order_cycles():
    """Named-lock registry (lib/debug/{named,mutex,sync}.c analog): holder/
    hold-time/contention tracking under a real threading stress, and
    lock-order cycle detection flagging an AB/BA deadlock precursor."""
    import threading
    import time as time_mod

    from asciichat_tpu.utils import syncdebug as sd

    sd.reset()
    try:
        a = sd.NamedLock("test.a")
        b = sd.NamedLock("test.b")
        a2 = sd.NamedLock("test.a")  # duplicate name -> suffixed
        assert a2.name == "test.a#2"
        a2.unregister()

        # threading stress: N threads hammer one lock; counters line up
        counter = [0]

        def worker():
            for _ in range(200):
                with a:
                    counter[0] += 1

        threads = [threading.Thread(target=worker) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert counter[0] == 800
        assert a.acquisitions == 800
        assert a.holder is None  # all released
        state = sd.dump_state()
        assert state["locks"]["test.a"]["acquisitions"] == 800
        assert state["order_cycles"] == []

        # holder + hold time visible while held
        with a:
            snap = sd.dump_state()["locks"]["test.a"]
            assert snap["holder"] is not None
            assert snap["held_for_ms"] is not None

        # AB in one thread, BA in another -> order cycle detected
        with a:
            with b:
                pass

        def ba():
            with b:
                with a:
                    pass

        t = threading.Thread(target=ba)
        t.start()
        t.join()
        cycles = sd.find_order_cycles()
        assert cycles, "AB/BA order not flagged"
        import pytest

        with pytest.raises(AssertionError):
            sd.assert_no_order_cycles()

        # contention is counted when a waiter blocks
        held = threading.Event()
        release = threading.Event()

        def holder_thread():
            with b:
                held.set()
                release.wait(5)

        t = threading.Thread(target=holder_thread)
        t.start()
        held.wait(5)
        t2 = threading.Thread(target=lambda: b.acquire(timeout=5) and b.release())
        t2.start()
        time_mod.sleep(0.05)
        release.set()
        t.join()
        t2.join()
        assert b.contentions >= 1
    finally:
        sd.reset()


def test_renderfile_glyph_raster(tmp_path):
    """render-file draws REAL glyph shapes (atlas gather on device — the
    FreeType-role raster, renderer.c:28 analog): dark cells are empty, bright
    cells carry the dense glyph's ink; the Y4M stream is well-formed."""
    import numpy as np

    from asciichat_tpu.models.renderfile import (
        glyph_atlas, records_to_pixels, render_to_file,
    )
    from asciichat_tpu.render import palette as pal
    from asciichat_tpu.render.types import (
        ColorLevel, RenderMode, TerminalCapabilities,
    )
    from asciichat_tpu.runtime.framesource import TestPatternSource

    import jax.numpy as jnp

    atlas, gh, gw = glyph_atlas()
    assert atlas.shape[0] == 96
    assert atlas[0].sum() == 0  # space has no ink
    assert atlas[ord("M") - 32].sum() > 0

    recs = {"rgb": jnp.full((1, 2, 3, 3), 200, jnp.uint8),
            "luma": jnp.array([[[0, 128, 255]] * 2], jnp.uint8)}
    px = np.asarray(records_to_pixels(recs, "truecolor_fg", pal.DEFAULT_PALETTE))
    assert px.shape == (1, 2 * gh, 3 * gw, 3)
    assert px[0, :gh, :gw].sum() == 0          # luma 0 -> space -> black
    assert px[0, :gh, 2 * gw: 3 * gw].sum() > 0  # luma 255 -> dense glyph

    # end-to-end: a few frames to Y4M through the glyph path
    out = str(tmp_path / "clip.y4m")
    caps = TerminalCapabilities(ColorLevel.TRUECOLOR, RenderMode.FOREGROUND)
    n = render_to_file(TestPatternSource(64, 48), out, caps, 20, 8,
                       pal.DEFAULT_PALETTE, max_frames=3)
    assert n == 3
    data = open(out, "rb").read()
    assert data.startswith(b"YUV4MPEG2 W" + str(20 * gw).encode())
    assert data.count(b"FRAME\n") == 3


def test_webcam_format_conversions():
    """NV12 and MJPEG conversion paths (webcam_v4l2.c format matrix) with
    synthetic buffers — no camera hardware needed."""
    import io

    import numpy as np

    from asciichat_tpu.runtime.webcam import mjpeg_to_rgb, nv12_to_rgb, yuyv_to_rgb

    # NV12: uniform grey (Y=128, U=V=128) -> mid grey RGB
    w, h = 8, 4
    buf = bytes([128] * (w * h)) + bytes([128] * (w * h // 2))
    rgb = nv12_to_rgb(buf, w, h)
    assert rgb.shape == (h, w, 3)
    assert np.all(np.abs(rgb.astype(int) - 130) < 4)  # 298*(128-16)>>8 ≈ 130

    # NV12 red: Y=81 U=90 V=240 (BT.601 red)
    buf = bytes([81] * (w * h)) + bytes([90, 240] * (w * h // 4))
    rgb = nv12_to_rgb(buf, w, h)
    assert rgb[..., 0].mean() > 220 and rgb[..., 1].mean() < 40

    # MJPEG: roundtrip through PIL's encoder
    from PIL import Image

    src = np.zeros((16, 16, 3), np.uint8)
    src[:, :8] = (255, 0, 0)
    bio = io.BytesIO()
    Image.fromarray(src).save(bio, "JPEG", quality=95)
    out = mjpeg_to_rgb(bio.getvalue())
    assert out.shape == (16, 16, 3)
    assert out[0, 0, 0] > 200 and out[0, 15, 0] < 80

    # YUYV still exact on grey
    yuyv = bytes([128, 128] * (w * h))
    grey = yuyv_to_rgb(yuyv, w, h)
    assert grey.shape == (h, w, 3)


def test_native_video_file_source():
    """Full native media loop with NO ffmpeg CLI: our libavcodec encoder
    writes a raw .hevc stream, libavformat demuxes + decodes it back
    (lib/media/ffmpeg_decoder.c linkage model), loop mode reopens raw
    streams that can't seek."""
    import numpy as np
    import pytest

    from asciichat_tpu.runtime import codecs

    try:
        enc = codecs.H265Encoder(64, 48, keyint=5)
    except codecs.CodecUnavailable:
        pytest.skip("no native codec")
    import tempfile

    path = tempfile.mktemp(suffix=".hevc")
    with open(path, "wb") as f:
        for i in range(12):
            fr = np.full((48, 64, 3), i * 20, np.uint8)
            fr[:, :32] = (255, 0, 0)
            for au in enc.encode(fr):
                f.write(au)
    enc.close()

    from asciichat_tpu.runtime.framesource import NativeVideoFileSource, open_source

    src = NativeVideoFileSource(path)
    assert (src.width, src.height) == (64, 48)
    frames = []
    while True:
        fr = src.read()
        if fr is None:
            break
        frames.append(fr)
    src.close()
    assert len(frames) == 12
    assert frames[0][:, :32, 0].mean() > 200  # red half preserved

    looped = NativeVideoFileSource(path, loop=True)
    for _ in range(20):
        assert looped.read() is not None  # wraps past EOF
    looped.close()

    # open_source prefers the native path for video files (unpaced here)
    s = open_source(file=path, pace=False)
    assert isinstance(s, NativeVideoFileSource)
    s.close()


def test_native_container_recorder(tmp_path):
    """render-file to a REAL mp4 with no ffmpeg CLI: the libavformat
    recorder (ffmpeg_encoder.c analog) muxes our H.265; the native media
    source reads it back frame-exact in count."""
    import os

    import pytest

    from asciichat_tpu.models.renderfile import render_to_file
    from asciichat_tpu.render import palette as pal
    from asciichat_tpu.render.types import (
        ColorLevel, RenderMode, TerminalCapabilities,
    )
    from asciichat_tpu.runtime import codecs
    from asciichat_tpu.runtime.framesource import (
        NativeVideoFileSource, TestPatternSource,
    )

    try:
        codecs._avshim()
    except codecs.CodecUnavailable:
        pytest.skip("no libavcodec shim")
    out = str(tmp_path / "clip.mp4")
    caps = TerminalCapabilities(ColorLevel.TRUECOLOR, RenderMode.FOREGROUND)
    n = render_to_file(TestPatternSource(64, 48), out, caps, 20, 8,
                       pal.DEFAULT_PALETTE, max_frames=5)
    assert n == 5
    assert os.path.getsize(out) > 1000
    src = NativeVideoFileSource(out)
    k = 0
    while src.read() is not None:
        k += 1
    src.close()
    assert k == 5


def test_render_file_with_audio_mux(tmp_path):
    """--render-file with an audio source muxes an AAC track next to the
    H.265 video (ffmpeg_encoder.c audio mux role) — verified by reading the
    container back and checking both streams exist."""
    import os

    import pytest

    from asciichat_tpu.models.renderfile import render_to_file
    from asciichat_tpu.render import palette as pal
    from asciichat_tpu.render.types import (
        ColorLevel, RenderMode, TerminalCapabilities,
    )
    from asciichat_tpu.runtime import codecs
    from asciichat_tpu.runtime.audiodev import ToneSource
    from asciichat_tpu.runtime.framesource import TestPatternSource

    try:
        codecs._avshim()
    except codecs.CodecUnavailable:
        pytest.skip("no libavcodec shim")
    out = str(tmp_path / "av.mp4")
    caps = TerminalCapabilities(ColorLevel.TRUECOLOR, RenderMode.FOREGROUND)
    n = render_to_file(TestPatternSource(64, 48), out, caps, 20, 8,
                       pal.DEFAULT_PALETTE, max_frames=10, fps=30,
                       audio_source=ToneSource(440.0, 0.3))
    assert n == 10
    silent = str(tmp_path / "v.mp4")
    render_to_file(TestPatternSource(64, 48), silent, caps, 20, 8,
                   pal.DEFAULT_PALETTE, max_frames=10, fps=30)
    # the AV file carries the extra AAC track
    assert os.path.getsize(out) > os.path.getsize(silent) + 1000
    data = open(out, "rb").read()
    assert b"mp4a" in data  # AAC sample entry present in the moov box


def test_mmap_ring_log_and_doc_generators(tmp_path):
    """mmap-backed crash-persistent log (lib/log/mmap.c analog) + pwsh
    completions + troff manpage generator (lib/options generators)."""
    from asciichat_tpu.utils.logsys import MmapRingLog
    from asciichat_tpu.utils.options import (
        default_registry, generate_completions, generate_manpage,
    )

    path = str(tmp_path / "crash.log")
    ring = MmapRingLog(path, capacity=256)
    for i in range(30):
        ring.append(f"record {i}")
    tail = ring.tail()
    assert tail[-1] == "record 29"
    assert len(tail) < 30  # older records wrapped away in 256 bytes
    ring.close()
    # post-mortem: a NEW handle on the same file still reads the records
    # (the crash-survival property)
    again = MmapRingLog(path, capacity=256)
    assert again.tail()[-1] == "record 29"
    again.close()

    reg = default_registry()
    ps = generate_completions(reg, "pwsh")
    assert "Register-ArgumentCompleter" in ps and "'--port'," in ps
    man = generate_manpage(reg)
    assert man.startswith(".TH ASCIICHAT-TPU 1")
    assert "\\fB--port\\fR" in man and ".SS network" in man


def test_session_keybindings():
    """Live keybindings mutate the shared transform/display (session
    keyboard_handler.c analog) for both mirror and client."""
    from asciichat_tpu.apps.client import AsciiChatClient
    from asciichat_tpu.models.mirror import MirrorSession
    from asciichat_tpu.render.types import (
        ColorLevel, RenderMode, TerminalCapabilities,
    )
    from asciichat_tpu.runtime.framesource import TestPatternSource

    m = MirrorSession(TestPatternSource(32, 24),
                      TerminalCapabilities(ColorLevel.NONE, RenderMode.FOREGROUND),
                      20, 8, "   .:-=+*#%@")
    assert not m.flip_x and not m.matrix
    m._on_key("f")
    m._on_key("m")
    m._on_key("c")
    assert m.flip_x and m.matrix and m.color_filter == "green"
    m._on_key("?")
    assert m.display.show_help
    m._on_key("q")
    assert m._stop.is_set()

    import asyncio

    async def drive_client():
        c = AsciiChatClient("127.0.0.1", 1)
        c._on_key("f")
        c._on_key("s")
        c._on_key("?")
        assert c.transform.flip_x and c.display.show_fps and c.display.show_help
        c._on_key("q")
        assert c._stop.is_set()

    asyncio.run(drive_client())


def test_syncdebug_no_false_cycles_after_reuse_or_crossthread_release():
    """Two false-positive generators in the lock-order detector (review):
    (a) a recreated per-instance lock must NOT inherit a dead lock's
    ordering history via '#N' name reuse; (b) a cross-thread release
    (hand-off) must not leave a phantom held-entry producing bogus
    edges."""
    import threading

    from asciichat_tpu.utils import syncdebug as sd

    sd.reset()
    a = sd.NamedLock("sd-server")
    b = sd.NamedLock("sd-codec")
    with a:
        with b:
            pass
    b.unregister()  # per-client lock dies with its client
    b2 = sd.NamedLock("sd-codec")
    assert b2.name != b.name  # suffixes are monotonic, never reused
    with b2:
        with a:  # opposite order vs the DEAD lock: not a real cycle
            pass
    assert sd.find_order_cycles() == []

    sd.reset()
    lk = sd.NamedLock("sd-frame")
    other = sd.NamedLock("sd-other")
    lk.acquire()
    t = threading.Thread(target=lk.release)  # hand-off release
    t.start()
    t.join()
    with other:
        pass
    assert ("sd-frame", "sd-other") not in sd.dump_state()["order_edges"]
    sd.reset()
