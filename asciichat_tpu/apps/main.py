"""Unified CLI: one binary, subcommand modes (src/main.c:372-435 pattern).

    python -m asciichat_tpu.apps.main mirror --test-pattern
    python -m asciichat_tpu.apps.main server --port 27224
    python -m asciichat_tpu.apps.main client 127.0.0.1 --test-pattern
    python -m asciichat_tpu.apps.main bench
"""

from __future__ import annotations

import argparse
import os
import sys

from asciichat_tpu.render.types import ColorLevel, RenderMode
from asciichat_tpu.utils import logsys


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--width", type=int, default=None, help="output width in chars")
    p.add_argument("--height", type=int, default=None, help="output height in chars")
    p.add_argument("--palette", default="standard",
                   help="palette name (standard/blocks/digital/minimal/cool) or custom chars")
    p.add_argument("--render-mode", type=int, default=RenderMode.FOREGROUND,
                   choices=[0, 1, 2], help="0=foreground 1=background 2=half-block")
    def _color_mode(s: str) -> ColorLevel:
        try:
            return ColorLevel[s.upper()]
        except KeyError:
            raise argparse.ArgumentTypeError(
                f"invalid color mode {s!r} (choose from "
                f"{', '.join(c.name for c in ColorLevel)})"
            ) from None

    p.add_argument("--color-mode", type=_color_mode, default=None,
                   help="override color detection: NONE/COLOR_16/COLOR_256/TRUECOLOR")
    p.add_argument("--color-filter", default="none", help="monochromatic tint filter")
    p.add_argument("--stretch", action="store_true", help="ignore aspect ratio")
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--show-fps", action="store_true")
    p.add_argument("--log-file", default=None)
    p.add_argument("--log-level", default="INFO")
    p.add_argument("--grep", default=None, help="regex filter applied to log messages")
    p.add_argument("--log-json", action="store_true")
    p.add_argument("--config", default=None, help="TOML config file")
    p.add_argument("--preset", default=None, help="named preset from the config file")


def _add_media(p: argparse.ArgumentParser) -> None:
    p.add_argument("--test-pattern", action="store_true", help="synthetic webcam")
    p.add_argument("--file", default=None, help="media file (image, or video via ffmpeg)")
    p.add_argument("--loop", action="store_true", help="loop file playback")
    p.add_argument("--flip-x", action="store_true")


def _resolve_palette(name: str) -> str:
    from asciichat_tpu.render.palette import BUILTIN_PALETTES

    return BUILTIN_PALETTES.get(name, name)


def cmd_mirror(args) -> int:
    from asciichat_tpu.models.mirror import MirrorSession
    from asciichat_tpu.runtime.framesource import open_source
    from asciichat_tpu.utils import term

    caps = term.detect_capabilities(RenderMode(args.render_mode), args.color_mode)
    w, h = term.terminal_size(args.width, args.height)
    source = open_source(test_pattern=args.test_pattern, file=args.file, loop=args.loop)
    if args.render_file:
        from asciichat_tpu.models.renderfile import render_to_file

        n = render_to_file(source, args.render_file, caps, w, h,
                           _resolve_palette(args.palette),
                           max_frames=args.max_frames or 300, fps=int(args.fps))
        print(f"rendered {n} frames to {args.render_file}")
        return 0
    session = MirrorSession(
        source, caps, w, h, _resolve_palette(args.palette),
        fps_limit=args.fps, color_filter=args.color_filter,
        flip_x=args.flip_x, stretch=args.stretch, show_fps=args.show_fps,
        matrix=args.matrix,
    )
    if args.snapshot:
        session.run_snapshot()
        return 0
    session.run(max_frames=args.max_frames)
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="asciichat-tpu",
                                 description="TPU-native terminal video chat")
    sub = ap.add_subparsers(dest="mode", required=True)

    m = sub.add_parser("mirror", help="local webcam->ASCII loop, no network")
    _add_common(m)
    _add_media(m)
    m.add_argument("--snapshot", action="store_true", help="render one frame and exit")
    m.add_argument("--max-frames", type=int, default=None)
    m.add_argument("--matrix", action="store_true", help="digital rain overlay")
    m.add_argument("--render-file", default=None,
                   help="render to a video file (.y4m, or any format via ffmpeg)")
    m.set_defaults(fn=cmd_mirror)

    s = sub.add_parser("server", help="multi-client compositing server")
    _add_common(s)
    s.add_argument("--host", default="0.0.0.0")
    s.add_argument("--port", type=int, default=27224)
    s.add_argument("--compress", type=int, default=1, help="zstd level 1-9")
    s.add_argument("--password", default=None, help="require password auth")
    s.add_argument("--ws-port", type=int, default=None,
                   help="also listen for WebSocket clients on this port")
    s.add_argument("--mdns", action="store_true", help="announce via mDNS on the LAN")
    s.add_argument("--inspect-port", type=int, default=None,
                   help="live-process inspector HTTP port (query-server analog)")
    from asciichat_tpu.apps import server as server_mod

    s.set_defaults(fn=server_mod.main)

    c = sub.add_parser("client", help="connect to a server")
    _add_common(c)
    _add_media(c)
    c.add_argument("address")
    c.add_argument("--port", type=int, default=27224)
    c.add_argument("--no-media", action="store_true", help="view-only")
    c.add_argument("--ws", action="store_true", help="connect over WebSocket")
    c.add_argument("--encrypt", action="store_true",
                   help="X25519 + XSalsa20-Poly1305 encrypted session")
    c.add_argument("--password", default=None, help="password for auth")
    c.add_argument("--no-reconnect", action="store_true")
    c.add_argument("--max-frames", type=int, default=None)
    c.add_argument("--audio", action="store_true",
                   help="send/receive audio (mic via arecord, else 440Hz tone)")
    c.add_argument("--tone-hz", type=float, default=None,
                   help="synthetic tone capture frequency (0 = silence); implies --audio")
    c.add_argument("--audio-wav", default=None,
                   help="WAV file as the audio capture source; implies --audio")
    c.add_argument("--audio-out", default=None,
                   help="write received mix to this raw-f32 file (default: speaker/null)")
    c.add_argument("--h265", action="store_true",
                   help="H.265 uplink when ffmpeg + server support allow (else raw RGB)")
    from asciichat_tpu.apps import client as client_mod

    c.set_defaults(fn=client_mod.main)

    d = sub.add_parser("discovery-service", help="ACDS rendezvous server")
    _add_common(d)
    d.add_argument("--host", default="0.0.0.0")
    d.add_argument("--port", type=int, default=27225)
    d.add_argument("--db", default=":memory:", help="SQLite session database path")
    from asciichat_tpu.apps import acds as acds_mod

    d.set_defaults(fn=acds_mod.main)

    dc = sub.add_parser("discovery", help="P2P session via discovery service")
    _add_common(dc)
    dc.add_argument("--acds", default="127.0.0.1", help="discovery service address")
    dc.add_argument("--acds-port", type=int, default=27225)
    dc.add_argument("--join", default=None, help="session string to join (else create)")
    dc.add_argument("--port", type=int, default=27224, help="port to host on when creating")
    dc.add_argument("--advertise", default="127.0.0.1", help="address to advertise as host")
    dc.add_argument("--max-frames", type=int, default=None)
    dc.add_argument("--ring-interval", type=float, default=None,
                    help="ring-consensus collection interval in seconds (default 60)")
    dc.add_argument("--view", action="store_true",
                    help="when creating, also view the session locally")
    from asciichat_tpu.apps import discovery as discovery_mod

    dc.set_defaults(fn=discovery_mod.main)

    def cmd_bench(a) -> int:
        # bench.py lives at the repo root (driver contract), not in the
        # package — load it by path so installed entry points work too
        import importlib.util
        import pathlib

        path = pathlib.Path(__file__).resolve().parents[2] / "bench.py"
        if not path.exists():
            print("bench.py not found (repo checkout required)", file=sys.stderr)
            return 1
        spec = importlib.util.spec_from_file_location("asciichat_bench", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.main()

    b = sub.add_parser("bench", help="run the throughput benchmark")
    b.set_defaults(fn=cmd_bench)

    def cmd_strings(a) -> int:
        """Word-list helper (src/strings/main.c analog)."""
        from asciichat_tpu.net.discovery import (
            ADJECTIVES, NOUNS, generate_session_string, validate_session_string,
        )

        if a.validate:
            ok = validate_session_string(a.validate)
            print("valid" if ok else "invalid")
            return 0 if ok else 1
        if a.list_words:
            print("adjectives:", " ".join(ADJECTIVES))
            print("nouns:", " ".join(NOUNS))
            return 0
        for _ in range(a.count):
            print(generate_session_string())
        return 0

    st = sub.add_parser("strings", help="session word-string tool")
    st.add_argument("--count", type=int, default=1)
    st.add_argument("--validate", default=None)
    st.add_argument("--list-words", action="store_true")
    st.set_defaults(fn=cmd_strings, log_level="WARNING")

    def cmd_completions(a) -> int:
        from asciichat_tpu.utils.options import default_registry, generate_completions

        print(generate_completions(default_registry(), a.shell))
        return 0

    comp = sub.add_parser("completions", help="generate shell completions")
    comp.add_argument("shell", choices=["bash", "zsh", "fish"])
    comp.set_defaults(fn=cmd_completions, log_level="WARNING")

    return ap


def main(argv=None) -> int:
    # Explicit device selection. The axon sitecustomize force-registers the
    # remote-TPU backend regardless of JAX_PLATFORMS; for interactive modes
    # on a tunnel-attached TPU the per-tick RTT exceeds the frame budget, so
    # ASCIICHAT_JAX_PLATFORM=cpu pins the math to the host.
    plat = os.environ.get("ASCIICHAT_JAX_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    args = build_parser().parse_args(argv)

    # TOML config: file values fill in anything the CLI left at its default
    # (config layering, lib/options/config/config.c semantics)
    if getattr(args, "config", None):
        from asciichat_tpu.utils.options import OptionsStore, default_registry

        store = OptionsStore(default_registry())
        snap = store.load_toml(args.config, preset=getattr(args, "preset", None))
        # An option loses to the CLI only when the user actually typed it —
        # argparse defaults cannot distinguish "unset" for non-None defaults.
        typed = set()
        for tok in (argv if argv is not None else sys.argv[1:]):
            if tok.startswith("--"):
                typed.add(tok[2:].split("=", 1)[0])
        for key, value in snap.as_dict().items():
            attr = key.replace("-", "_")
            if not hasattr(args, attr) or key in typed or attr in typed:
                continue
            if key == "color-mode" and isinstance(value, str):
                if value == "auto":
                    continue
                value = ColorLevel[{"none": "NONE", "16": "COLOR_16",
                                    "256": "COLOR_256",
                                    "truecolor": "TRUECOLOR"}[value]]
            if attr in ("width", "height") and value == 0:
                continue  # registry 0 means auto-detect
            setattr(args, attr, value)

    # SIGUSR1 -> thread/stack dump, SIGUSR2 -> gc/memory report (the
    # reference's sync-state and leak-report signals, src/main.c:323-338)
    import signal

    def _dump_threads(*_):
        import sys as _sys
        import threading
        import traceback

        frames = _sys._current_frames()
        for t in threading.enumerate():
            print(f"--- thread {t.name} ---", file=_sys.stderr)
            f = frames.get(t.ident)
            if f:
                traceback.print_stack(f, file=_sys.stderr)

    def _dump_memory(*_):
        import gc
        import sys as _sys

        print(f"--- gc: counts={gc.get_count()} objects={len(gc.get_objects())} ---",
              file=_sys.stderr)

    try:
        signal.signal(signal.SIGUSR1, _dump_threads)
        signal.signal(signal.SIGUSR2, _dump_memory)
    except (ValueError, OSError, AttributeError):
        pass

    # panic reporter (src/tooling/panic analog): unhandled exceptions write a
    # report with traceback + thread stacks before the process dies
    def _panic_hook(exc_type, exc, tb):
        import tempfile
        import traceback

        if issubclass(exc_type, (KeyboardInterrupt, BrokenPipeError)):
            sys.__excepthook__(exc_type, exc, tb)
            return
        try:
            path = os.path.join(tempfile.gettempdir(),
                                f"asciichat-panic-{os.getpid()}.txt")
            with open(path, "w") as f:
                f.write("asciichat-tpu panic report\n\n")
                traceback.print_exception(exc_type, exc, tb, file=f)
                f.write("\n--- threads ---\n")
                import threading

                frames = sys._current_frames()
                for t in threading.enumerate():
                    f.write(f"\n{t.name}:\n")
                    fr = frames.get(t.ident)
                    if fr:
                        traceback.print_stack(fr, file=f)
            print(f"panic report written to {path}", file=sys.stderr)
        except Exception:
            pass
        sys.__excepthook__(exc_type, exc, tb)

    sys.excepthook = _panic_hook

    logsys.configure(
        level=getattr(args, "log_level", "INFO"),
        log_file=getattr(args, "log_file", None),
        grep=getattr(args, "grep", None),
        json_output=getattr(args, "log_json", False),
    )
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
