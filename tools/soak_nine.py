#!/usr/bin/env python
"""9-client heterogeneous soak with join/leave churn (VERDICT r03 #3).

The reference claims linear scaling to 9+ clients (src/server/render.c:37)
with per-client render threads; here the analog is 9 PRODUCTION clients in
one live server tick, spread over >=3 concurrent RenderGroups (3 geometries
x mixed color modes, a custom palette, and 6 distinct color filters), plus a
churn client that joins and leaves throughout — every join/leave changes the
source layout, forcing group rebuilds (re-traces) exactly like the
reference's client_joined/left re-render path.

Reported (one JSON line, docs/artifacts/soak_nine_r*.json):
- per-client delivery counts + balance ratio (min/max over persistent 9)
- tick cadence, device-tick fraction
- RenderGroup (re)build count — the re-trace/layout-churn signal
- steady-state tick latency p50/p99 vs the 16.67 ms deadline
- RSS samples + post-warmup drift (leak slope)

Usage: python tools/soak_nine.py [seconds] (defaults 600)
"""

from __future__ import annotations

import asyncio
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_kib() -> int:
    return int(open("/proc/self/statm").read().split()[1]) * 4096 // 1024


async def main(seconds: float) -> int:
    import jax

    # pin cpu: the soak measures the serving runtime, not the TPU tunnel
    # (the axon sitecustomize would otherwise route the tick over a ~50 ms
    # dispatch RTT — CLAUDE.md gotcha)
    jax.config.update("jax_platforms", "cpu")
    from asciichat_tpu.apps.client import AsciiChatClient
    from asciichat_tpu.apps.server import AsciiChatServer
    from asciichat_tpu.net import protocol as proto
    from asciichat_tpu.net.transport import serve_tcp
    from asciichat_tpu.ops import filters
    from asciichat_tpu.render.types import (ColorLevel, RenderMode,
                                            TerminalCapabilities)
    from asciichat_tpu.runtime.framesource import open_source
    from asciichat_tpu.utils import term

    server = AsciiChatServer()
    tcp_srv = await serve_tcp(server._handle_conn, "127.0.0.1", 0)
    port = tcp_srv.sockets[0].getsockname()[1]
    tick = asyncio.get_running_loop().create_task(server._tick_loop())

    deadline = time.monotonic() + seconds
    warmup_until = time.monotonic() + min(60.0, seconds * 0.25)
    devnull = open(os.devnull, "wb")
    counts: dict[str, object] = {}
    churn_events = 0

    # 9 persistent clients -> at least 4 distinct RenderGroup keys
    # (caps, width, height, palette_custom) x 6 distinct filters:
    #   group A: 60x18 truecolor half-block  (none / green / rainbow)
    #   group B: 44x14 truecolor foreground  (cyan / magenta)
    #   group C: 72x22 256-color half-block  (none / orange)
    #   group D: 60x18 truecolor half-block, CUSTOM palette (none / red)
    SPECS = [
        ("a1", 60, 18, ColorLevel.TRUECOLOR, RenderMode.HALF_BLOCK, "", "none"),
        ("a2", 60, 18, ColorLevel.TRUECOLOR, RenderMode.HALF_BLOCK, "", "green"),
        ("a3", 60, 18, ColorLevel.TRUECOLOR, RenderMode.HALF_BLOCK, "", "rainbow"),
        ("b1", 44, 14, ColorLevel.TRUECOLOR, RenderMode.FOREGROUND, "", "cyan"),
        ("b2", 44, 14, ColorLevel.TRUECOLOR, RenderMode.FOREGROUND, "", "magenta"),
        ("c1", 72, 22, ColorLevel.COLOR_256, RenderMode.HALF_BLOCK, "", "none"),
        ("c2", 72, 22, ColorLevel.COLOR_256, RenderMode.HALF_BLOCK, "", "orange"),
        ("d1", 60, 18, ColorLevel.TRUECOLOR, RenderMode.HALF_BLOCK, " .:#@", "none"),
        ("d2", 60, 18, ColorLevel.TRUECOLOR, RenderMode.HALF_BLOCK, " .:#@", "red"),
    ]

    def make_client(w, h, color, mode, palette, filt):
        caps = TerminalCapabilities(color, mode)
        wc = proto.WireCapabilities(
            caps=caps, width=w, height=h, palette_custom=palette,
            palette_type=5 if palette else 0,  # PALETTE_CUSTOM analog
            color_filter=filters.FILTER_NAMES.index(filt),
        )
        c = AsciiChatClient("127.0.0.1", port, open_source(test_pattern=True),
                            wc, reconnect=False)
        c.display.writer = term.FrameWriter(devnull)
        return c

    async def run_client(name, spec, until):
        c = make_client(*spec)
        task = asyncio.create_task(c.run(max_frames=10**9))
        try:
            while time.monotonic() < until and not task.done():
                await asyncio.sleep(1.0)
            got = c.frames_received
            if task.done() and task.exception():
                counts[name] = f"DIED: {task.exception()!r}"
            else:
                prev = counts.get(name, 0)
                # a prior DIED entry is a string; a later successful join
                # (churn loop) must not TypeError the whole soak
                counts[name] = (prev if isinstance(prev, int) else 0) + got
        finally:
            task.cancel()
            try:
                await task
            except (asyncio.CancelledError, Exception):
                pass

    async def churner():
        # join/leave loop: a 10th streaming client with its OWN geometry
        # appears for ~15 s then leaves for ~10 s. Every transition changes
        # the source layout (stack shape) AND the group set -> rebuilds.
        nonlocal churn_events
        spec = (52, 16, ColorLevel.TRUECOLOR, RenderMode.FOREGROUND, "", "teal")
        while time.monotonic() + 20 < deadline:
            await run_client("churn", spec,
                            min(deadline, time.monotonic() + 15))
            churn_events += 1
            await asyncio.sleep(10)

    rss0 = rss_kib()
    samples: list[int] = []

    async def sampler():
        while time.monotonic() < deadline:
            await asyncio.sleep(max(5.0, seconds / 40))
            samples.append(rss_kib())

    async def warmup_reset():
        while time.monotonic() < warmup_until:
            await asyncio.sleep(0.5)
        server._tune_latency()
        server.tick_latency.reset()
        server.frame_age.reset()

    t0 = time.monotonic()
    await asyncio.gather(
        *(run_client(name, spec, deadline)
          for name, *spec in SPECS),
        churner(),
        sampler(),
        warmup_reset(),
    )
    dt = time.monotonic() - t0
    tick.cancel()
    tcp_srv.close()

    persistent = {k: v for k, v in counts.items() if k != "churn"}
    died = {k: v for k, v in persistent.items() if not isinstance(v, int)}
    nums = [v for v in persistent.values() if isinstance(v, int)]
    total = sum(nums) + (counts.get("churn", 0)
                         if isinstance(counts.get("churn"), int) else 0)
    balance = (min(nums) / max(nums)) if nums and max(nums) > 0 else 0.0
    q = max(1, len(samples) // 4)
    drift = (sum(samples[-q:]) / q - sum(samples[-2 * q: -q]) / q
             if len(samples) >= 4 else 0.0)
    lat = server.tick_latency.stats_ms()
    result = {
        "soak": "nine_heterogeneous_churn_cpu",
        "seconds": round(dt, 1),
        "clients": 9,
        "render_groups_concurrent": 4,
        "distinct_filters": 6,
        "frames_delivered": total,
        "per_client": {k: v for k, v in counts.items()},
        "balance_min_over_max": round(balance, 3),
        "churn_joins": churn_events,
        "group_rebuilds": server.group_creates,
        "tick_rate": round(server.ticks / dt, 1),
        "ticks": server.ticks,
        "device_tick_computes": server.tick_compute_count,
        "latency_p50_ms": lat["p50_ms"],
        "latency_p99_ms": lat["p99_ms"],
        "latency_worst_ms": lat["worst_ms"],
        "latency_samples": lat["n"],
        "deadline_ms": 16.67,
        "rss_start_kib": rss0,
        "rss_samples_kib": samples[:3] + ["..."] + samples[-3:]
        if len(samples) > 6 else samples,
        "rss_postwarmup_drift_kib": round(drift),
    }
    # 9 clients + churn on however many cores this host has (1 in CI): the
    # pass gates are liveness, balance, churn-driven rebuilds observed, and
    # no leak slope — raw cadence scales with the host
    ok = (not died and total > 0 and balance > 0.5 and churn_events >= 3
          and server.group_creates >= churn_events  # layout churn re-traced
          and server.ticks / dt > 3 and drift < 50_000)
    result["ok"] = ok
    print(json.dumps(result))
    print("RESULT:", "OK" if ok else
          f"FAILED (died={died}, balance={balance:.2f}, "
          f"churn={churn_events}, rebuilds={server.group_creates}, "
          f"drift={drift:+.0f} KiB)")
    return 0 if ok else 1


if __name__ == "__main__":
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 600.0
    rc = asyncio.run(main(secs))
    sys.stdout.flush()
    os._exit(rc)
