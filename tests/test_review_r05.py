"""Round-5 review regression tests (ADVICE.md findings + round-5 sweeps)."""

from __future__ import annotations

import asyncio

import pytest


def test_gateway_same_ufrag_retry_exempt_from_max_pending():
    """ADVICE r04: at max_pending, a same-ufrag browser retry REPLACES its
    stale in-flight agent (cancelling it) instead of being 404'd while the
    stale agent holds its slot + UDP socket for up to 30 s."""
    from asciichat_tpu.apps.webclient import WebRtcGateway
    from asciichat_tpu.net import dtls

    if not dtls.available():
        pytest.skip("no OpenSSL: gateway requires DTLS")

    from asciichat_tpu.net import sdp
    from asciichat_tpu.net.webrtc import IceLiteAgent

    async def run():
        gw = WebRtcGateway(lambda t: asyncio.sleep(0), max_pending=1)
        browser = IceLiteAgent(controlling=True)
        await browser.start("127.0.0.1")
        other = IceLiteAgent(controlling=True)
        await other.start("127.0.0.1")
        try:
            desc = browser.local_description()
            desc["candidates"] = []
            offer = sdp.build(desc, setup="actpass", ice_lite=False).encode()
            assert await gw.on_offer(offer) is not None
            first = gw._agents_by_ufrag[browser.ufrag]
            assert len(gw._tasks) >= gw._max_pending  # gateway is full

            # a DIFFERENT browser's offer is still refused at max_pending
            other_desc = other.local_description()
            other_desc["candidates"] = []
            other_offer = sdp.build(other_desc, setup="actpass",
                                    ice_lite=False).encode()
            assert await gw.on_offer(other_offer) is None

            # but the SAME ufrag retry goes through and supersedes
            assert await gw.on_offer(offer) is not None
            second = gw._agents_by_ufrag[browser.ufrag]
            assert second is not first
            stale = [t for t in gw._tasks if gw._task_by_agent.get(second) is not t]
            await asyncio.sleep(0)  # let the cancelled task's callbacks run
            for t in stale:
                assert t.cancelled() or t.done() or t.cancelling()
        finally:
            browser.close()
            other.close()
            gw.close()

    asyncio.run(asyncio.wait_for(run(), 30))


def test_forge_cross_host_https_redirect_refused(tmp_path):
    """ADVICE r04: a forge 302ing the key fetch to a DIFFERENT https host
    must be refused — auth-material provenance is pinned to the forge host
    (the reference's https_keys.c follows no redirects at all)."""
    import http.server
    import ssl
    import threading

    from tests.test_httpskeys import _FakeForge, _make_cert

    from asciichat_tpu.net.httpskeys import load_allowed_keys
    from asciichat_tpu.net.sshauth import SshAuthError

    class _CrossHostForge(_FakeForge):
        def do_GET(self):
            if self.path == "/alice.keys":
                self.send_response(302)
                # https scheme, so the old https-only guard would FOLLOW it
                self.send_header(
                    "Location", "https://evil.example.com/alice.keys")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            super().do_GET()

    certfile, keyfile = _make_cert(tmp_path)
    httpd = http.server.HTTPServer(("127.0.0.1", 0), _CrossHostForge)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(certfile, keyfile)
    httpd.socket = ctx.wrap_socket(httpd.socket, server_side=True)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    urls = {"github": f"https://127.0.0.1:{port}/{{user}}.keys"}
    try:
        with pytest.raises(SshAuthError, match="cross-host redirect"):
            load_allowed_keys("github:alice", forge_urls=urls, cafile=certfile)
    finally:
        httpd.shutdown()


# ---------------------------------------------------------------------------
# VERDICT r04 #4: measured consensus metrics (upload probe, STUN success,
# NAT tier) feeding elections — the reference's metrics.c ships TODO
# defaults (nat_tier=1, 50 Mbps, stun literal 90; metrics.c:49-121).


def test_measure_stun_success_counts_real_exchanges():
    """A fake STUN server answering 3 of 5 binding requests yields 60% and
    the XOR-mapped address; an unreachable server yields 0%."""
    import asyncio

    from asciichat_tpu.apps.discovery import measure_stun_success
    from asciichat_tpu.net import stun

    class FakeStun(asyncio.DatagramProtocol):
        def __init__(self):
            self.seen = 0

        def connection_made(self, transport):
            self.transport = transport

        def datagram_received(self, data, addr):
            self.seen += 1
            if self.seen % 2 == 0:  # drop every second probe
                return
            mtype, txid, _ = stun.parse(data)
            assert mtype == 0x0001
            resp = stun.build(0x0101, txid, [
                (0x0020, stun.xor_mapped_address(("203.0.113.7", 40000)))])
            self.transport.sendto(resp, addr)

    async def run():
        loop = asyncio.get_running_loop()
        transport, proto = await loop.create_datagram_endpoint(
            FakeStun, local_addr=("127.0.0.1", 0))
        addr = transport.get_extra_info("sockname")
        try:
            pct, mapped = await measure_stun_success(
                (addr[0], addr[1]), n=5, timeout=0.4)
        finally:
            transport.close()
        assert pct == 60, pct  # probes 1,3,5 answered
        assert mapped == ("203.0.113.7", 40000)
        # silent server -> 0%
        t2, _ = await loop.create_datagram_endpoint(
            asyncio.DatagramProtocol, local_addr=("127.0.0.1", 0))
        dead = t2.get_extra_info("sockname")
        t2.close()
        pct0, m0 = await measure_stun_success(
            (dead[0], dead[1]), n=3, timeout=0.2)
        assert pct0 == 0 and m0 is None

    asyncio.run(asyncio.wait_for(run(), 30))


def test_upload_probe_measured_and_elections_flip():
    """The timed PING burst over the LIVE ACDS connection measures a
    throttled uplink as slower than a direct one, and an election between
    the two measured participants picks the fast one — elections now
    actually distinguish a DSL host from a datacenter one."""
    import asyncio

    from asciichat_tpu.apps.acds import AcdsServer
    from asciichat_tpu.apps.discovery import DiscoverySession
    from asciichat_tpu.net import consensus as cons
    from asciichat_tpu.net.transport import serve_tcp

    async def throttle_proxy(listen_host, acds_port, delay_per_chunk):
        """Loopback TCP proxy throttling CLIENT->ACDS bytes (a slow uplink);
        the return path is unthrottled."""
        async def handle(reader, writer):
            up_r, up_w = await asyncio.open_connection("127.0.0.1", acds_port)

            async def pipe(r, w, delay):
                try:
                    while True:
                        data = await r.read(16384)
                        if not data:
                            break
                        w.write(data)
                        await w.drain()
                        if delay:
                            await asyncio.sleep(delay)
                except (ConnectionError, OSError):
                    pass
                finally:
                    with __import__("contextlib").suppress(Exception):
                        w.close()

            await asyncio.gather(pipe(reader, up_w, delay_per_chunk),
                                 pipe(up_r, writer, 0))

        srv = await asyncio.start_server(handle, listen_host, 0)
        return srv, srv.sockets[0].getsockname()[1]

    async def run():
        acds = AcdsServer("127.0.0.1", 0)
        srv = await serve_tcp(acds._handle, "127.0.0.1", 0)
        acds_port = srv.sockets[0].getsockname()[1]
        proxy, slow_port = await throttle_proxy("127.0.0.1", acds_port, 0.05)
        try:
            fast = DiscoverySession("127.0.0.1", acds_port,
                                    participant_id="p-fast")
            await fast.connect()
            got_fast = await fast.measure_network(probe_bytes=128 * 1024)
            slow = DiscoverySession("127.0.0.1", slow_port,
                                    participant_id="p-slow")
            await slow.connect()
            got_slow = await slow.measure_network(probe_bytes=128 * 1024)
            assert got_fast.get("upload_kbps", 0) > 0
            assert got_slow.get("upload_kbps", 0) > 0
            # ~128 KiB at 16 KiB/50 ms is ~2.6 Mbps measured through the
            # throttle; the direct loopback measures orders faster
            assert got_slow["upload_kbps"] < got_fast["upload_kbps"], (
                got_slow, got_fast)
            assert got_slow["upload_kbps"] < 50_000
            # the measured values flow into metrics() and flip the election
            mf, ms = fast.metrics(), slow.metrics()
            assert mf.upload_kbps == got_fast["upload_kbps"]
            assert ms.upload_kbps == got_slow["upload_kbps"]
            ms_equalized = cons.ParticipantMetrics(
                participant_id=ms.participant_id, nat_tier=mf.nat_tier,
                upload_kbps=ms.upload_kbps, rtt_ms=mf.rtt_ms,
                stun_success_pct=mf.stun_success_pct,
                address=ms.address, port=ms.port)
            host, _backup = cons.elect([mf, ms_equalized])
            assert host == "p-fast", "election must pick the measured-faster uplink"
            # with the STUB constants both would score identically and the
            # election could only tie-break by id ("p-fast" < "p-slow"
            # lexically is a coincidence; flip ids to prove data decides)
            mf2 = cons.ParticipantMetrics(
                participant_id="z-fast", nat_tier=mf.nat_tier,
                upload_kbps=mf.upload_kbps, rtt_ms=mf.rtt_ms,
                stun_success_pct=mf.stun_success_pct,
                address=mf.address, port=mf.port)
            host2, _ = cons.elect([mf2, ms_equalized])
            assert host2 == "z-fast", "measured bandwidth outvotes id tiebreak"
            await fast.leave()
            await slow.leave()
        finally:
            proxy.close()
            srv.close()

    asyncio.run(asyncio.wait_for(run(), 60))


def test_nat_tier_classification_from_stun():
    """measure_network classifies the reference's tier scale from real STUN
    results: mapped==advertised -> public(1); mapped differs -> NATed
    STUN-reachable(3); UPnP-mapped NAT -> 2; all probes dead -> 4."""
    import asyncio

    from asciichat_tpu.apps.discovery import DiscoverySession
    from asciichat_tpu.net import stun

    def fake_stun(mapped_ip):
        class P(asyncio.DatagramProtocol):
            def connection_made(self, t):
                self.t = t

            def datagram_received(self, data, addr):
                _, txid, _ = stun.parse(data)
                self.t.sendto(stun.build(0x0101, txid, [
                    (0x0020, stun.xor_mapped_address((mapped_ip, 4242)))]),
                    addr)
        return P

    async def classify(mapped_ip, my_address, upnp=False, dead=False):
        s = DiscoverySession("127.0.0.1", 1)
        s.my_address = my_address
        s.upnp_mapped = upnp
        loop = asyncio.get_running_loop()
        t, _ = await loop.create_datagram_endpoint(
            asyncio.DatagramProtocol if dead else fake_stun(mapped_ip),
            local_addr=("127.0.0.1", 0))
        addr = t.get_extra_info("sockname")
        if dead:
            t.close()
        s.stun_server = (addr[0], addr[1])
        try:
            await s.measure_network(stun_probes=3)
        finally:
            if not dead:
                t.close()
        return s.metrics()

    async def run():
        m = await classify("198.51.100.9", "198.51.100.9")
        assert m.nat_tier == 1 and m.stun_success_pct == 100
        m = await classify("198.51.100.9", "10.1.2.3")
        assert m.nat_tier == 3
        m = await classify("198.51.100.9", "10.1.2.3", upnp=True)
        assert m.nat_tier == 2
        m = await classify("", "10.1.2.3", dead=True)
        assert m.nat_tier == 4 and m.stun_success_pct == 0

    asyncio.run(asyncio.wait_for(run(), 30))


def test_refused_client_raises_server_error():
    """A client turned away by a full server (SERVER_FULL ERROR_MESSAGE,
    apps/server.py _handle_conn) must surface the refusal from run() —
    swallowing it into a clean stop made a refused client indistinguishable
    from a finished one (the 32-client scale run's 33rd-client gate).
    Reference: the client prints the error packet and exits non-zero
    (README.md:305-313 error packet semantics)."""
    import asyncio
    import os

    from asciichat_tpu.apps.client import AsciiChatClient, ServerError
    from asciichat_tpu.apps import server as server_mod
    from asciichat_tpu.net import protocol as proto
    from asciichat_tpu.net.transport import serve_tcp
    from asciichat_tpu.render.types import (
        ColorLevel, RenderMode, TerminalCapabilities,
    )
    from asciichat_tpu.runtime.framesource import open_source
    from asciichat_tpu.utils import term

    async def run():
        server = server_mod.AsciiChatServer()
        # table full: pending reservations count exactly like live clients
        server._pending_conns = server_mod.MAX_CLIENTS
        srv = await serve_tcp(server._handle_conn, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]
        caps = TerminalCapabilities(ColorLevel.TRUECOLOR, RenderMode.FOREGROUND)
        c = AsciiChatClient("127.0.0.1", port, open_source(test_pattern=True),
                            proto.WireCapabilities(caps=caps, width=40, height=12),
                            reconnect=False)
        c.display.writer = term.FrameWriter(open(os.devnull, "wb"))
        try:
            with pytest.raises(ServerError) as ei:
                await asyncio.wait_for(c.run(max_frames=10**9), 30)
            assert ei.value.code == int(proto.WireError.SERVER_FULL)
            assert c.frames_received == 0
        finally:
            srv.close()

    asyncio.run(asyncio.wait_for(run(), 40))
