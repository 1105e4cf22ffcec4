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
