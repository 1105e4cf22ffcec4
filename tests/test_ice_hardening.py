"""ICE hardening (VERDICT r03 #7): RFC 7675 consent freshness on the
nominated pair, peer-reflexive candidate promotion, trickle-tolerant
candidate handling, and mid-session path-death recovery — re-nomination
when a path comes back, ACDS relay fallback when it doesn't.

Reference counterpart: libdatachannel's full ICE agent keepalive/consent
behavior (/root/reference/lib/network/webrtc/ice.c role); this repo's
ICE-lite subset now carries the same liveness guarantees.
"""

import asyncio
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asciichat_tpu.net import packet as pkt  # noqa: E402


def _mk_agents(**kw):
    from asciichat_tpu.net.webrtc import IceLiteAgent

    kw.setdefault("dtls", False)  # secretbox channel: deterministic, no openssl
    return (IceLiteAgent(controlling=True, **kw),
            IceLiteAgent(controlling=False, **kw))


FAST = dict(consent_interval=0.15, consent_expiry=0.5, renominate_timeout=5.0)


def test_consent_keepalive_refreshes():
    """Healthy pair: consent Binding requests flow both ways and keep
    refreshing `_last_consent`; no pair death occurs."""

    async def run():
        a, b = _mk_agents(**FAST)
        await a.start("127.0.0.1")
        await b.start("127.0.0.1")
        try:
            b.set_remote(a.local_description())
            a.set_remote(b.local_description())
            ch_a = await a.wait_connected(10)
            ch_b = await b.wait_connected(10)
            t0_a, t0_b = a._last_consent, b._last_consent
            await asyncio.sleep(1.2)  # ~8 consent beats, > expiry window
            assert a.pair_deaths == 0 and b.pair_deaths == 0
            assert a._last_consent > t0_a, "initiator consent never refreshed"
            assert b._last_consent > t0_b, "responder consent never refreshed"
            await ch_a.send(pkt.PacketType.PING, b"alive")
            assert (await asyncio.wait_for(ch_b.recv(), 5))[1] == b"alive"
        finally:
            a.close()
            b.close()

    asyncio.run(asyncio.wait_for(run(), 30))


def test_consent_death_then_renomination_rebinds_channel():
    """A transient blackhole (all datagrams dropped) outlives the consent
    expiry: the pair is torn down, checks restart, and when the path heals
    the SAME channel object is re-nominated onto the working pair — the
    application never sees a new channel."""

    async def run():
        a, b = _mk_agents(**FAST)
        await a.start("127.0.0.1")
        await b.start("127.0.0.1")
        try:
            b.set_remote(a.local_description())
            a.set_remote(b.local_description())
            ch_a = await a.wait_connected(10)
            ch_b = await b.wait_connected(10)
            await ch_a.send(pkt.PacketType.PING, b"before")
            assert (await asyncio.wait_for(ch_b.recv(), 5))[1] == b"before"

            # blackhole BOTH directions so neither side's checks or
            # responses get through, longer than the consent expiry
            reals = {}
            for agent in (a, b):
                reals[agent] = agent.transport.sendto
                agent.transport.sendto = lambda data, addr=None: None
            await asyncio.sleep(1.0)  # > consent_expiry
            assert a.pair_deaths >= 1, "controlling side never saw the death"
            assert not a.connected.is_set()

            # path heals: restore delivery, re-nomination must follow
            for agent, real in reals.items():
                agent.transport.sendto = real
            for _ in range(100):
                if a.connected.is_set():
                    break
                await asyncio.sleep(0.1)
            assert a.connected.is_set(), "no re-nomination after heal"
            assert a.renominations >= 1
            assert a.channel is ch_a, "re-nomination must keep the channel"

            await ch_a.send(pkt.PacketType.PING, b"after-heal")
            assert (await asyncio.wait_for(ch_b.recv(), 10))[1] == b"after-heal"
            assert not ch_a.via_relay
        finally:
            a.close()
            b.close()

    asyncio.run(asyncio.wait_for(run(), 60))


def test_prflx_promotion_learns_unadvertised_address():
    """An authenticated Binding request from an address absent from the
    remote candidate list (the peer's real NAT mapping) is promoted to a
    prflx candidate, so post-death re-checks can target it."""
    from asciichat_tpu.net import stun
    from asciichat_tpu.net.webrtc import IceLiteAgent

    async def run():
        a = IceLiteAgent(controlling=True, dtls=False)
        await a.start("127.0.0.1")
        try:
            peer = IceLiteAgent(controlling=False, dtls=False)
            a.set_remote({
                "ufrag": "zz", "pwd": "secretpw",
                "pubkey": peer.crypto.public_key.hex(),
                "candidates": [{"ip": "127.0.0.1", "port": 9}],
            })
            # forge the peer's check arriving from an UNADVERTISED source
            # (loopback addrs: the response/consent sends must not error)
            txid = stun.new_transaction_id()
            req = stun.make_binding_request(
                txid, f"{a.ufrag}:zz", a.pwd.encode(), controlling=False)
            a._on_stun(req, ("127.0.0.1", 7777))
            cands = a.remote["candidates"]
            assert {"ip": "127.0.0.1", "port": 7777,
                    "type": "prflx"} in cands
            assert a.prflx_promoted == 1
            # duplicate request does not re-add
            a._on_stun(req, ("127.0.0.1", 7777))
            assert a.prflx_promoted == 1
            # bad integrity from a new address is NOT promoted
            bad = stun.make_binding_request(
                stun.new_transaction_id(), f"{a.ufrag}:zz", b"wrongpw",
                controlling=False)
            a._on_stun(bad, ("127.0.0.1", 8888))
            assert a.prflx_promoted == 1
        finally:
            a.close()

    asyncio.run(asyncio.wait_for(run(), 30))


def test_trickle_candidates_join_live_checks():
    """Trickle ICE: the offer arrives with NO usable candidates; the real
    one arrives later via add_remote_candidate and the connection still
    establishes."""

    async def run():
        a, b = _mk_agents(**FAST)
        await a.start("127.0.0.1")
        await b.start("127.0.0.1")
        try:
            desc_b = b.local_description()
            real_cands = desc_b["candidates"]
            desc_b["candidates"] = []  # trickle: none up front
            b.set_remote(a.local_description())
            a.set_remote(desc_b)
            await asyncio.sleep(0.5)
            assert not a.connected.is_set()  # nothing to check yet
            for c in real_cands:
                a.add_remote_candidate(c)
            a.add_remote_candidate(dict(real_cands[0]))  # dup ignored
            ch_a = await a.wait_connected(10)
            ch_b = await b.wait_connected(10)
            await ch_a.send(pkt.PacketType.PING, b"trickled")
            assert (await asyncio.wait_for(ch_b.recv(), 5))[1] == b"trickled"
            n = len(a.remote["candidates"])
            assert n >= len(real_cands)  # dup was not double-added
        finally:
            a.close()
            b.close()

    asyncio.run(asyncio.wait_for(run(), 30))


def test_sdp_trickle_candidate_line_shapes():
    """parse_candidate_line accepts every wire shape browsers emit."""
    from asciichat_tpu.net import sdp

    want = {"ip": "192.0.2.1", "port": 5000, "type": "host"}
    raw = "0 1 udp 2130706431 192.0.2.1 5000 typ host"
    assert sdp.parse_candidate_line(f"a=candidate:{raw}") == want
    assert sdp.parse_candidate_line(f"candidate:{raw}") == want
    assert sdp.parse_candidate_line(raw) == want
    assert sdp.parse_candidate_line("a=end-of-candidates") is None
    assert sdp.parse_candidate_line("") is None
    # TCP and mDNS candidates are unusable here
    assert sdp.parse_candidate_line(
        "candidate:1 1 tcp 1 192.0.2.1 9 typ host tcptype active") is None
    assert sdp.parse_candidate_line(
        "candidate:1 1 udp 1 abc123.local 5000 typ host") is None


def test_gateway_trickle_endpoint():
    """POST /webrtc/candidate routes a trickled line to the right agent by
    ufrag; unknown ufrag -> None (404)."""
    from asciichat_tpu.apps.webclient import WebRtcGateway
    from asciichat_tpu.net import dtls

    if not dtls.available():
        pytest.skip("no OpenSSL: gateway requires DTLS")
    from asciichat_tpu.net import sdp
    from asciichat_tpu.net.webrtc import IceLiteAgent

    async def run():
        async def handler(t):
            pass

        gw = WebRtcGateway(handler)
        # a browser-style offer WITHOUT candidates (trickle)
        browser = IceLiteAgent(controlling=True)
        await browser.start("127.0.0.1")
        try:
            offer_desc = browser.local_description()
            offer_desc["candidates"] = []
            offer = sdp.build(offer_desc, setup="actpass", ice_lite=False)
            resp = await gw.on_offer(offer.encode())
            assert resp is not None and resp[0] == "application/sdp"
            agent = gw._agents_by_ufrag[browser.ufrag]
            assert agent.remote["candidates"] == []
            line = f"candidate:0 1 udp 2130706431 127.0.0.1 {browser.local_port} typ host"
            assert gw.on_candidate(
                f"/webrtc/candidate?ufrag={browser.ufrag}",
                line.encode()) == ("text/plain", b"ok")
            assert agent.remote["candidates"] == [
                {"ip": "127.0.0.1", "port": browser.local_port,
                 "type": "host"}]
            # unknown ufrag -> 404; end-of-candidates -> ok, no change
            assert gw.on_candidate("/webrtc/candidate?ufrag=nope",
                                   line.encode()) is None
            assert gw.on_candidate(
                f"/webrtc/candidate?ufrag={browser.ufrag}",
                b"a=end-of-candidates") == ("text/plain", b"ok")
            assert len(agent.remote["candidates"]) == 1
        finally:
            browser.close()
            gw.close()

    asyncio.run(asyncio.wait_for(run(), 30))


def test_gateway_retried_offer_supersedes_stale_agent():
    """A browser retrying POST /webrtc/offer with the SAME ufrag (HTTP
    timeout + retry) must supersede the in-flight agent: the stale agent's
    task is cancelled so its UDP socket closes NOW (not after a 30 s
    wait_connected timeout), and the trickle route points at the new agent."""
    from asciichat_tpu.apps.webclient import WebRtcGateway
    from asciichat_tpu.net import dtls

    if not dtls.available():
        pytest.skip("no OpenSSL: gateway requires DTLS")
    from asciichat_tpu.net import sdp
    from asciichat_tpu.net.webrtc import IceLiteAgent

    async def run():
        async def handler(t):
            pass

        gw = WebRtcGateway(handler)
        browser = IceLiteAgent(controlling=True)
        await browser.start("127.0.0.1")
        try:
            offer_desc = browser.local_description()
            offer_desc["candidates"] = []
            offer = sdp.build(offer_desc, setup="actpass", ice_lite=False)
            assert await gw.on_offer(offer.encode()) is not None
            first = gw._agents_by_ufrag[browser.ufrag]
            first_task = gw._task_by_agent[first]
            assert await gw.on_offer(offer.encode()) is not None
            second = gw._agents_by_ufrag[browser.ufrag]
            assert second is not first
            # the stale task was cancelled; its finally closes the agent
            # (transport torn down => its UDP port is released)
            await asyncio.sleep(0.05)
            assert first_task.cancelled() or first_task.done()
            assert first not in gw._task_by_agent
            assert first.transport is None or first.transport.is_closing()
            # trickle still routes to the LIVE replacement
            line = (f"candidate:0 1 udp 2130706431 127.0.0.1 "
                    f"{browser.local_port} typ host")
            assert gw.on_candidate(
                f"/webrtc/candidate?ufrag={browser.ufrag}",
                line.encode()) == ("text/plain", b"ok")
            assert len(second.remote["candidates"]) == 1
        finally:
            browser.close()
            gw.close()

    asyncio.run(asyncio.wait_for(run(), 30))


def test_midsession_path_death_survives_via_relay(monkeypatch):
    """The headline scenario: a direct P2P session is ESTABLISHED and
    exchanging frames when the path dies for good (NAT rebind/timeout that
    never heals). Consent expires, re-nomination finds nothing, and the
    session transparently walks down to the ACDS relay rung — the SAME
    channel objects keep delivering ACIP packets."""
    from asciichat_tpu.apps.acds import AcdsServer
    from asciichat_tpu.apps.discovery import DiscoverySession
    from asciichat_tpu.net.transport import serve_tcp
    from asciichat_tpu.net.webrtc import IceLiteAgent

    orig_init = IceLiteAgent.__init__

    def fast_init(self, *args, **kw):
        kw.update(consent_interval=0.15, consent_expiry=0.5,
                  renominate_timeout=0.6)
        orig_init(self, *args, **kw)

    monkeypatch.setattr(IceLiteAgent, "__init__", fast_init)
    monkeypatch.setenv("ASCIICHAT_P2P_DTLS", "0")  # deterministic ARQ channel
    monkeypatch.setattr("asciichat_tpu.net.webrtc.DTLS_DEFAULT", "0")

    async def run():
        acds = AcdsServer("127.0.0.1", 0)
        srv = await serve_tcp(acds._handle, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]
        s1 = DiscoverySession("127.0.0.1", port, participant_id="mob-a")
        s2 = DiscoverySession("127.0.0.1", port, participant_id="mob-b")
        await s1.connect()
        await s2.connect()
        session = await s1.create(my_port=15013)
        await s2.join(session)
        events = [asyncio.create_task(s.event_loop()) for s in (s1, s2)]
        try:
            ch_a, ch_b = await asyncio.gather(
                s1.p2p_connect("mob-b", timeout=20),
                s2.p2p_accept("mob-a", timeout=20),
            )
            assert not ch_a.via_relay and not ch_b.via_relay
            await ch_a.send(pkt.PacketType.TEXT_MESSAGE, b"direct")
            assert (await asyncio.wait_for(ch_b.recv(), 5))[1] == b"direct"

            # the path dies for good: every direct UDP datagram vanishes
            for sess in (s1, s2):
                for agent in sess._p2p_agents.values():
                    if agent.transport is not None:
                        agent.transport.sendto = lambda d, a=None: None

            # consent expires -> re-nomination fails -> relay fallback
            for _ in range(200):
                if ch_a.via_relay and ch_b.via_relay:
                    break
                await asyncio.sleep(0.1)
            assert ch_a.via_relay, "initiator never fell back to relay"
            assert ch_b.via_relay, "responder never rebound to relay"

            # SAME channel objects keep working, both directions
            await ch_a.send(pkt.PacketType.TEXT_MESSAGE, b"over-relay")
            assert (await asyncio.wait_for(ch_b.recv(), 10))[1] == b"over-relay"
            big = bytes(range(256)) * 10
            await ch_b.send(pkt.PacketType.ASCII_FRAME, big)
            ptype, payload = await asyncio.wait_for(ch_a.recv(), 10)
            assert payload == big
        finally:
            for e in events:
                e.cancel()
            await s1.leave()
            await s2.leave()
            srv.close()

    asyncio.run(asyncio.wait_for(run(), 90))
