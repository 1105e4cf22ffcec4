"""STUN (RFC 5389 subset) + ICE-lite + encrypted reliable P2P channel
(lib/network/webrtc/ seat). The channel stack is negotiated: DTLS-SCTP
DataChannels when both peers advertise certificate fingerprints
(tests/test_datachannel.py covers that stack), else the legacy secretbox
Go-Back-N stream — the ARQ-specific tests here pin dtls=False to keep
exercising the secretbox path deterministically."""

import asyncio
import os
import random

import numpy as np
import pytest

from asciichat_tpu.net import packet as pkt
from asciichat_tpu.net import stun


def test_stun_message_roundtrip_and_integrity():
    txid = stun.new_transaction_id()
    pwd = b"icepassword123"
    req = stun.make_binding_request(txid, "remote:local", pwd)
    assert stun.is_stun(req)
    msg_type, got_txid, attrs = stun.parse(req)
    assert msg_type == stun.BINDING_REQUEST and got_txid == txid
    assert attrs[stun.ATTR_USERNAME] == b"remote:local"
    assert stun.verify_integrity(req, pwd)
    assert not stun.verify_integrity(req, b"wrongpassword")
    tampered = bytearray(req)
    tampered[25] ^= 0xFF  # flip a bit inside the covered region
    assert not stun.verify_integrity(bytes(tampered), pwd)

    resp = stun.make_binding_response(txid, ("192.168.1.7", 54321), pwd)
    _, _, rattrs = stun.parse(resp)
    addr = stun.parse_xor_mapped_address(
        rattrs[stun.ATTR_XOR_MAPPED_ADDRESS])
    assert addr == ("192.168.1.7", 54321)
    assert not stun.is_stun(b"\x80hello-not-stun" + b"\0" * 20)


def _mk_agents(**kw):
    from asciichat_tpu.net.webrtc import IceLiteAgent

    return (IceLiteAgent(controlling=True, **kw),
            IceLiteAgent(controlling=False, **kw))


def test_ice_lite_loopback_and_reliable_channel():
    """Full P2P loopback: candidate exchange, STUN checks with integrity,
    pair nomination, then ACIP packets (small + a 100KB frame that spans
    ~90 segments) over the encrypted reliable stream."""
    from asciichat_tpu.net.webrtc import IceLiteAgent  # noqa: F401

    async def run():
        a, b = _mk_agents()
        await a.start("127.0.0.1")
        await b.start("127.0.0.1")
        try:
            # signaling: in production these blobs ride the Ed25519-signed
            # ACDS relay (ACIP_WEBRTC_SDP); loopback exchanges them directly
            b.set_remote(a.local_description())
            a.set_remote(b.local_description())
            ch_a = await a.wait_connected(10)
            ch_b = await b.wait_connected(10)

            await ch_a.send(pkt.PacketType.PING, b"p2p-ping")
            ptype, payload = await asyncio.wait_for(ch_b.recv(), 5)
            assert (ptype, payload) == (pkt.PacketType.PING, b"p2p-ping")

            big = os.urandom(100_000)  # spans ~84 segments
            await ch_b.send(pkt.PacketType.ASCII_FRAME, big)
            ptype, payload = await asyncio.wait_for(ch_a.recv(), 15)
            assert ptype == pkt.PacketType.ASCII_FRAME
            assert payload == big  # ordered, complete, decrypted
        finally:
            a.close()
            b.close()

    asyncio.run(asyncio.wait_for(run(), 60))


def test_p2p_channel_survives_packet_loss():
    """Go-Back-N ARQ: 20% datagram loss on both directions still delivers
    the full stream (retransmission observed). Pins the secretbox channel —
    this is the ARQ's loss test (DTLS-SCTP has its own in
    test_datachannel.py)."""

    async def run():
        a, b = _mk_agents(dtls=False)
        await a.start("127.0.0.1")
        await b.start("127.0.0.1")
        try:
            b.set_remote(a.local_description())
            a.set_remote(b.local_description())
            ch_a = await a.wait_connected(10)
            ch_b = await b.wait_connected(10)

            rng = random.Random(7)
            for agent in (a, b):
                real = agent.transport.sendto

                def lossy(data, addr, real=real, rng=rng):
                    if rng.random() >= 0.2:
                        real(data, addr)

                agent.transport.sendto = lossy

            blob = os.urandom(30_000)
            await ch_a.send(pkt.PacketType.IMAGE_FRAME, blob)
            ptype, payload = await asyncio.wait_for(ch_b.recv(), 30)
            assert payload == blob
            assert ch_a.retransmits > 0  # the ARQ actually did work
        finally:
            a.close()
            b.close()

    asyncio.run(asyncio.wait_for(run(), 60))


def test_p2p_retransmit_not_starved_by_duplex_acks():
    """Regression: in a duplex session the receiver of a continuous inbound
    stream emits ACK-only segments every few ms. Those acks must NOT refresh
    the retransmission timer, or a lost outgoing DATA segment is never
    retransmitted and send() blocks forever on a full window (ADVICE r2).
    Secretbox-ARQ-specific: pins dtls=False."""

    async def run():
        a, b = _mk_agents(dtls=False)
        await a.start("127.0.0.1")
        await b.start("127.0.0.1")
        try:
            b.set_remote(a.local_description())
            a.set_remote(b.local_description())
            ch_a = await a.wait_connected(10)
            ch_b = await b.wait_connected(10)

            # a's outgoing datagrams (data AND acks) are 25% lossy
            rng = random.Random(11)
            real = a.transport.sendto

            def lossy(data, addr):
                if rng.random() >= 0.25:
                    real(data, addr)

            a.transport.sendto = lossy

            # b floods a with small packets every 10ms (< RTO/2), keeping
            # a's ack emission continuous for the whole transfer
            stop = asyncio.Event()

            async def flood():
                while not stop.is_set():
                    ch_b.send_nowait(pkt.PacketType.PING, b"tick")
                    await asyncio.sleep(0.01)

            flood_task = asyncio.create_task(flood())
            try:
                blob = os.urandom(30_000)
                await ch_a.send(pkt.PacketType.IMAGE_FRAME, blob)
                while True:
                    ptype, payload = await asyncio.wait_for(ch_b.recv(), 30)
                    if ptype == pkt.PacketType.IMAGE_FRAME:
                        break
                assert payload == blob
                assert ch_a.retransmits > 0
            finally:
                stop.set()
                flood_task.cancel()
        finally:
            a.close()
            b.close()

    asyncio.run(asyncio.wait_for(run(), 60))


def test_forged_stun_and_datagrams_rejected():
    """An attacker without the ICE password cannot nominate a pair; an
    attacker without the session key cannot inject stream data."""

    async def run():
        a, b = _mk_agents()
        await a.start("127.0.0.1")
        await b.start("127.0.0.1")
        try:
            b.set_remote(a.local_description())
            a.set_remote(b.local_description())
            ch_a = await a.wait_connected(10)
            ch_b = await b.wait_connected(10)
            # forged STUN request with the wrong password: no response/nominate
            evil_txid = stun.new_transaction_id()
            evil = stun.make_binding_request(evil_txid, "x:y", b"wrongpwd")
            a.transport.sendto(evil, ("127.0.0.1", b.local_port))
            # garbage datagram at the channel: dropped by secretbox auth
            a.transport.sendto(os.urandom(64), ("127.0.0.1", b.local_port))
            await asyncio.sleep(0.2)
            await ch_a.send(pkt.PacketType.PING, b"still-works")
            ptype, payload = await asyncio.wait_for(ch_b.recv(), 5)
            assert payload == b"still-works"
            assert b.rcv_garbage if hasattr(b, "rcv_garbage") else True
        finally:
            a.close()
            b.close()

    asyncio.run(asyncio.wait_for(run(), 60))


def test_upnp_against_fake_router():
    """Full UPnP IGD flow against a protocol-faithful fake router: SSDP
    M-SEARCH (unicast target for the test), device XML, SOAP
    AddPortMapping/GetExternalIPAddress/DeletePortMapping (upnp.c analog)."""
    import http.server
    import socket
    import threading

    from asciichat_tpu.net import upnp

    soap_calls = []

    class Router(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            xml = f"""<?xml version="1.0"?>
<root><device><serviceList><service>
<serviceType>urn:schemas-upnp-org:service:WANIPConnection:1</serviceType>
<controlURL>/ctl/wanip</controlURL>
</service></serviceList></device></root>"""
            body = xml.encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n).decode()
            action = self.headers.get("SOAPAction", "")
            soap_calls.append((action, body))
            if "GetExternalIPAddress" in action:
                resp = b"<NewExternalIPAddress>203.0.113.9</NewExternalIPAddress>"
            else:
                resp = b"<ok/>"
            self.send_response(200)
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

    httpd = http.server.HTTPServer(("127.0.0.1", 0), Router)
    http_port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    # fake SSDP responder on a unicast UDP port
    ssdp = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    ssdp.bind(("127.0.0.1", 0))
    ssdp_port = ssdp.getsockname()[1]

    def ssdp_responder():
        data, addr = ssdp.recvfrom(2048)
        assert b"M-SEARCH" in data and b"InternetGatewayDevice" in data
        ssdp.sendto(
            ("HTTP/1.1 200 OK\r\nST: x\r\n"
             f"LOCATION: http://127.0.0.1:{http_port}/desc.xml\r\n\r\n").encode(),
            addr)

    threading.Thread(target=ssdp_responder, daemon=True).start()
    try:
        gw = upnp.UpnpGateway.discover(target=("127.0.0.1", ssdp_port))
        assert gw.service_type.endswith("WANIPConnection:1")
        gw.add_port_mapping(27224, 27224, "192.168.1.50")
        assert gw.external_ip() == "203.0.113.9"
        gw.delete_port_mapping(27224)
        actions = [a for a, _ in soap_calls]
        assert any("AddPortMapping" in a for a in actions)
        assert any("DeletePortMapping" in a for a in actions)
        add_body = next(b for a, b in soap_calls if "AddPortMapping" in a)
        assert "<NewInternalClient>192.168.1.50</NewInternalClient>" in add_body
        assert "<NewExternalPort>27224</NewExternalPort>" in add_body
    finally:
        httpd.shutdown()
        ssdp.close()


def test_natpmp_against_fake_gateway():
    """NAT-PMP (RFC 6886) request/response against a fake gateway; refusal
    surfaces as NatError."""
    import socket
    import struct
    import threading

    from asciichat_tpu.net import upnp

    gw = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    gw.bind(("127.0.0.1", 0))
    port = gw.getsockname()[1]

    def responder(result_code):
        data, addr = gw.recvfrom(64)
        ver, op, _res, iport, eport, lease = struct.unpack(">BBHHHI", data)
        assert ver == 0 and op == 2  # TCP map
        resp = struct.pack(">BBHIHHI", 0, 128 + op, result_code, 1234,
                           iport, eport if result_code == 0 else 0, lease)
        gw.sendto(resp, addr)

    t = threading.Thread(target=responder, args=(0,), daemon=True)
    t.start()
    eport, lease = upnp.natpmp_map("127.0.0.1", 27224, 27224,
                                   gateway_port=port)
    t.join()
    assert eport == 27224 and lease == 3600

    t = threading.Thread(target=responder, args=(2,), daemon=True)  # refused
    t.start()
    with pytest.raises(upnp.NatError):
        upnp.natpmp_map("127.0.0.1", 27224, 27224, gateway_port=port)
    t.join()
    gw.close()


def test_p2p_through_acds_signaling():
    """End-to-end: two discovery participants negotiate a P2P channel with
    offer/answer through the Ed25519-signed ACDS relay, then exchange ACIP
    packets directly over the encrypted UDP channel (the full
    webrtc+signaling seat: net/webrtc.py + apps/discovery.p2p_connect)."""
    from asciichat_tpu.apps.acds import AcdsServer
    from asciichat_tpu.apps.discovery import DiscoverySession
    from asciichat_tpu.net.transport import serve_tcp

    async def run():
        acds = AcdsServer("127.0.0.1", 0)
        srv = await serve_tcp(acds._handle, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]
        s1 = DiscoverySession("127.0.0.1", port, participant_id="p2p-a")
        s2 = DiscoverySession("127.0.0.1", port, participant_id="p2p-b")
        await s1.connect()
        await s2.connect()
        session = await s1.create(my_port=15001)
        await s2.join(session)
        events = [asyncio.create_task(s.event_loop()) for s in (s1, s2)]
        try:
            ch_a, ch_b = await asyncio.gather(
                s1.p2p_connect("p2p-b", timeout=15),
                s2.p2p_accept("p2p-a", timeout=15),
            )
            await ch_a.send(pkt.PacketType.TEXT_MESSAGE, b"direct p2p hello")
            ptype, payload = await asyncio.wait_for(ch_b.recv(), 5)
            assert (ptype, payload) == (pkt.PacketType.TEXT_MESSAGE,
                                        b"direct p2p hello")
            await ch_b.send(pkt.PacketType.PONG, b"back at you")
            ptype, payload = await asyncio.wait_for(ch_a.recv(), 5)
            assert payload == b"back at you"
        finally:
            for e in events:
                e.cancel()
            await s1.leave()
            await s2.leave()
            srv.close()

    asyncio.run(asyncio.wait_for(run(), 60))


def test_srflx_gathering_against_stun_server():
    """Server-reflexive candidate gathering (RFC 8445 §5.1.1) against an
    in-process STUN server built on the same net/stun.py messages."""

    async def run():
        from asciichat_tpu.net.webrtc import IceLiteAgent

        # in-process STUN server on UDP
        class StunServer(asyncio.DatagramProtocol):
            def connection_made(self, transport):
                self.transport = transport

            def datagram_received(self, data, addr):
                if not stun.is_stun(data):
                    return
                _mt, txid, _attrs = stun.parse(data)
                resp = stun.build(
                    stun.BINDING_SUCCESS, txid,
                    [(stun.ATTR_XOR_MAPPED_ADDRESS,
                      stun.xor_mapped_address(("203.0.113.5", 61000)))],
                )
                self.transport.sendto(resp, addr)

        loop = asyncio.get_running_loop()
        st_transport, _ = await loop.create_datagram_endpoint(
            StunServer, local_addr=("127.0.0.1", 0))
        st_port = st_transport.get_extra_info("sockname")[1]

        agent = IceLiteAgent(controlling=True)
        await agent.start("127.0.0.1")
        try:
            cand = await agent.gather_srflx(("127.0.0.1", st_port), timeout=3)
            assert cand == {"ip": "203.0.113.5", "port": 61000, "type": "srflx"}
            assert any(c.get("type") == "srflx"
                       for c in agent.local_description()["candidates"])
            # non-answering server -> None, not an exception
            dead = await agent.gather_srflx(("127.0.0.1", 1), timeout=0.6)
            assert dead is None
        finally:
            agent.close()
            st_transport.close()

    asyncio.run(asyncio.wait_for(run(), 30))


def test_p2p_relay_fallback_behind_symmetric_nat(monkeypatch):
    """TURN-role last rung of the connect ladder (parallel_connect.c:1-321):
    a fake symmetric NAT eats EVERY direct UDP datagram both ways, so ICE
    connectivity checks cannot succeed; the channel must fall back to
    relaying its end-to-end-encrypted segments through the ACDS
    (ACIP_WEBRTC_RELAY) and still deliver ACIP packets both directions,
    including multi-segment reassembly."""
    from asciichat_tpu.apps.acds import AcdsServer
    from asciichat_tpu.apps.discovery import DiscoverySession
    from asciichat_tpu.net.transport import serve_tcp
    from asciichat_tpu.net.webrtc import IceLiteAgent

    orig_start = IceLiteAgent.start

    async def natted_start(self, bind="0.0.0.0", port=0):
        await orig_start(self, bind, port)
        real = self.transport

        class BlackholeNat:
            """Symmetric NAT with no mapping: every outbound UDP datagram
            (STUN checks AND data) is dropped before it leaves."""

            def sendto(self, data, addr=None):
                pass

            def get_extra_info(self, key, default=None):
                return real.get_extra_info(key, default)

            def close(self):
                real.close()

        self.transport = BlackholeNat()

    monkeypatch.setattr(IceLiteAgent, "start", natted_start)

    async def run():
        acds = AcdsServer("127.0.0.1", 0)
        srv = await serve_tcp(acds._handle, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]
        s1 = DiscoverySession("127.0.0.1", port, participant_id="nat-a")
        s2 = DiscoverySession("127.0.0.1", port, participant_id="nat-b")
        await s1.connect()
        await s2.connect()
        session = await s1.create(my_port=15003)
        await s2.join(session)
        events = [asyncio.create_task(s.event_loop()) for s in (s1, s2)]
        try:
            ch_a, ch_b = await asyncio.gather(
                s1.p2p_connect("nat-b", timeout=20, ice_timeout=1.0),
                s2.p2p_accept("nat-a", timeout=20),
            )
            assert ch_a.via_relay and ch_b.via_relay
            await ch_a.send(pkt.PacketType.TEXT_MESSAGE, b"hello via relay")
            ptype, payload = await asyncio.wait_for(ch_b.recv(), 5)
            assert (ptype, payload) == (pkt.PacketType.TEXT_MESSAGE,
                                        b"hello via relay")
            # multi-segment payload (> SEGMENT_SIZE) reassembles through the
            # relay's per-segment JSON envelopes
            big = bytes(range(256)) * 20  # 5120 B > 4 segments
            await ch_b.send(pkt.PacketType.ASCII_FRAME, big)
            ptype, payload = await asyncio.wait_for(ch_a.recv(), 10)
            assert ptype == pkt.PacketType.ASCII_FRAME and payload == big
        finally:
            for e in events:
                e.cancel()
            await s1.leave()
            await s2.leave()
            srv.close()

    asyncio.run(asyncio.wait_for(run(), 60))


def test_p2p_relay_fallback_one_way_udp(monkeypatch):
    """Asymmetric NAT: the initiator's STUN requests REACH the responder (so
    the responder nominates a direct pair) but every responder->initiator
    datagram is eaten, so the initiator's ICE fails and falls back. The
    responder must follow: its already-nominated channel is REBOUND to the
    relay carrier (same object the app may hold), and traffic flows both
    ways — no transport split-brain."""
    from asciichat_tpu.apps.acds import AcdsServer
    from asciichat_tpu.apps.discovery import DiscoverySession
    from asciichat_tpu.net.transport import serve_tcp
    from asciichat_tpu.net.webrtc import IceLiteAgent

    orig_start = IceLiteAgent.start

    async def natted_start(self, bind="0.0.0.0", port=0):
        await orig_start(self, bind, port)
        if self.controlling:
            return  # initiator's outbound works
        real = self.transport

        class OneWayNat:  # responder: outbound blocked, inbound untouched
            def sendto(self, data, addr=None):
                pass

            def get_extra_info(self, key, default=None):
                return real.get_extra_info(key, default)

            def close(self):
                real.close()

        self.transport = OneWayNat()

    monkeypatch.setattr(IceLiteAgent, "start", natted_start)

    async def run():
        acds = AcdsServer("127.0.0.1", 0)
        srv = await serve_tcp(acds._handle, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]
        s1 = DiscoverySession("127.0.0.1", port, participant_id="ow-a")
        s2 = DiscoverySession("127.0.0.1", port, participant_id="ow-b")
        await s1.connect()
        await s2.connect()
        session = await s1.create(my_port=15004)
        await s2.join(session)
        events = [asyncio.create_task(s.event_loop()) for s in (s1, s2)]
        try:
            ch_a, ch_b = await asyncio.gather(
                s1.p2p_connect("ow-b", timeout=20, ice_timeout=1.0),
                s2.p2p_accept("ow-a", timeout=20),
            )
            # responder may have returned the direct-nominated channel
            # before the relay-req arrived; the rebind must make THAT SAME
            # object relay-backed
            assert ch_a.via_relay
            for _ in range(100):
                if ch_b.via_relay:
                    break
                await asyncio.sleep(0.05)
            assert ch_b.via_relay, "responder channel was not rebound to relay"
            await ch_b.send(pkt.PacketType.TEXT_MESSAGE, b"responder speaks")
            ptype, payload = await asyncio.wait_for(ch_a.recv(), 5)
            assert payload == b"responder speaks"
            await ch_a.send(pkt.PacketType.PONG, b"initiator answers")
            ptype, payload = await asyncio.wait_for(ch_b.recv(), 5)
            assert payload == b"initiator answers"
        finally:
            for e in events:
                e.cancel()
            await s1.leave()
            await s2.leave()
            srv.close()

    asyncio.run(asyncio.wait_for(run(), 60))


def test_relay_budget_throttles_flood(monkeypatch):
    """The ACDS's TURN-role relay enforces a per-sender byte budget: an
    over-budget flood is dropped at the relay (the rendezvous host is not a
    free amplifier) while the in-budget channel keeps working; Go-Back-N
    retransmission absorbs the drops. Pins the secretbox channel: the test
    is about the ARQ-vs-budget interplay, and SCTP's standards-mandated
    RTO backoff makes a starved flood take minutes instead of seconds."""
    from asciichat_tpu.net import webrtc as webrtc_mod

    monkeypatch.setattr(webrtc_mod, "DTLS_DEFAULT", False)
    from asciichat_tpu.apps.acds import AcdsServer, _RelayBudget
    from asciichat_tpu.apps.discovery import DiscoverySession
    from asciichat_tpu.net.transport import serve_tcp
    from asciichat_tpu.net.webrtc import IceLiteAgent

    # unit: bucket semantics
    b = _RelayBudget(rate_bps=1000, burst_bytes=2000)
    assert b.allow("p", 1500)
    assert not b.allow("p", 1500)  # burst exhausted
    import time as _t

    _t.sleep(0.6)
    assert b.allow("p", 400)  # refilled ~600 tokens
    assert b.allow("q", 1500)  # budgets are per-sender

    orig_start = IceLiteAgent.start

    async def natted_start(self, bind="0.0.0.0", port=0):
        await orig_start(self, bind, port)
        real = self.transport

        class Blackhole:
            def sendto(self, data, addr=None):
                pass

            def get_extra_info(self, key, default=None):
                return real.get_extra_info(key, default)

            def close(self):
                real.close()

        self.transport = Blackhole()

    async def run():
        import unittest.mock as mock

        with mock.patch.object(IceLiteAgent, "start", natted_start):
            # tight budget: ~40 segments/s refill, small burst
            acds = AcdsServer("127.0.0.1", 0, relay_rate_bps=64_000)
            srv = await serve_tcp(acds._handle, "127.0.0.1", 0)
            port = srv.sockets[0].getsockname()[1]
            s1 = DiscoverySession("127.0.0.1", port, participant_id="fl-a")
            s2 = DiscoverySession("127.0.0.1", port, participant_id="fl-b")
            await s1.connect()
            await s2.connect()
            session = await s1.create(my_port=15005)
            await s2.join(session)
            events = [asyncio.create_task(s.event_loop()) for s in (s1, s2)]
            try:
                ch_a, ch_b = await asyncio.gather(
                    s1.p2p_connect("fl-b", timeout=20, ice_timeout=0.5),
                    s2.p2p_accept("fl-a", timeout=20),
                )
                assert ch_a.via_relay
                # flood well past the burst: sends must still complete
                # (ARQ absorbs relay drops) and data must arrive intact
                blob = bytes(range(256)) * 64  # 16 KB
                for i in range(12):  # ~200 KB >> 64 KB/s budget
                    await asyncio.wait_for(
                        ch_a.send(pkt.PacketType.ASCII_FRAME, blob), 30)
                got = 0
                while got < 12:
                    ptype, payload = await asyncio.wait_for(ch_b.recv(), 30)
                    assert payload == blob
                    got += 1
                assert acds.relay_dropped > 0, "flood never hit the budget"
                assert ch_a.retransmits > 0
            finally:
                for e in events:
                    e.cancel()
                await s1.leave()
                await s2.leave()
                srv.close()

    asyncio.run(asyncio.wait_for(run(), 120))


async def _connected_pair(**kw):
    from tests.test_webrtc import _mk_agents  # self-import safe under pytest

    a, b = _mk_agents(**kw)
    await a.start("127.0.0.1")
    await b.start("127.0.0.1")
    b.set_remote(a.local_description())
    a.set_remote(b.local_description())
    ch_a = await a.wait_connected(10)
    ch_b = await b.wait_connected(10)
    return a, b, ch_a, ch_b


def test_p2p_retransmit_not_starved_by_continuous_sends():
    """The T3 twin of the duplex-acks regression: the retransmit timer must
    track the EARLIEST OUTSTANDING segment, not the last data send — under
    a continuous small-packet send cadence (< RTO/2), a lost head segment
    previously retransmitted only after the window filled seconds later."""

    async def run():
        a, b, ch_a, ch_b = await _connected_pair(dtls=False)
        try:
            dropped = []
            real = a.transport.sendto

            def drop_first_data(data, addr):
                # first non-STUN datagram (the head DATA segment) is lost
                if not dropped and not stun.is_stun(data):
                    dropped.append(True)
                    return
                real(data, addr)

            a.transport.sendto = drop_first_data
            ch_a.send_nowait(pkt.PacketType.PING, b"head")

            # keep sending on a sub-RTO cadence the whole time: the old
            # last-data-send timer never expires under this traffic
            stop = asyncio.Event()

            async def ticker():
                while not stop.is_set():
                    ch_a.send_nowait(pkt.PacketType.PING, b"tick")
                    await asyncio.sleep(0.01)

            t = asyncio.create_task(ticker())
            try:
                ptype, payload = await asyncio.wait_for(ch_b.recv(), 2.5)
                assert payload == b"head"  # ordered stream: head first
                assert ch_a.retransmits > 0
            finally:
                stop.set()
                t.cancel()
        finally:
            a.close()
            b.close()

    asyncio.run(asyncio.wait_for(run(), 30))


def test_p2p_concurrent_sends_do_not_interleave():
    """send() must serialize whole packets: a window-full await yields
    mid-packet, and an unserialized concurrent send could splice its bytes
    into the middle of another packet (receiver CRC mismatch)."""

    async def run():
        a, b, ch_a, ch_b = await _connected_pair(dtls=False)
        try:
            blobs = [bytes([i]) * 120_000 for i in range(3)]  # each > window
            await asyncio.gather(*[
                ch_a.send(pkt.PacketType.IMAGE_FRAME, bl) for bl in blobs])
            got = []
            for _ in blobs:
                _, payload = await asyncio.wait_for(ch_b.recv(), 30)
                got.append(payload)
            assert sorted(got) == sorted(blobs)
        finally:
            a.close()
            b.close()

    asyncio.run(asyncio.wait_for(run(), 60))


def test_p2p_offsets_survive_4gib(monkeypatch):
    """Byte offsets are u64 on the wire: a u32 header dies with struct.error
    once a long session crosses 4 GiB. Simulated by pre-aligning both ends'
    stream offsets past 2^32."""

    async def run():
        a, b, ch_a, ch_b = await _connected_pair(dtls=False)
        try:
            far = (1 << 33) + 12345
            ch_a.snd_base = ch_a.snd_next = far
            ch_b.rcv_next = far
            # and the reverse direction (acks ride data segments)
            ch_b.snd_base = ch_b.snd_next = far
            ch_a.rcv_next = far
            blob = os.urandom(5000)
            await ch_a.send(pkt.PacketType.IMAGE_FRAME, blob)
            _, payload = await asyncio.wait_for(ch_b.recv(), 10)
            assert payload == blob
        finally:
            a.close()
            b.close()

    asyncio.run(asyncio.wait_for(run(), 30))


def test_p2p_close_unblocks_recv_and_send():
    """close() must wake a parked recv() (ConnectionError) and stop a
    window-full send() — previously both waited forever."""

    async def run():
        a, b, ch_a, ch_b = await _connected_pair(dtls=False)
        try:
            recv_task = asyncio.create_task(ch_b.recv())
            await asyncio.sleep(0.05)
            # jam a's window so its send() parks in the window-full loop
            a.transport.sendto = lambda data, addr: None  # acks never return
            send_task = asyncio.create_task(
                ch_a.send(pkt.PacketType.IMAGE_FRAME, b"x" * 200_000))
            await asyncio.sleep(0.1)
            ch_b.close()
            ch_a.close()
            with pytest.raises(ConnectionError):
                await asyncio.wait_for(recv_task, 5)
            with pytest.raises(ConnectionError):
                await asyncio.wait_for(send_task, 5)
        finally:
            a.close()
            b.close()

    asyncio.run(asyncio.wait_for(run(), 30))


def test_p2p_send_nowait_threadsafe():
    """send_nowait from an executor thread must marshal to the loop (its
    DTLS twin documents the same contract) — not crash on
    get_running_loop() in a loop-less thread."""

    async def run():
        a, b, ch_a, ch_b = await _connected_pair(dtls=False)
        try:
            import threading

            ok = []

            def from_thread():
                ok.append(ch_a.send_nowait(pkt.PacketType.PING, b"from-thread"))

            th = threading.Thread(target=from_thread)
            th.start()
            th.join()
            assert ok == [True]
            _, payload = await asyncio.wait_for(ch_b.recv(), 10)
            assert payload == b"from-thread"
        finally:
            a.close()
            b.close()

    asyncio.run(asyncio.wait_for(run(), 30))


def test_p2p_receiver_backpressure_bounds_buffer():
    """A slow application must stall the SENDER, not grow _rcv_buf without
    bound: past RCV_BUF_CAP, in-order data is refused (and not acked) until
    recv() drains."""

    async def run():
        a, b, ch_a, ch_b = await _connected_pair(dtls=False)
        try:
            ch_b.RCV_BUF_CAP = 2400  # instance override for the test
            send_task = asyncio.create_task(
                ch_a.send(pkt.PacketType.IMAGE_FRAME, b"y" * 50_000))
            await asyncio.sleep(0.8)
            # buffer refused growth beyond cap (+1 in-flight segment slack
            # and the bounded _ooo drain overshoot)
            assert len(ch_b._rcv_buf) <= 2400 + 1200
            assert ch_a.snd_base < ch_a.snd_next  # sender actually stalled
            del ch_b.RCV_BUF_CAP  # restore class cap: flow resumes via retx
            await asyncio.wait_for(send_task, 30)
            _, payload = await asyncio.wait_for(ch_b.recv(), 30)
            assert payload == b"y" * 50_000
        finally:
            a.close()
            b.close()

    asyncio.run(asyncio.wait_for(run(), 60))


def test_ice_controlled_nomination_requires_use_candidate():
    """RFC 8445 §7.3.1.5: the controlled/lite side nominates only on a
    USE-CANDIDATE request — an ordinary connectivity check (a full agent
    probing pairs) must NOT pin the pair; and a later USE-CANDIDATE from a
    NEW source moves the nomination (controlling agent re-nominated)."""

    async def run():
        from asciichat_tpu.net.webrtc import IceLiteAgent

        b = IceLiteAgent(controlling=False, dtls=False)
        await b.start("127.0.0.1")
        try:
            # minimal remote description (no checks started: b is lite)
            a_probe = IceLiteAgent(controlling=True, dtls=False)
            b.set_remote({"ufrag": a_probe.ufrag, "pwd": a_probe.pwd,
                          "pubkey": a_probe.crypto.public_key.hex(),
                          "candidates": []})
            username = f"{b.ufrag}:{a_probe.ufrag}"

            # ordinary check (ICE-CONTROLLED role attr → no USE-CANDIDATE)
            txid = stun.new_transaction_id()
            probe = stun.make_binding_request(txid, username,
                                              b.pwd.encode(),
                                              controlling=False)
            b._on_stun(probe, ("127.0.0.1", 50001))
            assert b.peer_addr is None  # not nominated

            # nominating check (USE-CANDIDATE)
            txid = stun.new_transaction_id()
            nom = stun.make_binding_request(txid, username, b.pwd.encode(),
                                            controlling=True)
            b._on_stun(nom, ("127.0.0.1", 50002))
            assert b.peer_addr[:2] == ("127.0.0.1", 50002)

            # controlling agent moves the nomination: channel follows
            txid = stun.new_transaction_id()
            nom2 = stun.make_binding_request(txid, username, b.pwd.encode(),
                                             controlling=True)
            b._on_stun(nom2, ("127.0.0.1", 50003))
            assert b.peer_addr[:2] == ("127.0.0.1", 50003)
            assert b.renominations == 1
            assert b.channel.peer[:2] == ("127.0.0.1", 50003)
        finally:
            b.close()

    asyncio.run(asyncio.wait_for(run(), 30))


def test_ice_prflx_candidate_list_bounded():
    """A port-churning NAT (many authenticated sources) must not grow the
    candidate list unboundedly — prflx entries are evicted oldest-first,
    advertised candidates never."""

    async def run():
        from asciichat_tpu.net.webrtc import IceLiteAgent

        b = IceLiteAgent(controlling=False, dtls=False)
        await b.start("127.0.0.1")
        try:
            a_probe = IceLiteAgent(controlling=True, dtls=False)
            adv = [{"ip": "10.0.0.1", "port": 1000}]
            b.set_remote({"ufrag": a_probe.ufrag, "pwd": a_probe.pwd,
                          "pubkey": a_probe.crypto.public_key.hex(),
                          "candidates": list(adv)})
            username = f"{b.ufrag}:{a_probe.ufrag}"
            for port in range(40000, 40100):
                txid = stun.new_transaction_id()
                req = stun.make_binding_request(txid, username,
                                                b.pwd.encode(),
                                                controlling=True)
                b._on_stun(req, ("127.0.0.1", port))
            cands = b.remote["candidates"]
            assert len(cands) <= 25
            assert {"ip": "10.0.0.1", "port": 1000} in [
                {"ip": c["ip"], "port": c["port"]} for c in cands]
        finally:
            b.close()

    asyncio.run(asyncio.wait_for(run(), 30))
