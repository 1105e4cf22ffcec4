"""DTLS 1.2 + SCTP + DCEP DataChannel stack (browser-grade WebRTC transport;
lib/network/webrtc/ + libdatachannel role).

The DTLS layer is interop-tested against the INDEPENDENT openssl CLI
implementation (s_server/s_client over real UDP), the equivalence-gate
pattern of tests/test_reference_c.py: our sans-io endpoint must complete
handshakes and move data against code we didn't write.
"""

import asyncio
import os
import random
import shutil
import socket
import struct
import subprocess
import time

import pytest

from asciichat_tpu.net import dtls as dtls_mod
from asciichat_tpu.net import sctp as sctp_mod
from asciichat_tpu.net.dtls import DtlsEndpoint, DtlsIdentity
from asciichat_tpu.net.sctp import SctpAssociation

pytestmark = pytest.mark.skipif(
    not dtls_mod.available(), reason="OpenSSL 3 shared libraries not present"
)


@pytest.fixture(scope="module")
def identities():
    return DtlsIdentity.generate("peer-a"), DtlsIdentity.generate("peer-b")


# --- DTLS --------------------------------------------------------------------


def _pump_dtls(a, b, loss=0.0, rng=None, rounds=50):
    rng = rng or random.Random(0)
    for _ in range(rounds):
        moved = False
        for dg in a.outgoing():
            moved = True
            if rng.random() >= loss:
                b.incoming(dg)
                b.read()  # a completed endpoint answers retransmitted
                #           flights inside SSL_read (on_datagram does this)
        for dg in b.outgoing():
            moved = True
            if rng.random() >= loss:
                a.incoming(dg)
                a.read()
        if a.handshake_complete and b.handshake_complete:
            return True
        if not moved:
            # datagrams lost: DTLS retransmission is wall-clock-timer
            # driven (150 ms initial via DTLS_set_timer_cb), so wait for
            # the flight timer before poking it
            time.sleep(0.05)
            a.handle_timeout()
            b.handle_timeout()
    return a.handshake_complete and b.handshake_complete


def test_dtls_handshake_and_data(identities):
    ida, idb = identities
    a = DtlsEndpoint(ida, server=False)
    b = DtlsEndpoint(idb, server=True)
    a.start()
    b.start()
    assert _pump_dtls(a, b)
    # fingerprint pinning material matches the actual certificates
    assert a.peer_fingerprint == idb.fingerprint
    assert b.peer_fingerprint == ida.fingerprint
    assert len(ida.fingerprint.split(":")) == 32  # SHA-256, RFC 8122 format
    a.write(b"hello dtls")
    for dg in a.outgoing():
        b.incoming(dg)
    assert b.read() == [b"hello dtls"]
    b.write(b"x" * 1000)  # near-MTU record
    for dg in b.outgoing():
        a.incoming(dg)
    assert a.read() == [b"x" * 1000]


def test_dtls_handshake_survives_packet_loss(identities):
    """DTLS retransmits lost flights on its own timers (RFC 6347 §4.2.4)."""
    ida, idb = identities
    a = DtlsEndpoint(ida, server=False)
    b = DtlsEndpoint(idb, server=True)
    a.start()
    b.start()
    assert _pump_dtls(a, b, loss=0.3, rng=random.Random(42), rounds=600)


def test_dtls_record_datagram_packing(identities):
    """Outgoing datagrams respect the MTU and never split a record: every
    datagram must parse as a whole number of DTLS records."""
    ida, idb = identities
    a = DtlsEndpoint(ida, server=False, mtu=700)
    a.start()
    for dg in a.outgoing():
        assert len(dg) <= 700
        at = 0
        while at < len(dg):
            assert dg[at] in range(20, 64)  # DTLS content types (RFC 7983)
            rec_len = 13 + int.from_bytes(dg[at + 11 : at + 13], "big")
            at += rec_len
        assert at == len(dg)


@pytest.mark.skipif(shutil.which("openssl") is None, reason="no openssl CLI")
def test_dtls_interop_client_vs_openssl_s_server(identities, tmp_path):
    """Our DTLS CLIENT against the independent openssl s_server binary."""
    srv_id = DtlsIdentity.generate("cli-server")
    cert, key = tmp_path / "c.pem", tmp_path / "k.pem"
    cert.write_bytes(srv_id.cert_pem)
    key.write_bytes(srv_id.key_pem)
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    proc = subprocess.Popen(
        ["stdbuf", "-o0", "openssl", "s_server", "-dtls1_2", "-accept",
         str(port), "-cert", str(cert), "-key", str(key), "-verify", "1",
         "-quiet"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL)
    try:
        time.sleep(0.8)
        cli = DtlsEndpoint(identities[0], server=False)
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        sock.connect(("127.0.0.1", port))
        sock.settimeout(1.0)
        cli.start()
        deadline = time.time() + 10
        while not cli.handshake_complete and time.time() < deadline:
            for dg in cli.outgoing():
                sock.send(dg)
            try:
                cli.incoming(sock.recv(4096))
            except socket.timeout:
                cli.handle_timeout()
        assert cli.handshake_complete
        # the certificate openssl served is the one we fingerprinted
        assert cli.peer_fingerprint == srv_id.fingerprint
        # openssl -> us: s_server relays its stdin over DTLS
        proc.stdin.write(b"echo-from-openssl\n")
        proc.stdin.flush()
        msgs = []
        t0 = time.time()
        while time.time() - t0 < 8 and not msgs:
            try:
                cli.incoming(sock.recv(4096))
                msgs += cli.read()
            except socket.timeout:
                pass
        assert msgs and msgs[0] == b"echo-from-openssl\n"
        # us -> openssl: s_server prints received data to stdout; poll it
        # non-blocking, resending (DTLS app data is datagram, not reliable)
        os.set_blocking(proc.stdout.fileno(), False)
        seen = b""
        t0 = time.time()
        while time.time() - t0 < 8 and b"ping-from-asciichat" not in seen:
            cli.write(b"ping-from-asciichat\n")
            for dg in cli.outgoing():
                sock.send(dg)
            time.sleep(0.3)
            try:
                seen += proc.stdout.read() or b""
            except (BlockingIOError, TypeError):
                pass
        assert b"ping-from-asciichat" in seen
    finally:
        proc.terminate()
        try:
            proc.communicate(timeout=5)
        except Exception:
            proc.kill()


@pytest.mark.skipif(shutil.which("openssl") is None, reason="no openssl CLI")
def test_dtls_interop_server_vs_openssl_s_client(identities, tmp_path):
    """Our DTLS SERVER against the independent openssl s_client binary."""
    cli_id = DtlsIdentity.generate("cli-client")
    cert, key = tmp_path / "c.pem", tmp_path / "k.pem"
    cert.write_bytes(cli_id.cert_pem)
    key.write_bytes(cli_id.key_pem)
    srv = DtlsEndpoint(identities[1], server=True)
    srv.start()
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))
    sock.settimeout(1.0)
    port = sock.getsockname()[1]
    proc = subprocess.Popen(
        ["openssl", "s_client", "-dtls1_2", "-connect", f"127.0.0.1:{port}",
         "-cert", str(cert), "-key", str(key), "-quiet"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL)
    try:
        peer = None
        deadline = time.time() + 10
        msgs = []
        while time.time() < deadline and not srv.handshake_complete:
            try:
                data, peer = sock.recvfrom(4096)
                srv.incoming(data)
            except socket.timeout:
                srv.handle_timeout()
            for dg in srv.outgoing():
                if peer:
                    sock.sendto(dg, peer)
        assert srv.handshake_complete
        assert srv.peer_fingerprint == cli_id.fingerprint
        proc.stdin.write(b"hello-from-openssl-client\n")
        proc.stdin.flush()
        t0 = time.time()
        while time.time() - t0 < 5 and not msgs:
            try:
                data, peer = sock.recvfrom(4096)
                srv.incoming(data)
                msgs += srv.read()
            except socket.timeout:
                pass
        assert msgs and msgs[0] == b"hello-from-openssl-client\n"
        srv.write(b"reply-from-asciichat\n")
        for dg in srv.outgoing():
            sock.sendto(dg, peer)
        time.sleep(0.5)
    finally:
        proc.terminate()
        out = proc.communicate(timeout=5)[0]
    assert b"reply-from-asciichat" in out


# --- SCTP --------------------------------------------------------------------


def test_sctp_packet_codec_checksum():
    """CRC32c over the zero-checksum packet, stored little-endian (RFC 9260
    Appendix B) — the classic interop trap, asserted explicitly."""
    from asciichat_tpu.net.packet import crc32c

    chunks = sctp_mod._chunk(sctp_mod.CT_HEARTBEAT, 0, b"\x00\x01\x00\x08beat")
    p = sctp_mod.pack_packet(5000, 5001, 0xDEADBEEF, chunks)
    src, dst, vtag, parsed = sctp_mod.unpack_packet(p)
    assert (src, dst, vtag) == (5000, 5001, 0xDEADBEEF)
    assert parsed == [(sctp_mod.CT_HEARTBEAT, 0, b"\x00\x01\x00\x08beat")]
    want = crc32c(p[:8] + b"\0\0\0\0" + p[12:])
    assert p[8:12] == struct.pack("<I", want)  # little-endian on the wire
    # corruption must be caught
    bad = bytearray(p)
    bad[14] ^= 0x40
    with pytest.raises(ValueError):
        sctp_mod.unpack_packet(bytes(bad))


def _mk_pair(now):
    qa, qb = [], []
    a = SctpAssociation(qb.append, client=True, now_fn=lambda: now[0])
    b = SctpAssociation(qa.append, client=False, now_fn=lambda: now[0])
    return a, b, qa, qb


def _pump_sctp(a, b, qa, qb, now, loss=0.0, iters=400, rng=None):
    rng = rng or random.Random(3)
    for _ in range(iters):
        while qb:
            p = qb.pop(0)
            if rng.random() >= loss:
                b.on_packet(p)
        while qa:
            p = qa.pop(0)
            if rng.random() >= loss:
                a.on_packet(p)
        now[0] += 0.1
        a.tick()
        b.tick()
        if (not qa and not qb and not a._outstanding and not b._outstanding
                and not a._send_queue and not b._send_queue
                and a._hs_chunk is None and b._hs_chunk is None):
            return


def test_sctp_handshake_and_ordered_delivery_under_loss():
    now = [0.0]
    a, b, qa, qb = _mk_pair(now)
    got_a, got_b = [], []
    a.on_message = lambda s, p, d: got_a.append(d)
    b.on_message = lambda s, p, d: got_b.append(d)
    a.connect()
    _pump_sctp(a, b, qa, qb, now)
    assert a.state == "established" and b.state == "established"

    big = random.Random(1).randbytes(50_000)  # fragments across ~46 chunks
    a.send(0, sctp_mod.PPID_BINARY, big)
    for i in range(40):
        a.send(0, sctp_mod.PPID_BINARY, b"m%03d" % i)
    b.send(0, sctp_mod.PPID_BINARY, b"from-server")
    _pump_sctp(a, b, qa, qb, now, loss=0.2, iters=4000,
               rng=random.Random(99))
    assert got_b == [big] + [b"m%03d" % i for i in range(40)]
    assert got_a == [b"from-server"]

    a.shutdown()
    _pump_sctp(a, b, qa, qb, now)
    assert a.state == "done" and b.state == "done"


def test_sctp_dcep_open_ack():
    now = [0.0]
    a, b, qa, qb = _mk_pair(now)
    opened, acked = [], []
    b.on_channel_open = lambda sid, label: opened.append((sid, label))
    a.on_channel_acked = acked.append
    a.connect()
    _pump_sctp(a, b, qa, qb, now)
    sid = a.open_channel(label="acip")
    assert sid == 0  # DTLS-client parity rule (RFC 8832 §6)
    _pump_sctp(a, b, qa, qb, now)
    assert opened == [(0, "acip")] and acked == [0]
    assert a.channel_acked(0)


def test_sctp_unordered_and_unknown_chunk_rules():
    now = [0.0]
    a, b, qa, qb = _mk_pair(now)
    got = []
    b.on_message = lambda s, p, d: got.append(d)
    a.connect()
    _pump_sctp(a, b, qa, qb, now)
    # unknown chunk with high bits 10 (0x80): skipped, packet continues —
    # bundle [unknown, DATA] must still deliver the DATA
    data_chunk = sctp_mod._chunk(
        sctp_mod.CT_DATA, sctp_mod.F_BEGIN | sctp_mod.F_END | sctp_mod.F_UNORDERED,
        sctp_mod._DATA_HDR.pack(a.my_tsn, 0, 0, 53) + b"after-unknown")
    a.my_tsn = sctp_mod._u32(a.my_tsn + 1)
    unknown = sctp_mod._chunk(0x80 | 0x3F, 0, b"future-extension")
    b.on_packet(sctp_mod.pack_packet(5000, 5000, b.my_vtag,
                                     unknown + data_chunk))
    assert got == [b"after-unknown"]
    # unknown chunk with high bits 00: stop processing the rest
    data2 = sctp_mod._chunk(
        sctp_mod.CT_DATA, sctp_mod.F_BEGIN | sctp_mod.F_END | sctp_mod.F_UNORDERED,
        sctp_mod._DATA_HDR.pack(a.my_tsn, 0, 0, 53) + b"never-delivered")
    stop = sctp_mod._chunk(0x3F, 0, b"")
    b.on_packet(sctp_mod.pack_packet(5000, 5000, b.my_vtag, stop + data2))
    assert got == [b"after-unknown"]
    # bad verification tag: dropped entirely
    b.on_packet(sctp_mod.pack_packet(5000, 5000, b.my_vtag ^ 1, data_chunk))
    assert got == [b"after-unknown"]


# --- DataChannel over ICE ----------------------------------------------------


def _mk_agents(**kw):
    from asciichat_tpu.net.webrtc import IceLiteAgent

    return (IceLiteAgent(controlling=True, **kw),
            IceLiteAgent(controlling=False, **kw))


def test_datachannel_over_ice_loopback():
    """Full browser-grade stack: ICE nomination -> DTLS handshake with
    fingerprint pinning -> SCTP association -> DCEP -> ACIP packets."""
    from asciichat_tpu.net.datachannel import DataChannelTransport

    async def run():
        a, b = _mk_agents()
        await a.start("127.0.0.1")
        await b.start("127.0.0.1")
        try:
            b.set_remote(a.local_description())
            a.set_remote(b.local_description())
            ch_a = await (await a.wait_connected(10)).wait_ready(10)
            ch_b = await (await b.wait_connected(10)).wait_ready(10)
            assert isinstance(ch_a, DataChannelTransport)
            assert ch_a.dtls.peer_fingerprint == b.dtls_identity.fingerprint
            assert ch_b.dtls.peer_fingerprint == a.dtls_identity.fingerprint
            await ch_a.send(3000, b"frame" * 11000)  # 55 KB ASCII frame
            await ch_b.send(5003, b"pong")
            ptype, payload = await ch_b.recv()
            assert (ptype, len(payload)) == (3000, 55000)
            assert (await ch_a.recv()) == (5003, b"pong")
        finally:
            a.close()
            b.close()

    asyncio.run(run())


def test_datachannel_survives_datagram_loss():
    async def run():
        a, b = _mk_agents()
        await a.start("127.0.0.1")
        await b.start("127.0.0.1")
        rng = random.Random(5)
        for ag in (a, b):
            real = ag.transport.sendto

            def lossy(data, addr, real=real, rng=rng):
                if rng.random() >= 0.15:
                    real(data, addr)

            ag.transport.sendto = lossy
        try:
            b.set_remote(a.local_description())
            a.set_remote(b.local_description())
            ch_a = await (await a.wait_connected(15)).wait_ready(15)
            ch_b = await (await b.wait_connected(15)).wait_ready(15)
            blob = random.Random(2).randbytes(30_000)
            await ch_a.send(3001, blob)
            ptype, payload = await ch_b.recv()
            assert (ptype, payload) == (3001, blob)
        finally:
            a.close()
            b.close()

    asyncio.run(run())


def test_datachannel_fingerprint_mismatch_kills_transport():
    """Signaling says one certificate, the wire presents another: the
    transport must fail closed before any application byte flows."""

    async def run():
        a, b = _mk_agents()
        await a.start("127.0.0.1")
        await b.start("127.0.0.1")
        try:
            desc_a, desc_b = a.local_description(), b.local_description()
            # MITM: attacker swaps the signaled fingerprint for its own;
            # the Ed25519 envelope prevents this in production — this test
            # proves the DTLS layer ALSO catches it (defense in depth)
            tam = dict(desc_b)
            tam["dtls_fp"] = DtlsIdentity.generate("mitm").fingerprint
            b.set_remote(desc_a)
            a.set_remote(tam)
            ch_a = await a.wait_connected(10)
            with pytest.raises((ConnectionError, asyncio.TimeoutError,
                                TimeoutError)):
                await ch_a.wait_ready(5)
            assert ch_a.failed and "fingerprint" in ch_a.failed
        finally:
            a.close()
            b.close()

    asyncio.run(run())


def test_mixed_population_falls_back_to_secretbox():
    """A peer without DTLS (older build / no OpenSSL) still connects: the
    channel type is negotiated per-pair, like the codec negotiation."""
    from asciichat_tpu.net.webrtc import SecureP2PChannel

    async def run():
        a, _ = _mk_agents()  # a advertises DTLS
        from asciichat_tpu.net.webrtc import IceLiteAgent

        b = IceLiteAgent(controlling=False, dtls=False)  # b cannot
        await a.start("127.0.0.1")
        await b.start("127.0.0.1")
        try:
            assert "dtls_fp" not in b.local_description()
            b.set_remote(a.local_description())
            a.set_remote(b.local_description())
            ch_a = await (await a.wait_connected(10)).wait_ready(10)
            ch_b = await (await b.wait_connected(10)).wait_ready(10)
            assert isinstance(ch_a, SecureP2PChannel)
            assert isinstance(ch_b, SecureP2PChannel)
            await ch_a.send(5003, b"legacy-ping")
            assert (await ch_b.recv()) == (5003, b"legacy-ping")
        finally:
            a.close()
            b.close()

    asyncio.run(run())


# --- browser-role e2e: SDP signaling + DataChannel into the live server -----


def test_sdp_roundtrip_and_chrome_style_parse():
    from asciichat_tpu.net import sdp

    desc = {"ufrag": "Xy3k", "pwd": "p" * 22,
            "dtls_fp": ":".join(["AB"] * 32),
            "candidates": [{"ip": "192.168.1.5", "port": 41234},
                           {"ip": "203.0.113.9", "port": 52000,
                            "type": "srflx"}]}
    text = sdp.build(desc, setup="actpass", ice_lite=False)
    info = sdp.parse(text)
    assert (info.ufrag, info.pwd) == ("Xy3k", "p" * 22)
    assert info.fingerprint == desc["dtls_fp"]
    assert info.setup == "actpass" and not info.ice_lite
    assert info.candidates == [
        {"ip": "192.168.1.5", "port": 41234, "type": "host"},
        {"ip": "203.0.113.9", "port": 52000, "type": "srflx"},
    ]
    # a Chrome-style offer (hand-written per RFC 8866/8839/8841 grammar:
    # \r\n lines, media-level ice attrs, mDNS + IPv6 + TCP candidates that
    # must be tolerated-and-skipped, unknown a= lines ignored)
    chrome = (
        "v=0\r\n"
        "o=- 163128102 2 IN IP4 127.0.0.1\r\n"
        "s=-\r\nt=0 0\r\n"
        "a=group:BUNDLE 0\r\n"
        "a=extmap-allow-mixed\r\n"
        "a=msid-semantic: WMS\r\n"
        "m=application 9 UDP/DTLS/SCTP webrtc-datachannel\r\n"
        "c=IN IP4 0.0.0.0\r\n"
        "a=ice-ufrag:x9Qb\r\n"
        "a=ice-pwd:ByT4LqSknZzz0PPalJtOZBuP\r\n"
        "a=ice-options:trickle\r\n"
        "a=fingerprint:sha-256 "
        "7B:8B:F0:65:5F:78:E2:51:3B:AC:6F:F3:3F:46:1B:35:"
        "DC:B8:5F:64:1A:24:C2:43:F0:A1:58:D0:A1:2C:19:08\r\n"
        "a=setup:actpass\r\n"
        "a=mid:0\r\n"
        "a=sctp-port:5000\r\n"
        "a=max-message-size:262144\r\n"
        "a=candidate:2230659787 1 udp 2122260223 "
        "a1b2c3d4-0e1f-4a58-aa2e-123456789abc.local 56143 typ host "
        "generation 0 network-id 1\r\n"
        "a=candidate:3580321214 1 udp 2122194687 10.0.0.17 49203 typ host "
        "generation 0 network-id 2\r\n"
        "a=candidate:1510613869 1 tcp 1518280447 10.0.0.17 9 typ host "
        "tcptype active generation 0 network-id 2\r\n"
        "a=candidate:842163049 1 udp 1686052607 203.0.113.44 49203 "
        "typ srflx raddr 10.0.0.17 rport 49203 generation 0\r\n"
    )
    info = sdp.parse(chrome)
    assert info.ufrag == "x9Qb"
    assert info.pwd == "ByT4LqSknZzz0PPalJtOZBuP"
    assert info.fingerprint.startswith("7B:8B:F0:65")
    assert info.sctp_port == 5000
    # mDNS + TCP candidates skipped; the two resolvable UDP ones kept
    assert info.candidates == [
        {"ip": "10.0.0.17", "port": 49203, "type": "host"},
        {"ip": "203.0.113.44", "port": 49203, "type": "srflx"},
    ]
    d = info.to_desc()
    assert d["dtls_fp"] == info.fingerprint and "pubkey" not in d


async def _http_post(host, port, path, body: bytes,
                     ctype="application/sdp"):
    reader, writer = await asyncio.open_connection(host, port)
    writer.write(
        f"POST {path} HTTP/1.1\r\nHost: {host}:{port}\r\n"
        f"Content-Type: {ctype}\r\nContent-Length: {len(body)}\r\n"
        "\r\n".encode() + body)
    await writer.drain()
    status = await reader.readline()
    headers = {}
    while True:
        line = await reader.readline()
        if line in (b"\r\n", b"\n", b""):
            break
        k, _, v = line.decode().partition(":")
        headers[k.strip().lower()] = v.strip()
    resp = b""
    if "content-length" in headers:
        resp = await reader.readexactly(int(headers["content-length"]))
    writer.close()
    return int(status.split()[1]), resp


def test_browser_role_webrtc_into_live_server():
    """The full browser path into the server: POST an SDP offer to
    /webrtc/offer on the websocket listener, parse the SDP answer, run
    ICE (we play the browser: full/controlling agent) -> DTLS -> SCTP ->
    DCEP, then speak plain ACIP: advertise capabilities, upload one
    IMAGE_FRAME, and receive the rendered ASCII_FRAME — the same handler
    and tick the TCP and WebSocket clients use."""
    import struct as _struct

    import numpy as np

    from asciichat_tpu.apps.server import AsciiChatServer
    from asciichat_tpu.apps.webclient import WebRtcGateway, make_http_handler
    from asciichat_tpu.net import packet as pkt
    from asciichat_tpu.net import sdp
    from asciichat_tpu.net.webrtc import IceLiteAgent
    from asciichat_tpu.net.websocket import serve_ws

    async def run():
        server = AsciiChatServer()
        gw = WebRtcGateway(server._handle_conn)
        assert gw.available()

        def post(path, body):
            if path.split("?", 1)[0] == "/webrtc/offer":
                return gw.on_offer(body)
            return None

        ws_srv = await serve_ws(server._handle_conn, "127.0.0.1", 0,
                                pages=make_http_handler(), post=post)
        port = ws_srv.sockets[0].getsockname()[1]
        tick = asyncio.get_running_loop().create_task(server._tick_loop())
        browser = IceLiteAgent(controlling=True)  # the browser role
        await browser.start("127.0.0.1")
        try:
            # malformed offers are refused without state
            st, _ = await _http_post("127.0.0.1", port, "/webrtc/offer",
                                     b"v=0\r\nnot-a-datachannel-offer\r\n")
            assert st in (400, 404) and not gw._tasks

            offer = sdp.offer_for_agent(browser)
            st, answer = await _http_post("127.0.0.1", port,
                                          "/webrtc/offer", offer.encode())
            assert st == 200
            info = sdp.parse(answer.decode())
            assert info.ice_lite and info.setup == "passive"
            browser.set_remote(info.to_desc())
            ch = await browser.wait_connected(15)
            await ch.wait_ready(15)

            caps = bytearray(168)
            _struct.pack_into(">I", caps, 0, 1)  # bit0: no-compression
            _struct.pack_into(">I", caps, 4, 3)  # truecolor
            _struct.pack_into(">I", caps, 12, 2)
            _struct.pack_into(">H", caps, 16, 60)
            _struct.pack_into(">H", caps, 18, 20)
            caps[159] = 1
            await ch.send(pkt.PacketType.CLIENT_CAPABILITIES, bytes(caps))
            rgb = np.zeros((48, 64, 3), np.uint8)
            rgb[:, :, 0] = 200
            await ch.send(pkt.PacketType.IMAGE_FRAME,
                          pkt.pack_image_frame(rgb.tobytes(), 64, 48, 0))
            deadline = asyncio.get_running_loop().time() + 30
            frame = None
            while asyncio.get_running_loop().time() < deadline:
                ptype, payload = await asyncio.wait_for(ch.recv(), 10)
                if ptype == pkt.PacketType.ASCII_FRAME:
                    frame = payload
                    break
            assert frame is not None, "no ASCII_FRAME over the DataChannel"
            w, h, orig, _comp, _crc, _fl = pkt.ASCII_FRAME_HDR.unpack(
                frame[:24])
            assert orig > 0 and w > 0 and h > 0
        finally:
            tick.cancel()
            browser.close()
            gw.close()
            ws_srv.close()

    asyncio.run(asyncio.wait_for(run(), 120))


# --- adversarial robustness --------------------------------------------------


def test_dtls_survives_garbage_datagrams(identities):
    """Attacker datagrams (random bytes, DTLS-looking first byte, truncated
    records) must be silently discarded — never a fatal error, never a
    wedged channel — when interleaved with reads exactly like the
    production on_datagram path interleaves them (RFC 6347 §4.1.2.7:
    invalid records are dropped)."""
    ida, idb = identities
    a = DtlsEndpoint(ida, server=False)
    b = DtlsEndpoint(idb, server=True)
    a.start()
    b.start()
    rng = random.Random(11)

    def garbage():
        g = bytearray(os.urandom(rng.randint(1, 1400)))
        if rng.random() < 0.5:
            g[0] = rng.randint(20, 63)  # DTLS content-type range
        return bytes(g)

    def deliver(ep, dg):
        ep.incoming(garbage())  # attacker datagram before every real one
        ep.read()
        ep.incoming(dg)
        return ep.read()

    for _ in range(20):
        for dg in a.outgoing():
            deliver(b, dg)
        for dg in b.outgoing():
            deliver(a, dg)
        if a.handshake_complete and b.handshake_complete:
            break
    assert a.handshake_complete and b.handshake_complete
    b.write(b"still-alive")
    got = []
    for dg in b.outgoing():
        got += deliver(a, dg)
    assert got == [b"still-alive"]
    assert not a.closed and not b.closed


def test_sctp_survives_fuzzed_packets():
    """Random garbage, bit-flipped valid packets, and forged-vtag packets
    into on_packet: never an exception, association stays usable."""
    now = [0.0]
    a, b, qa, qb = _mk_pair(now)
    got = []
    b.on_message = lambda s, p, d: got.append(d)
    a.connect()
    _pump_sctp(a, b, qa, qb, now)
    assert b.state == "established"
    rng = random.Random(23)
    a.send(0, sctp_mod.PPID_BINARY, b"before-fuzz")
    valid = list(qb)
    for _ in range(300):
        choice = rng.random()
        if choice < 0.4:
            b.on_packet(os.urandom(rng.randint(0, 200)))
        elif choice < 0.8 and valid:
            mut = bytearray(rng.choice(valid))
            for _ in range(rng.randint(1, 8)):
                mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
            b.on_packet(bytes(mut))
        else:
            # well-formed packet, forged verification tag
            ch = sctp_mod._chunk(sctp_mod.CT_DATA, 3,
                                 sctp_mod._DATA_HDR.pack(1, 0, 0, 53) + b"x")
            b.on_packet(sctp_mod.pack_packet(5000, 5000, b.my_vtag ^ 7, ch))
    _pump_sctp(a, b, qa, qb, now)
    a.send(0, sctp_mod.PPID_BINARY, b"after-fuzz")
    _pump_sctp(a, b, qa, qb, now)
    assert got == [b"before-fuzz", b"after-fuzz"]
    assert b.state == "established"


def test_datachannel_survives_garbage_and_replay():
    """Transport-level: attacker datagrams on the wire (garbage + replays
    of earlier legitimate datagrams) neither kill nor desync the channel."""

    async def run():
        a, b = _mk_agents()
        await a.start("127.0.0.1")
        await b.start("127.0.0.1")
        rng = random.Random(31)
        seen: list[bytes] = []
        for ag in (a, b):
            real = ag.transport.sendto

            def evil(data, addr, real=real):
                seen.append(data)
                if rng.random() < 0.3:  # inject garbage before
                    real(os.urandom(rng.randint(10, 900)), addr)
                real(data, addr)
                if seen and rng.random() < 0.3:  # replay an old datagram
                    real(rng.choice(seen), addr)

            ag.transport.sendto = evil
        try:
            b.set_remote(a.local_description())
            a.set_remote(b.local_description())
            ch_a = await (await a.wait_connected(15)).wait_ready(15)
            ch_b = await (await b.wait_connected(15)).wait_ready(15)
            blob = random.Random(4).randbytes(20_000)
            await ch_a.send(3001, blob)
            await ch_b.send(5003, b"ok")
            assert (await ch_b.recv()) == (3001, blob)
            assert (await ch_a.recv()) == (5003, b"ok")
            assert not ch_a.failed and not ch_b.failed
        finally:
            a.close()
            b.close()

    asyncio.run(asyncio.wait_for(run(), 60))


# --- code-review regression tests -------------------------------------------


def test_sctp_t3_not_starved_by_no_progress_sacks():
    """RFC 9260 §6.3.2 R3: a SACK that does not ack the earliest
    outstanding TSN must NOT restart T3-rtx — otherwise a receiver that
    SACKs every arriving packet (the normal duplex case) postpones
    retransmission of a lost chunk indefinitely (the ack-refresh
    starvation class the secretbox ARQ also had to fix)."""
    now = [0.0]
    a, b, qa, qb = _mk_pair(now)
    a.connect()
    _pump_sctp(a, b, qa, qb, now)
    sent = []
    a._send = sent.append
    a.send(0, sctp_mod.PPID_BINARY, b"lost-chunk")
    assert len(sent) == 1 and a._outstanding
    (lost_tsn,) = list(a._outstanding)
    t3_at_send = a._t3_start
    # stream of no-progress SACKs (stalled cum = lost_tsn-1, gap-acks for
    # later TSNs would be here in the real duplex case), each well inside
    # the RTO window
    for i in range(20):
        now[0] += 0.1  # 0.1 < RTO 0.5
        sack = sctp_mod._chunk(sctp_mod.CT_SACK, 0, sctp_mod._SACK_HDR.pack(
            sctp_mod._u32(lost_tsn - 1), sctp_mod.A_RWND, 0, 0))
        a.on_packet(sctp_mod.pack_packet(5000, 5000, a.my_vtag, sack))
        assert a._t3_start == t3_at_send, "no-progress SACK restarted T3"
        a.tick()
        if len(sent) > 1:
            break
    assert len(sent) > 1, "lost chunk never retransmitted under SACK stream"


def test_sctp_empty_message_roundtrip():
    """send(b'') emits a zero-payload DATA chunk; the receiver must accept
    and deliver it (a rejected-but-sent chunk would stall cum_tsn and
    abort the association after MAX_RETX)."""
    now = [0.0]
    a, b, qa, qb = _mk_pair(now)
    got = []
    b.on_message = lambda s, p, d: got.append((s, p, d))
    a.connect()
    _pump_sctp(a, b, qa, qb, now)
    a.send(0, sctp_mod.PPID_BINARY, b"")
    a.send(0, sctp_mod.PPID_BINARY, b"after-empty")
    _pump_sctp(a, b, qa, qb, now)
    assert got == [(0, 53, b""), (0, 53, b"after-empty")]
    assert b.state == "established" and not a._outstanding


def test_sctp_bundles_fit_dtls_mtu():
    """Bundled SCTP packets must leave room for the ~37-byte DTLS record
    overhead inside the 1200-byte MTU: every emitted packet <= 12 + frag
    + 16 bytes."""
    now = [0.0]
    a, b, qa, qb = _mk_pair(now)
    a.connect()
    _pump_sctp(a, b, qa, qb, now)
    sent = []
    a._send = sent.append
    for i in range(40):  # small messages that bundle + two full-size ones
        a.send(0, sctp_mod.PPID_BINARY, b"m" * 200)
    a.send(0, sctp_mod.PPID_BINARY, b"x" * 5000)
    cap = 12 + a.frag + 16
    assert sent and max(len(p) for p in sent) <= cap
    assert cap + 37 <= 1200  # the DTLS record stays inside the MTU


def test_sdp_answer_echoes_offer_mid():
    """JSEP: the answer's m-section mid must match the offer's or the
    browser rejects setRemoteDescription."""
    from asciichat_tpu.net import sdp

    offer_desc = {"ufrag": "u", "pwd": "p" * 22,
                  "dtls_fp": ":".join(["CD"] * 32), "candidates": []}
    offer = sdp.build(offer_desc, setup="actpass", ice_lite=False,
                      mid="data1")
    info = sdp.parse(offer)
    assert info.mid == "data1"

    class FakeAgent:
        local_port = 1
        def local_description(self):
            return {"ufrag": "v", "pwd": "q" * 22,
                    "dtls_fp": ":".join(["EF"] * 32), "candidates": []}

    answer = sdp.answer_for_agent(FakeAgent(), info)
    assert "a=mid:data1\r\n" in answer
    assert "a=group:BUNDLE data1\r\n" in answer


def test_dtls_identity_cached_per_process():
    """Certificate generation must not run per-agent (event-loop stall /
    unauthenticated-offer DoS): agents share the process identity."""
    from asciichat_tpu.net.webrtc import IceLiteAgent

    async def run():
        a = IceLiteAgent(controlling=True)
        b = IceLiteAgent(controlling=False)
        assert a.dtls_identity is b.dtls_identity
        assert a.dtls_identity is dtls_mod.default_identity()

    asyncio.run(run())


def test_datachannel_bulk_throughput_floor():
    """Congestion-controlled bulk transfer must sustain a video-chat-grade
    rate: >= 30 frames/s of 55 KB ACIP frames over loopback with BOTH
    endpoints sharing this host (measured ~176 fps on the 1-core CI box;
    the floor is 6x slack for load). Guards the fast-retransmit/
    delayed-SACK/cwnd path against quadratic or stall regressions —
    before congestion control this test wedged entirely (socket-buffer
    overflow + 1-chunk-per-backed-off-RTO recovery)."""

    async def run():
        a, b = _mk_agents()
        await a.start("127.0.0.1")
        await b.start("127.0.0.1")
        try:
            b.set_remote(a.local_description())
            a.set_remote(b.local_description())
            ch_a = await (await a.wait_connected(15)).wait_ready(15)
            ch_b = await (await b.wait_connected(15)).wait_ready(15)
            frame = os.urandom(55_000)
            n = 40

            async def producer():
                for _ in range(n):
                    await ch_a.send(3000, frame)

            t0 = time.perf_counter()
            prod = asyncio.create_task(producer())
            for _ in range(n):
                await asyncio.wait_for(ch_b.recv(), 30)
            dt = time.perf_counter() - t0
            await prod
            fps = n / dt
            assert fps >= 30, f"bulk DataChannel throughput {fps:.1f} < 30 fps"
        finally:
            a.close()
            b.close()

    asyncio.run(asyncio.wait_for(run(), 90))


def test_send_nowait_from_executor_thread_is_safe():
    """The server's render/audio ticks call send_nowait from executor
    threads. The SCTP+DTLS stack is loop-affine — an off-loop SSL_write
    racing the loop's SSL_read corrupts OpenSSL cipher state ('Provider
    routines::cipher operation failed', killed 3-client soaks within
    seconds). Off-loop sends must marshal onto the loop."""

    async def run():
        import concurrent.futures

        a, b = _mk_agents()
        await a.start("127.0.0.1")
        await b.start("127.0.0.1")
        try:
            b.set_remote(a.local_description())
            a.set_remote(b.local_description())
            ch_a = await (await a.wait_connected(10)).wait_ready(10)
            ch_b = await (await b.wait_connected(10)).wait_ready(10)
            n_thread = 400
            payload = os.urandom(2000)

            def hammer():  # foreign thread, like _render_tick
                sent = 0
                for _ in range(n_thread):
                    if ch_a.send_nowait(3000, payload):
                        sent += 1
                    time.sleep(0.001)
                return sent

            loop = asyncio.get_running_loop()
            fut = loop.run_in_executor(None, hammer)
            # meanwhile the loop itself runs duplex traffic both ways
            for i in range(200):
                await ch_b.send(5003, b"loop-%d" % i)
                await asyncio.sleep(0.002)
            sent = await fut
            assert sent > 0
            got_a = got_b = 0
            deadline = loop.time() + 30
            while (got_b < sent or got_a < 200) and loop.time() < deadline:
                if got_b < sent:
                    pt, pl = await asyncio.wait_for(ch_b.recv(), 10)
                    if pt == 3000:
                        assert pl == payload
                        got_b += 1
                else:
                    await asyncio.sleep(0.01)  # let the loop deliver to a
                while not ch_a._rx.empty():
                    ch_a._rx.get_nowait()
                    got_a += 1
            assert not ch_a.failed and not ch_b.failed, (ch_a.failed,
                                                        ch_b.failed)
            assert got_b == sent
        finally:
            a.close()
            b.close()

    asyncio.run(asyncio.wait_for(run(), 90))


def test_sctp_shutdown_drains_send_queue():
    """Graceful shutdown must DELIVER everything queued (cwnd starts at 4
    bundles, so most of a large message sits in _send_queue at close time;
    dropping it would truncate the peer's last frame) before SHUTDOWN."""
    now = [0.0]
    a, b, qa, qb = _mk_pair(now)
    got = []
    b.on_message = lambda s, p, d: got.append(d)
    a.connect()
    _pump_sctp(a, b, qa, qb, now)
    big = random.Random(9).randbytes(50_000)
    a.send(0, sctp_mod.PPID_BINARY, big)
    assert a._send_queue  # the initial window can't hold it all
    a.shutdown()
    _pump_sctp(a, b, qa, qb, now)
    assert got == [big]
    assert a.state == "done" and b.state == "done"


def test_sctp_burst_loss_recovers_every_chunk_fast():
    """A burst that loses MANY chunks of one flight (the socket-overflow
    case) must recover ALL of them via repeated fast retransmit rounds —
    the >=3 eligibility keeps budget-deferred chunks retransmittable, and
    cwnd halves only once per loss window."""
    now = [0.0]
    a, b, qa, qb = _mk_pair(now)
    got = []
    b.on_message = lambda s, p, d: got.append(d)
    a.connect()
    _pump_sctp(a, b, qa, qb, now)
    a.cwnd = 64 * a._mtu_budget  # big window so the flight is one burst
    big = random.Random(10).randbytes(40_000)
    a.send(0, sctp_mod.PPID_BINARY, big)
    # first transmission burst: drop packets 2..6 (a contiguous mid-flight
    # hole of ~5 packets), deliver the rest
    burst = list(qb)
    qb.clear()
    for i, p in enumerate(burst):
        if not (2 <= i <= 6):
            b.on_packet(p)
    cwnd_after_first_halving = None
    for _ in range(200):
        while qa:
            a.on_packet(qa.pop(0))
        while qb:
            b.on_packet(qb.pop(0))
        if cwnd_after_first_halving is None and a._fr_exit is not None:
            cwnd_after_first_halving = a.cwnd
        if got:
            break
        now[0] += 0.05
        a.tick()
        b.tick()
    assert got == [big]
    # single halving for the whole loss window
    assert cwnd_after_first_halving is not None
    assert a.cwnd >= cwnd_after_first_halving
    assert now[0] < 3.0, f"recovery took {now[0]:.1f}s virtual time"


def test_sctp_rtt_adaptive_rto():
    """RTO must adapt ABOVE a path RTT larger than RTO_INIT, or every
    burst start would fire a spurious T3 (retransmit + cwnd collapse)."""
    now = [0.0]
    a, b, qa, qb = _mk_pair(now)
    a.connect()
    _pump_sctp(a, b, qa, qb, now)
    rtt = 0.8  # > RTO_INIT (0.5)
    for _ in range(12):
        a.send(0, sctp_mod.PPID_BINARY, b"probe")
        # deliver after the one-way delay; SACK comes back after full RTT
        now[0] += rtt / 2
        while qb:
            b.on_packet(qb.pop(0))
        now[0] += rtt / 2
        while qa:
            a.on_packet(qa.pop(0))
        b.tick()  # flush delayed sack
        while qa:
            a.on_packet(qa.pop(0))
    assert a._srtt is not None and a._srtt > 0.5
    assert a._computed_rto() > rtt, f"rto {a._computed_rto():.2f} <= rtt"


def test_sctp_no_abort_on_first_loss_after_idle():
    """An association idle for >30s must NOT be aborted on its first
    post-idle T3 expiry — arming the timer from idle restarts the
    progress window."""
    now = [0.0]
    a, b, qa, qb = _mk_pair(now)
    got = []
    b.on_message = lambda s, p, d: got.append(d)
    a.connect()
    _pump_sctp(a, b, qa, qb, now)
    now[0] += 120.0  # long idle
    a.tick()
    b.tick()
    a.send(0, sctp_mod.PPID_BINARY, b"after-idle")
    qb.clear()  # that first packet is lost
    for _ in range(40):
        now[0] += 0.25
        a.tick()
        while qb:
            b.on_packet(qb.pop(0))
        while qa:
            a.on_packet(qa.pop(0))
        if got:
            break
    assert a.state == "established", "post-idle loss aborted the association"
    assert got == [b"after-idle"]


def test_native_client_over_webrtc_transport():
    """The PRODUCTION client (apps/client.AsciiChatClient) with
    --webrtc: full SDP signaling + ICE + DTLS + SCTP transport, then the
    normal client session — caps exchange, test-pattern uplink, rendered
    ASCII frames back. src/client/webrtc.c role, e2e."""
    from asciichat_tpu.apps.client import AsciiChatClient
    from asciichat_tpu.apps.server import AsciiChatServer
    from asciichat_tpu.apps.webclient import WebRtcGateway, make_http_handler
    from asciichat_tpu.net import protocol as proto
    from asciichat_tpu.net.websocket import serve_ws
    from asciichat_tpu.render.types import (ColorLevel, RenderMode,
                                            TerminalCapabilities)
    from asciichat_tpu.runtime.framesource import open_source

    async def run():
        server = AsciiChatServer()
        gw = WebRtcGateway(server._handle_conn)

        def post(path, body):
            if path.split("?", 1)[0] == "/webrtc/offer":
                return gw.on_offer(body)
            return None

        ws_srv = await serve_ws(server._handle_conn, "127.0.0.1", 0,
                                pages=make_http_handler(), post=post)
        port = ws_srv.sockets[0].getsockname()[1]
        tick = asyncio.get_running_loop().create_task(server._tick_loop())
        caps = TerminalCapabilities(ColorLevel.TRUECOLOR, RenderMode.FOREGROUND)
        client = AsciiChatClient(
            "127.0.0.1", port, open_source(test_pattern=True),
            proto.WireCapabilities(caps=caps, width=60, height=18),
            reconnect=False, use_webrtc=True,
        )
        try:
            await asyncio.wait_for(client.run(max_frames=5), 90)
        finally:
            tick.cancel()
            gw.close()
            ws_srv.close()
        assert client.frames_received >= 5

    asyncio.run(asyncio.wait_for(run(), 120))


def test_mixed_transport_population():
    """One server tick serving TCP, WebSocket, and WebRTC clients
    SIMULTANEOUSLY (2 of each, production AsciiChatClient): every client
    gets its frames — the transports are interchangeable above the
    dispatcher, which is the whole point of the vtable design
    (acip/transport.h role)."""
    from asciichat_tpu.apps.client import AsciiChatClient
    from asciichat_tpu.apps.server import AsciiChatServer
    from asciichat_tpu.apps.webclient import WebRtcGateway, make_http_handler
    from asciichat_tpu.net import protocol as proto
    from asciichat_tpu.net.transport import serve_tcp
    from asciichat_tpu.net.websocket import serve_ws
    from asciichat_tpu.render.types import (ColorLevel, RenderMode,
                                            TerminalCapabilities)
    from asciichat_tpu.runtime.framesource import open_source

    async def run():
        server = AsciiChatServer()
        gw = WebRtcGateway(server._handle_conn)

        def post(path, body):
            if path.split("?", 1)[0] == "/webrtc/offer":
                return gw.on_offer(body)
            return None

        tcp_srv = await serve_tcp(server._handle_conn, "127.0.0.1", 0)
        tcp_port = tcp_srv.sockets[0].getsockname()[1]
        ws_srv = await serve_ws(server._handle_conn, "127.0.0.1", 0,
                                pages=make_http_handler(), post=post)
        ws_port = ws_srv.sockets[0].getsockname()[1]
        tick = asyncio.get_running_loop().create_task(server._tick_loop())

        async def client(port, **kw):
            caps = TerminalCapabilities(ColorLevel.TRUECOLOR,
                                        RenderMode.HALF_BLOCK)
            c = AsciiChatClient(
                "127.0.0.1", port, open_source(test_pattern=True),
                proto.WireCapabilities(caps=caps, width=50, height=15),
                reconnect=False, **kw)
            await asyncio.wait_for(c.run(max_frames=40), 120)
            return c.frames_received

        try:
            counts = await asyncio.gather(
                client(tcp_port), client(tcp_port),
                client(ws_port, use_ws=True), client(ws_port, use_ws=True),
                client(ws_port, use_webrtc=True),
                client(ws_port, use_webrtc=True),
            )
        finally:
            tick.cancel()
            gw.close()
            ws_srv.close()
            tcp_srv.close()
        assert all(c >= 40 for c in counts), counts

    asyncio.run(asyncio.wait_for(run(), 180))


def test_datachannel_wan_regime_throughput():
    """Simulated WAN (50 ms RTT, 0.1% random loss): the congestion
    machinery (RTT-adaptive RTO, fast retransmit, cwnd growth) must
    deliver Reno-class throughput. Theory (Mathis): ~1.22*MTU/(RTT*sqrt(p))
    ~= 870 KB/s; measured 1.47 MB/s (window growth between sparse losses);
    floor at 10 fps of 55 KB frames (~550 KB/s) leaves 2.7x slack. Also
    asserts the RTT estimator actually converged near the path RTT —
    a broken estimator would still pass a pure throughput floor on
    loopback-grade paths."""

    async def run():
        a, b = _mk_agents()
        await a.start("127.0.0.1")
        await b.start("127.0.0.1")
        rng = random.Random(6)
        loop = asyncio.get_running_loop()
        for ag in (a, b):
            real = ag.transport.sendto

            def wan(data, addr, real=real):
                if rng.random() < 0.001:
                    return
                loop.call_later(0.025, real, data, addr)

            ag.transport.sendto = wan
        try:
            b.set_remote(a.local_description())
            a.set_remote(b.local_description())
            ch_a = await (await a.wait_connected(20)).wait_ready(20)
            await (await b.wait_connected(20)).wait_ready(20)
            frame = os.urandom(55_000)
            n = 40

            async def producer():
                for _ in range(n):
                    await ch_a.send(3000, frame)

            t0 = time.perf_counter()
            prod = asyncio.create_task(producer())
            ch_b = b.channel
            for _ in range(n):
                await asyncio.wait_for(ch_b.recv(), 30)
            dt = time.perf_counter() - t0
            await prod
            fps = n / dt
            assert fps >= 10, f"WAN-regime throughput {fps:.1f} < 10 fps"
            st = ch_a.sctp
            assert st._srtt is not None and 0.04 < st._srtt < 0.25, (
                f"RTT estimator off: srtt={st._srtt}")
        finally:
            a.close()
            b.close()

    asyncio.run(asyncio.wait_for(run(), 120))


def test_signaling_tamper_cannot_downgrade_to_secretbox():
    """DTLS-downgrade resistance: a malicious relay that tampers with the
    signed signaling blob (e.g. to strip the dtls_fp and force the legacy
    channel) breaks the sender's Ed25519 envelope; the receiver drops the
    offer entirely, so the attacker gets NO channel at all — never a
    downgraded one (RFC 8827 §6.2 trust model end-to-end through the
    relay)."""
    from asciichat_tpu.apps.acds import AcdsServer
    from asciichat_tpu.apps.discovery import DiscoverySession
    from asciichat_tpu.net.transport import serve_tcp

    async def run():
        acds = AcdsServer("127.0.0.1", 0)
        srv = await serve_tcp(acds._handle, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]
        s1 = DiscoverySession("127.0.0.1", port, participant_id="mitm-a")
        s2 = DiscoverySession("127.0.0.1", port, participant_id="mitm-b")
        await s1.connect()
        await s2.connect()
        session = await s1.create(my_port=15011)
        await s2.join(session)

        # the relay becomes a MITM: every forwarded signaling envelope has
        # one byte flipped near its END (inside the signed JSON body where
        # the dtls_fp/candidates live; the envelope prefix holds key+sig)
        for cid, (transport, *_rest) in list(acds.clients.items()):
            real = transport.send_nowait

            def tampering(ptype, payload=b"", real=real):
                from asciichat_tpu.net.packet import PacketType as P

                if ptype == P.ACIP_WEBRTC_SDP and len(payload) > 16:
                    payload = bytearray(payload)
                    payload[-10] ^= 0x40
                    payload = bytes(payload)
                return real(ptype, payload)

            transport.send_nowait = tampering
        events = [asyncio.create_task(s.event_loop()) for s in (s1, s2)]
        try:
            with pytest.raises((TimeoutError, asyncio.TimeoutError)):
                await s1.p2p_connect("mitm-b", timeout=6, ice_timeout=2,
                                     relay_fallback=False)
            # the victim never built ANY channel from the forged offer
            assert not s2._p2p_agents and not s2._p2p_relay
        finally:
            for e in events:
                e.cancel()
            await s1.leave()
            await s2.leave()
            srv.close()

    asyncio.run(asyncio.wait_for(run(), 60))
