"""WebSocket framing, mDNS message codec, live inspector."""

import asyncio
import json
import urllib.request

import numpy as np
import pytest


def test_websocket_echo_roundtrip():
    from asciichat_tpu.net import packet as pkt
    from asciichat_tpu.net.websocket import connect_ws, serve_ws

    async def run():
        got = []

        async def handler(t):
            ptype, payload = await t.recv()
            got.append((ptype, payload))
            await t.send(pkt.PacketType.PONG, payload)
            # big payload crosses the 64KB extended-length encoding
            await t.send(pkt.PacketType.ASCII_FRAME, b"x" * 70_000)
            await asyncio.sleep(0.2)

        server = await serve_ws(handler, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        t = await connect_ws("127.0.0.1", port)
        await t.send(pkt.PacketType.PING, b"hello-ws")
        ptype, payload = await t.recv()
        assert (ptype, payload) == (pkt.PacketType.PONG, b"hello-ws")
        ptype, payload = await t.recv()
        assert ptype == pkt.PacketType.ASCII_FRAME and len(payload) == 70_000
        await t.close()
        server.close()
        assert got == [(pkt.PacketType.PING, b"hello-ws")]

    asyncio.run(asyncio.wait_for(run(), 30))


def test_websocket_rejects_non_upgrade():
    from asciichat_tpu.net.websocket import serve_ws

    async def run():
        async def handler(t):
            pass

        server = await serve_ws(handler, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
        await writer.drain()
        line = await reader.readline()
        assert b"400" in line
        writer.close()
        server.close()

    asyncio.run(asyncio.wait_for(run(), 30))


def test_mdns_message_codec():
    from asciichat_tpu.net import mdns

    ann = mdns.build_announcement("myhost", 27224, {"ver": "1"}, "192.168.1.7")
    svc = mdns.parse_response(ann, "192.168.1.7")
    assert svc is not None
    assert svc.instance == "myhost" and svc.port == 27224
    assert svc.address == "192.168.1.7" and svc.txt == {"ver": "1"}
    # queries are not parsed as services
    assert mdns.parse_response(mdns.build_query(), "1.2.3.4") is None


def test_mdns_name_compression():
    from asciichat_tpu.net import mdns

    # name with a compression pointer back to offset 12
    raw = b"\x00" * 12 + mdns._encode_name("foo.local")
    name, _ = mdns._decode_name(raw + b"\xc0\x0c", len(raw))
    assert name == "foo.local"


def test_inspector_endpoints():
    from asciichat_tpu.runtime.inspector import Inspector

    insp = Inspector(0)
    insp.register("demo", lambda: {"answer": 42})
    port = insp.start()
    try:
        def get(path):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=5) as r:
                return json.loads(r.read())

        assert get("/health") == {"ok": True}
        assert get("/state") == ["demo"]
        assert get("/state/demo") == {"answer": 42}
        threads = get("/threads")
        assert any("MainThread" in k for k in threads)
        assert "objects" in get("/gc")
        with pytest.raises(urllib.error.HTTPError):
            get("/state/nope")
    finally:
        insp.stop()


def test_websocket_oversized_frame_rejected():
    """A peer claiming a multi-GB frame must be rejected before any read
    (memory-exhaustion guard, mirrors the TCP MAX_PACKET_SIZE gate)."""
    import struct

    from asciichat_tpu.net import packet as pkt
    from asciichat_tpu.net.websocket import MAX_MESSAGE_SIZE, WebSocketConnection

    async def run():
        reader = asyncio.StreamReader()
        # binary frame, FIN, unmasked, 64-bit length = 8 GB
        reader.feed_data(struct.pack(">BBQ", 0x82, 127, 8 << 30))

        class W:  # writer never used before the raise
            def get_extra_info(self, *_):
                return None

        ws = WebSocketConnection(reader, W(), is_client=False)
        with pytest.raises(ValueError):
            await ws.recv_message()

        # fragment accumulation across frames is also bounded
        reader2 = asyncio.StreamReader()
        half = MAX_MESSAGE_SIZE // 2 + 100
        reader2.feed_data(struct.pack(">BBQ", 0x02, 127, half) + b"a" * half)
        reader2.feed_data(struct.pack(">BBQ", 0x80, 127, half) + b"b" * half)
        ws2 = WebSocketConnection(reader2, W(), is_client=False)
        with pytest.raises(ValueError):
            await ws2.recv_message()
        assert MAX_MESSAGE_SIZE == pkt.MAX_PACKET_SIZE + pkt.HEADER_SIZE

    asyncio.run(asyncio.wait_for(run(), 10))


def test_server_clamps_client_dims():
    """A client advertising 65535x65535 must be clamped before render
    planning (resource-DoS guard; reference handlers.c:254)."""
    from asciichat_tpu.apps.server import MAX_TERM_H, MAX_TERM_W, AsciiChatServer, ClientState
    from asciichat_tpu.net import packet as pkt
    from asciichat_tpu.net import protocol as proto

    class FakeTransport:
        def __init__(self, packets):
            self.packets = list(packets)
            self.sent = []

        async def recv(self):
            if not self.packets:
                raise asyncio.IncompleteReadError(b"", 1)
            return self.packets.pop(0)

        async def send(self, ptype, payload=b""):
            self.sent.append((ptype, payload))

        def send_nowait(self, ptype, payload=b"", **kw):
            self.sent.append((ptype, payload))
            return True

    async def run():
        srv = AsciiChatServer()
        caps = proto.WireCapabilities()
        caps.width, caps.height = 65535, 65535
        t = FakeTransport([
            (pkt.PacketType.CLIENT_CAPABILITIES, caps.pack()),
            (pkt.PacketType.SIZE_MESSAGE, proto.pack_size(60000, 50000)),
        ])
        c = ClientState(1, t)
        srv.clients[1] = c
        with pytest.raises(asyncio.IncompleteReadError):
            await srv._recv_loop(c)
        assert c.wire_caps.width <= MAX_TERM_W
        assert c.wire_caps.height <= MAX_TERM_H

    asyncio.run(asyncio.wait_for(run(), 10))


def test_websocket_permessage_deflate():
    """RFC 7692 negotiation + shared-context compression both ways; large
    compressible payloads shrink on the wire (counted via a tap), and a
    non-offering client stays uncompressed."""
    from asciichat_tpu.net import packet as pkt
    from asciichat_tpu.net.websocket import connect_ws, serve_ws

    async def run():
        got = []

        negotiated = []

        async def handler(t):
            negotiated.append(t.ws.deflate)
            for _ in range(2 if t.ws.deflate else 1):
                ptype, payload = await t.recv()
                got.append(payload)
                await t.send(pkt.PacketType.ASCII_FRAME, payload)
            await asyncio.sleep(0.2)

        server = await serve_ws(handler, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        t = await connect_ws("127.0.0.1", port)
        assert t.ws.deflate  # negotiated client-side
        body = b"\x1b[38;2;1;2;3mX" * 5000  # highly compressible ANSI-ish
        # tap the raw socket write size
        sent_sizes = []
        orig_write = t.ws.writer.write
        t.ws.writer.write = lambda b: (sent_sizes.append(len(b)), orig_write(b))
        for _ in range(2):
            await t.send(pkt.PacketType.ASCII_FRAME, body)
            ptype, payload = await t.recv()
            assert payload == body  # roundtrip exact through both contexts
        assert got == [body, body]
        assert max(sent_sizes) < len(body) // 4, sent_sizes  # actually compressed
        await t.close()

        # client that doesn't offer: plain frames, still interoperates
        t2 = await connect_ws("127.0.0.1", port, deflate=False)
        assert not t2.ws.deflate
        await t2.send(pkt.PacketType.ASCII_FRAME, body)
        ptype, payload = await t2.recv()
        assert payload == body
        await t2.close()
        server.close()
        assert negotiated == [True, False]

    asyncio.run(asyncio.wait_for(run(), 30))


def test_send_nowait_byte_cap_sheds_bulky_backlog():
    """Byte-budget shedding (latest-wins): the 256-packet queue bound alone
    admits ~226 MB of stale raw video per client (measured holding 1.1 GiB
    across 9 clients in the warmup soak) — callers shipping bulky payloads
    pass byte_cap and excess frames drop at enqueue, like the reference's
    latest-frame double-buffer (video_frame.c:214-264) + drop-on-full
    pipeline queues (pipeline.c:72-80)."""
    from asciichat_tpu.net import packet as pkt
    from asciichat_tpu.net.transport import Transport

    async def run():
        # a server that never reads -> writer.drain() backs up -> queue fills
        async def handler(reader, writer):
            await asyncio.sleep(10)

        server = await asyncio.start_server(handler, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        t = Transport(reader, writer)
        t.start_sender()
        frame = b"x" * 300_000
        sent = dropped = 0
        for _ in range(64):
            if t.send_nowait(pkt.PacketType.IMAGE_FRAME, frame,
                             byte_cap=3 * len(frame)):
                sent += 1
            else:
                dropped += 1
            await asyncio.sleep(0)  # let the sender task pull what it can
        # budget holds: queued bytes never exceed the cap, the rest shed
        assert t._queued_bytes <= 3 * len(frame)
        assert dropped > 0 and sent >= 3
        # small control packets are NOT byte-capped (no byte_cap arg)
        assert t.send_nowait(pkt.PacketType.PING, b"p")
        # accounting matches reality: drain the queue tally against qsize
        est = sum(len(b) for b in list(t._send_queue._queue) if b is not None)
        assert t._queued_bytes == est
        await t.close()
        server.close()

    asyncio.run(asyncio.wait_for(run(), 30))
