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
