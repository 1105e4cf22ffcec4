"""Localhost integration: spawn the REAL unified CLI as subprocesses
(server + clients), the reference's multi-node-without-a-cluster strategy
(tests/integration/session/main_integration_test.c:37-207: fork/exec real
binaries with PID-derived unique ports)."""

import asyncio
import os
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "ASCIICHAT_JAX_PLATFORM": "cpu", "PYTHONPATH": REPO}
PORT = 21000 + os.getpid() % 20000


def _spawn(*args, stdout=subprocess.PIPE):
    return subprocess.Popen(
        [sys.executable, "-m", "asciichat_tpu.apps.main", *args],
        env=ENV, cwd=REPO,
        stdout=stdout, stderr=subprocess.PIPE,
    )


@pytest.fixture(scope="module")
def server():
    proc = _spawn("server", "--port", str(PORT), "--log-level", "WARNING")
    time.sleep(4)  # jax import + listen
    assert proc.poll() is None, proc.stderr.read().decode()[-2000:]
    yield proc
    proc.terminate()
    proc.wait(timeout=10)


def test_mirror_snapshot_cli():
    out = subprocess.run(
        [sys.executable, "-m", "asciichat_tpu.apps.main", "mirror",
         "--test-pattern", "--snapshot", "--width", "40", "--height", "10",
         "--color-mode", "NONE", "--stretch"],
        env=ENV, cwd=REPO, capture_output=True, timeout=180,
    )
    assert out.returncode == 0
    lines = out.stdout.decode().rstrip("\n").split("\n")
    assert len(lines) == 10
    assert all(len(line) == 40 for line in lines)  # stretch fills exactly


def test_client_receives_frames(server):
    client = _spawn(
        "client", "127.0.0.1", "--port", str(PORT), "--test-pattern",
        "--width", "50", "--height", "12", "--color-mode", "COLOR_16",
        "--max-frames", "4", "--no-reconnect", "--log-level", "WARNING",
    )
    out, err = client.communicate(timeout=180)
    assert client.returncode == 0, err.decode()[-2000:]
    assert b"\x1b[" in out  # SGR sequences present
    assert out.count(b"\x1b[0m") >= 4  # at least one reset per frame


def test_two_clients_grid(server):
    c1 = _spawn("client", "127.0.0.1", "--port", str(PORT), "--test-pattern",
                "--width", "80", "--height", "24", "--color-mode", "NONE",
                "--max-frames", "8", "--no-reconnect", "--log-level", "WARNING")
    c2 = _spawn("client", "127.0.0.1", "--port", str(PORT), "--test-pattern",
                "--width", "80", "--height", "24", "--color-mode", "NONE",
                "--max-frames", "8", "--no-reconnect", "--log-level", "WARNING")
    out1, err1 = c1.communicate(timeout=180)
    out2, err2 = c2.communicate(timeout=180)
    assert c1.returncode == 0, err1.decode()[-1500:]
    assert c2.returncode == 0, err2.decode()[-1500:]
    assert len(out1) > 100 and len(out2) > 100


def test_protocol_violation_disconnects(server):
    """Garbage bytes must get the connection dropped, not crash the server."""

    async def run():
        reader, writer = await asyncio.open_connection("127.0.0.1", PORT)
        writer.write(b"NOT AN ACIP PACKET" * 10)
        await writer.drain()
        data = await asyncio.wait_for(reader.read(), timeout=10)
        writer.close()
        return data

    asyncio.run(run())  # server closes the connection (possibly empty read)
    assert server.poll() is None  # server still alive


def test_audio_roundtrip(server):
    """Speak as one client over raw ACIP and verify a second client hears it."""
    from asciichat_tpu.net import packet as pkt
    from asciichat_tpu.net import protocol as proto
    from asciichat_tpu.net.transport import connect_tcp

    async def run():
        speaker = await connect_tcp("127.0.0.1", PORT)
        listener = await connect_tcp("127.0.0.1", PORT)
        for t in (speaker, listener):
            await t.send(pkt.PacketType.CLIENT_CAPABILITIES,
                         proto.WireCapabilities().pack())
        tone = (0.5 * np.sin(np.arange(4800) / 20)).astype("<f4")
        heard = asyncio.Event()

        async def listen():
            while not heard.is_set():
                ptype, payload = await listener.recv()
                if ptype == pkt.PacketType.AUDIO_BATCH:
                    body, _, total, _, _ = pkt.unpack_audio_batch(payload)
                    mix = np.frombuffer(body, "<f4")
                    if np.abs(mix).max() > 0.01:
                        heard.set()

        task = asyncio.create_task(listen())
        for _ in range(50):
            await speaker.send(
                pkt.PacketType.AUDIO_BATCH,
                pkt.pack_audio_batch(tone.tobytes(), len(tone), 1),
            )
            await asyncio.sleep(0.05)
            if heard.is_set():
                break
        ok = heard.is_set()
        task.cancel()
        await speaker.close()
        await listener.close()
        return ok

    assert asyncio.run(asyncio.wait_for(run(), timeout=60))


PORT_ENC = PORT + 1


@pytest.fixture(scope="module")
def enc_server():
    proc = _spawn("server", "--port", str(PORT_ENC), "--password", "sekrit",
                  "--log-level", "WARNING")
    time.sleep(4)
    assert proc.poll() is None, proc.stderr.read().decode()[-2000:]
    yield proc
    proc.terminate()
    proc.wait(timeout=10)


def test_encrypted_session(enc_server):
    client = _spawn(
        "client", "127.0.0.1", "--port", str(PORT_ENC), "--test-pattern",
        "--encrypt", "--password", "sekrit", "--width", "40", "--height", "10",
        "--color-mode", "NONE", "--max-frames", "3", "--no-reconnect",
        "--log-level", "INFO",
    )
    out, err = client.communicate(timeout=180)
    assert client.returncode == 0, err.decode()[-2000:]
    assert b"encryption established" in err
    assert len(out) > 100  # frames arrived through the encrypted channel


def test_wrong_password_rejected(enc_server):
    client = _spawn(
        "client", "127.0.0.1", "--port", str(PORT_ENC), "--test-pattern",
        "--encrypt", "--password", "wrong", "--max-frames", "2",
        "--no-reconnect", "--log-level", "WARNING",
    )
    out, err = client.communicate(timeout=180)
    assert client.returncode != 0 or b"\x1b[" not in out
    assert enc_server.poll() is None


def test_plaintext_rejected_when_password_required(enc_server):
    client = _spawn(
        "client", "127.0.0.1", "--port", str(PORT_ENC), "--test-pattern",
        "--max-frames", "2", "--no-reconnect", "--log-level", "WARNING",
    )
    out, err = client.communicate(timeout=180)
    assert b"encryption required" in err or len(out) < 50


PORT_ACDS = PORT + 2
PORT_HOST = PORT + 3


def test_discovery_session_end_to_end():
    """ACDS + discovery host + discovery joiner, all real processes."""
    acds = _spawn("discovery-service", "--port", str(PORT_ACDS),
                  "--log-level", "WARNING")
    time.sleep(3)
    assert acds.poll() is None, acds.stderr.read().decode()[-1500:]
    host = joiner = None
    try:
        host = _spawn("discovery", "--acds", "127.0.0.1",
                      "--acds-port", str(PORT_ACDS), "--port", str(PORT_HOST),
                      "--log-level", "WARNING")
        # read the session string the host prints
        line = host.stdout.readline().decode().strip()
        assert line.startswith("session: "), line
        session_string = line.split(": ", 1)[1]
        time.sleep(3)  # host server comes up

        joiner = _spawn("discovery", "--acds", "127.0.0.1",
                        "--acds-port", str(PORT_ACDS), "--join", session_string,
                        "--max-frames", "4", "--width", "50", "--height", "12",
                        "--log-level", "WARNING")
        out, err = joiner.communicate(timeout=180)
        assert joiner.returncode == 0, err.decode()[-2000:]
        assert f"session: {session_string}".encode() in out
        assert len(out) > 200  # received frames from the discovered host
    finally:
        for p in (joiner, host, acds):
            if p and p.poll() is None:
                p.terminate()
        acds.wait(timeout=10)


PORT_WS = PORT + 4
PORT_WS_TCP = PORT + 5


def test_websocket_client_session():
    """Server listens on TCP + WS; a client over WS receives frames."""
    srv = _spawn("server", "--port", str(PORT_WS_TCP), "--ws-port", str(PORT_WS),
                 "--log-level", "WARNING")
    time.sleep(4)
    assert srv.poll() is None, srv.stderr.read().decode()[-1500:]
    try:
        ws_client = _spawn(
            "client", "127.0.0.1", "--port", str(PORT_WS), "--ws",
            "--test-pattern", "--width", "40", "--height", "10",
            "--color-mode", "NONE", "--max-frames", "3", "--no-reconnect",
            "--log-level", "WARNING",
        )
        tcp_client = _spawn(
            "client", "127.0.0.1", "--port", str(PORT_WS_TCP),
            "--test-pattern", "--width", "40", "--height", "10",
            "--color-mode", "NONE", "--max-frames", "3", "--no-reconnect",
            "--log-level", "WARNING",
        )
        out_ws, err_ws = ws_client.communicate(timeout=180)
        out_tcp, err_tcp = tcp_client.communicate(timeout=180)
        assert ws_client.returncode == 0, err_ws.decode()[-1500:]
        assert tcp_client.returncode == 0, err_tcp.decode()[-1500:]
        assert len(out_ws) > 100 and len(out_tcp) > 100
    finally:
        srv.terminate()
        srv.wait(timeout=10)


def test_browser_page_and_no_compress_bit():
    """The WS port serves the browser page; caps bit0 disables compression."""
    import struct
    import urllib.request

    port_tcp, port_ws = PORT + 6, PORT + 7
    srv = _spawn("server", "--port", str(port_tcp), "--ws-port", str(port_ws),
                 "--log-level", "WARNING")
    time.sleep(4)
    assert srv.poll() is None, srv.stderr.read().decode()[-1500:]
    try:
        page = None
        for attempt in range(10):  # ws listener may lag the jax import
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port_ws}/", timeout=10
                ) as r:
                    page = r.read()
                break
            except (urllib.error.URLError, ConnectionError, OSError):
                time.sleep(1)
        assert page is not None, "ws port never came up"
        assert b"<title>asciichat-tpu</title>" in page
        # the app shell references the render-core assets (served separately)
        assert b"/app.js" in page and b"/ansi.js" in page
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port_ws}/ansi.js", timeout=10
        ) as r:
            assert b"AnsiGrid" in r.read()

        feeder = _spawn("client", "127.0.0.1", "--port", str(port_tcp),
                        "--test-pattern", "--max-frames", "100000",
                        "--log-level", "WARNING")

        async def browser_like():
            from asciichat_tpu.net import packet as pkt
            from asciichat_tpu.net.websocket import connect_ws

            t = await connect_ws("127.0.0.1", port_ws, path="/ws")
            caps = bytearray(168)
            struct.pack_into(">I", caps, 0, 1)  # bit0: no-compression
            struct.pack_into(">I", caps, 4, 3)
            struct.pack_into(">I", caps, 12, 2)
            struct.pack_into(">H", caps, 16, 80)
            struct.pack_into(">H", caps, 18, 24)
            caps[159] = 1
            await t.send(pkt.PacketType.CLIENT_CAPABILITIES, bytes(caps))
            while True:
                ptype, payload = await t.recv()
                if ptype == pkt.PacketType.ASCII_FRAME:
                    _w, _h, orig, comp, _crc, _fl = pkt.ASCII_FRAME_HDR.unpack(payload[:24])
                    await t.close()
                    return orig, comp
        orig, comp = asyncio.run(asyncio.wait_for(browser_like(), 60))
        assert orig > 1024 and comp == 0  # large frame, NOT compressed
        feeder.terminate()
    finally:
        srv.terminate()
        srv.wait(timeout=10)


def test_custom_palette_and_filter_over_wire(server):
    """CLIENT_CAPABILITIES palette_custom + color_filter personalize frames."""
    import struct

    from asciichat_tpu.net import packet as pkt
    from asciichat_tpu.net import protocol as proto
    from asciichat_tpu.net.transport import connect_tcp
    from asciichat_tpu.render.types import ColorLevel, RenderMode, TerminalCapabilities

    async def run():
        feeder = await connect_tcp("127.0.0.1", PORT)
        await feeder.send(pkt.PacketType.CLIENT_CAPABILITIES,
                          proto.WireCapabilities().pack())
        frame = np.full((48, 64, 3), 200, np.uint8)
        await feeder.send(pkt.PacketType.IMAGE_FRAME,
                          pkt.pack_image_frame(frame.tobytes(), 64, 48))

        caps = TerminalCapabilities(ColorLevel.NONE, RenderMode.FOREGROUND,
                                    wants_padding=False)
        viewer_wire = proto.WireCapabilities(
            caps=caps, width=40, height=12, palette_custom="@+. ",
            color_filter=3,  # green
        )
        viewer = await connect_tcp("127.0.0.1", PORT)
        await viewer.send(pkt.PacketType.CLIENT_CAPABILITIES, viewer_wire.pack())
        deadline = asyncio.get_event_loop().time() + 30
        body = None
        while asyncio.get_event_loop().time() < deadline:
            # keep feeding so the tick has a source
            await feeder.send(pkt.PacketType.IMAGE_FRAME,
                              pkt.pack_image_frame(frame.tobytes(), 64, 48))
            try:
                ptype, payload = await asyncio.wait_for(viewer.recv(), timeout=5)
            except asyncio.TimeoutError:
                continue
            if ptype == pkt.PacketType.ASCII_FRAME:
                body, _w, _h, _fl = pkt.unpack_ascii_frame(payload)
                break
        await feeder.close()
        await viewer.close()
        return body

    body = asyncio.run(asyncio.wait_for(run(), 60))
    assert body is not None
    # mono render of a flat bright frame with palette "@+. " must use ONLY
    # characters from the custom palette (flat gray 200 -> one glyph + REP)
    visible = set(body.replace(b"\n", b"")) - set(b"\x1b[0123456789b")
    assert visible and visible <= set(b"@+. "), visible


def test_host_failover():
    """Kill the session host: ACDS re-elects, the surviving participant's
    viewer migrates to the new host and keeps receiving frames (the host
    failover path, docs/ring-consensus-protocol.md)."""
    ap, pa, pb = PORT + 8, PORT + 9, PORT + 10
    acds = _spawn("discovery-service", "--port", str(ap), "--log-level", "INFO")
    time.sleep(3)
    assert acds.poll() is None, acds.stderr.read().decode()[-1500:]
    a = b = None
    try:
        a = _spawn("discovery", "--acds", "127.0.0.1", "--acds-port", str(ap),
                   "--port", str(pa), "--log-level", "WARNING")
        session = a.stdout.readline().decode().strip().split(": ", 1)[1]
        time.sleep(4)
        # b's frame output goes to devnull: an undrained stdout pipe fills
        # and blocks its event loop before the migration can be observed
        b = _spawn("discovery", "--acds", "127.0.0.1", "--acds-port", str(ap),
                   "--join", session, "--port", str(pb), "--max-frames", "100000",
                   "--width", "40", "--height", "10", "--log-level", "INFO",
                   stdout=subprocess.DEVNULL)
        time.sleep(8)
        a.kill()  # host dies mid-session
        a.wait(timeout=10)
        deadline = time.monotonic() + 30
        migrated = False
        while time.monotonic() < deadline and not migrated:
            line = b.stderr.readline().decode()
            if "host migrated" in line:
                migrated = True
        assert migrated, "no HOST_DESIGNATED migration observed"
        assert b.poll() is None  # survivor keeps running as the new host
    finally:
        for p in (b, acds):
            if p and p.poll() is None:
                p.kill()
        acds.wait(timeout=10)


def test_live_server_uses_batched_device_tick():
    """The live server must execute the flagship batched render path
    (models/server.RenderGroup -> render_compute on device), not the host
    fallback — asserted via the inspector's tick_compute counter."""
    import json
    import urllib.request

    port, insp = PORT + 10, PORT + 11
    srv = _spawn("server", "--port", str(port), "--inspect-port", str(insp),
                 "--log-level", "WARNING")
    time.sleep(4)
    try:
        assert srv.poll() is None, srv.stderr.read().decode()[-2000:]
        client = _spawn(
            "client", "127.0.0.1", "--port", str(port), "--test-pattern",
            "--width", "40", "--height", "12", "--color-mode", "TRUECOLOR",
            "--max-frames", "5", "--no-reconnect", "--log-level", "WARNING",
        )
        out, err = client.communicate(timeout=180)
        assert client.returncode == 0, err.decode()[-2000:]
        assert b"\x1b[" in out  # truecolor frames arrived
        with urllib.request.urlopen(
            f"http://127.0.0.1:{insp}/state/server", timeout=10
        ) as r:
            stats = json.loads(r.read())
        assert stats["device_tick"] is True
        assert stats["tick_compute"] > 0, stats
    finally:
        srv.terminate()
        srv.wait(timeout=10)


def _wait_audio_samples(path: str, min_samples: int, timeout_s: float = 45.0,
                        procs: tuple = ()) -> None:
    """Poll until the f32 capture file holds enough samples. A fixed sleep is
    load-flaky on this 1-vCPU box: under a full-suite run the jax import in
    three child processes can eat >10 s of the exchange window."""
    import os

    deadline = time.monotonic() + timeout_s
    need = min_samples * 4
    while time.monotonic() < deadline:
        for p in procs:
            assert p.poll() is None, "child process died during audio exchange"
        try:
            if os.path.getsize(path) >= need:
                return
        except OSError:
            pass
        time.sleep(0.5)


def test_client_audio_duplex_exclude_self(tmp_path):
    """Two REAL clients exchange audio through the server: A captures a 440 Hz
    tone, B captures silence. Exclude-self mixing (mixer.c:636) means A's
    received mix is ~silent (its own tone excluded) while B's carries A's
    tone (src/client/audio.c:276 capture, :531 playback)."""
    import signal

    port = PORT + 12
    srv = _spawn("server", "--port", str(port), "--log-level", "WARNING")
    time.sleep(4)
    fa, fb = str(tmp_path / "a.f32"), str(tmp_path / "b.f32")
    try:
        assert srv.poll() is None, srv.stderr.read().decode()[-2000:]
        a = _spawn("client", "127.0.0.1", "--port", str(port), "--no-media",
                   "--tone-hz", "440", "--audio-out", fa,
                   "--no-reconnect", "--log-level", "WARNING")
        b = _spawn("client", "127.0.0.1", "--port", str(port), "--no-media",
                   "--tone-hz", "0", "--audio-out", fb,
                   "--no-reconnect", "--log-level", "WARNING")
        # ~2 s of steady-state mix in B's capture, however long imports take
        _wait_audio_samples(fb, 96000, procs=(a, b))
        for p in (a, b):
            p.send_signal(signal.SIGINT)
        for p in (a, b):
            try:
                p.wait(timeout=20)
            except subprocess.TimeoutExpired:
                p.kill()
        va = np.fromfile(fa, "<f4")
        vb = np.fromfile(fb, "<f4")
        assert len(vb) >= 4800, f"B received only {len(vb)} samples of mix"
        vbs = vb[len(vb) // 2:]  # steady state: skip gate attack/duck ramp
        rms_b = float(np.sqrt(np.mean(vbs * vbs)))
        rms_a = float(np.sqrt(np.mean(va * va))) if len(va) else 0.0
        assert rms_b > 0.02, f"B does not hear A's tone (rms={rms_b})"
        assert rms_a < rms_b * 0.2, f"A hears itself (rms_a={rms_a}, rms_b={rms_b})"
    finally:
        srv.terminate()
        srv.wait(timeout=10)


def test_ssh_key_auth_end_to_end(tmp_path):
    """server --allowed-keys + client --ssh-key over real processes: the
    whitelisted key gets frames through the encrypted session, an unlisted
    key is refused (lib/crypto/ssh + handshake client_whitelist)."""
    from cryptography.hazmat.primitives.asymmetric.ed25519 import Ed25519PrivateKey
    from cryptography.hazmat.primitives.serialization import (
        Encoding, NoEncryption, PrivateFormat, PublicFormat,
    )

    good = Ed25519PrivateKey.generate()
    evil = Ed25519PrivateKey.generate()
    (tmp_path / "authorized_keys").write_text(
        good.public_key().public_bytes(Encoding.OpenSSH, PublicFormat.OpenSSH).decode()
        + " tester\n")
    for name, key in (("good", good), ("evil", evil)):
        (tmp_path / name).write_bytes(key.private_bytes(
            Encoding.PEM, PrivateFormat.OpenSSH, NoEncryption()))

    port = PORT + 14
    srv = _spawn("server", "--port", str(port),
                 "--allowed-keys", str(tmp_path / "authorized_keys"),
                 "--log-level", "WARNING")
    time.sleep(4)
    try:
        assert srv.poll() is None, srv.stderr.read().decode()[-2000:]
        ok = _spawn("client", "127.0.0.1", "--port", str(port), "--test-pattern",
                    "--ssh-key", str(tmp_path / "good"), "--width", "40",
                    "--height", "10", "--color-mode", "NONE", "--max-frames", "3",
                    "--no-reconnect", "--log-level", "INFO")
        out, err = ok.communicate(timeout=180)
        assert ok.returncode == 0, err.decode()[-2000:]
        assert b"encryption established" in err
        assert len(out) > 100  # frames arrived

        bad = _spawn("client", "127.0.0.1", "--port", str(port), "--test-pattern",
                     "--ssh-key", str(tmp_path / "evil"), "--max-frames", "2",
                     "--no-reconnect", "--log-level", "WARNING")
        out, err = bad.communicate(timeout=180)
        assert bad.returncode != 0 or b"\x1b[" not in out
        assert srv.poll() is None  # server survives the failed auth
    finally:
        srv.terminate()
        srv.wait(timeout=10)


def test_webclient_duplex_protocol():
    """The browser page's full protocol surface exercised as the page's JS
    would over the ws port: caps + no-compress bit, ASCII frames down, chat
    both ways (TEXT_MESSAGE relay), AUDIO_BATCH duplex (mic up -> exclude-
    self mix down), live SIZE_MESSAGE resize."""
    import asyncio

    import numpy as np

    from asciichat_tpu.net import packet as pkt
    from asciichat_tpu.net import protocol as proto
    from asciichat_tpu.net.transport import connect_tcp

    port = PORT + 16
    ws_port = PORT + 17
    srv = _spawn("server", "--port", str(port), "--ws-port", str(ws_port),
                 "--log-level", "WARNING")
    time.sleep(4)
    try:
        assert srv.poll() is None, srv.stderr.read().decode()[-2000:]

        async def run():
            from asciichat_tpu.net.websocket import connect_ws
            from asciichat_tpu.render.types import (
                ColorLevel, RenderMode, TerminalCapabilities,
            )

            # feeder client over TCP supplies video + a tone
            feeder = await connect_tcp("127.0.0.1", port)
            caps = proto.WireCapabilities(
                caps=TerminalCapabilities(ColorLevel.NONE, RenderMode.FOREGROUND),
                width=40, height=10)
            await feeder.send(pkt.PacketType.CLIENT_CAPABILITIES, caps.pack())
            frame = np.full((48, 64, 3), 200, np.uint8)
            await feeder.send(pkt.PacketType.IMAGE_FRAME,
                              pkt.pack_image_frame(frame.tobytes(), 64, 48))
            tone = (0.2 * np.sin(2 * np.pi * 440 * np.arange(480) / 48000)
                    ).astype("<f4")

            # browser-like ws client
            web = await connect_ws("127.0.0.1", ws_port)
            wcaps = proto.WireCapabilities(
                caps=TerminalCapabilities(ColorLevel.TRUECOLOR, RenderMode.HALF_BLOCK),
                width=60, height=20, capabilities_mask=1)
            await web.send(pkt.PacketType.CLIENT_CAPABILITIES, wcaps.pack())
            await web.send(pkt.PacketType.SIZE_MESSAGE, proto.pack_size(50, 16))
            await web.send(pkt.PacketType.TEXT_MESSAGE, b"hi from browser")
            got = {"frame": False, "audio": False}
            feeder_chat = None

            async def pump_feeder():
                nonlocal feeder_chat
                for _ in range(400):
                    await feeder.send(
                        pkt.PacketType.AUDIO_BATCH,
                        pkt.pack_audio_batch(tone.tobytes(), 480, 1))
                    try:
                        ptype, payload = await asyncio.wait_for(feeder.recv(), 0.02)
                        if ptype == pkt.PacketType.TEXT_MESSAGE:
                            feeder_chat = payload
                    except asyncio.TimeoutError:
                        pass
                    if feeder_chat and got["frame"] and got["audio"]:
                        return

            async def pump_web():
                while not (got["frame"] and got["audio"]):
                    ptype, payload = await web.recv()
                    if ptype == pkt.PacketType.ASCII_FRAME:
                        body, w, h, flags = pkt.unpack_ascii_frame(payload)
                        assert not flags & pkt.FRAME_FLAG_IS_COMPRESSED
                        got["frame"] = True
                    elif ptype == pkt.PacketType.AUDIO_BATCH:
                        body, _bc, total, rate, _ch = pkt.unpack_audio_batch(payload)
                        mix = np.frombuffer(body, "<f4")[:total]
                        if np.sqrt((mix ** 2).mean()) > 0.02:
                            got["audio"] = True  # feeder's tone reached the browser

            await asyncio.wait_for(
                asyncio.gather(pump_feeder(), pump_web()), 30)
            assert feeder_chat == b"hi from browser"  # chat relayed
            await web.close()
            await feeder.close()

        asyncio.run(run())
    finally:
        srv.terminate()
        srv.wait(timeout=10)


def test_opus_audio_duplex(tmp_path):
    """Opus end-to-end: two clients with --opus exchange audio; the server
    decodes per-client Opus uplinks, mixes, and re-encodes each client's
    personalized mix with that client's context (render.c:57 analog)."""
    from asciichat_tpu.runtime import codecs as codecs_mod

    try:
        codecs_mod.OpusCodec()
    except codecs_mod.CodecUnavailable:
        import pytest

        pytest.skip("no libopus")
    import signal

    port = PORT + 18
    srv = _spawn("server", "--port", str(port), "--log-level", "WARNING")
    time.sleep(4)
    fa, fb = str(tmp_path / "a.f32"), str(tmp_path / "b.f32")
    try:
        assert srv.poll() is None, srv.stderr.read().decode()[-2000:]
        a = _spawn("client", "127.0.0.1", "--port", str(port), "--no-media",
                   "--tone-hz", "440", "--opus", "--audio-out", fa,
                   "--no-reconnect", "--log-level", "WARNING")
        b = _spawn("client", "127.0.0.1", "--port", str(port), "--no-media",
                   "--tone-hz", "0", "--opus", "--audio-out", fb,
                   "--no-reconnect", "--log-level", "WARNING")
        _wait_audio_samples(fb, 96000, procs=(a, b))
        for p in (a, b):
            p.send_signal(signal.SIGINT)
        for p in (a, b):
            try:
                p.wait(timeout=20)
            except subprocess.TimeoutExpired:
                p.kill()
        vb = np.fromfile(fb, "<f4")
        va = np.fromfile(fa, "<f4") if len(np.fromfile(fa, "<f4")) else np.zeros(1)
        assert len(vb) >= 4800, f"B received only {len(vb)} opus samples"
        vbs = vb[len(vb) // 2:]
        rms_b = float(np.sqrt(np.mean(vbs * vbs)))
        rms_a = float(np.sqrt(np.mean(va * va)))
        assert rms_b > 0.02, f"B does not hear A's opus tone (rms={rms_b})"
        assert rms_a < rms_b * 0.25, (rms_a, rms_b)
    finally:
        srv.terminate()
        srv.wait(timeout=10)


def test_h265_uplink_end_to_end_real_codec():
    """REAL H.265 uplink over real processes: client --h265 negotiates via
    SERVER_STATE, encodes with the native libavcodec shim, the server's
    per-client decode ctx feeds the render pipeline, ASCII frames return."""
    from asciichat_tpu.runtime import codecs as codecs_mod

    try:
        codecs_mod.H265Encoder(64, 48).close()
    except codecs_mod.CodecUnavailable:
        import pytest

        pytest.skip("no H.265 codec available")
    port, insp = PORT + 20, PORT + 21
    srv = _spawn("server", "--port", str(port), "--inspect-port", str(insp),
                 "--log-level", "WARNING")
    time.sleep(4)
    try:
        assert srv.poll() is None, srv.stderr.read().decode()[-2000:]
        client = _spawn(
            "client", "127.0.0.1", "--port", str(port), "--test-pattern",
            "--h265", "--width", "40", "--height", "12", "--color-mode",
            "TRUECOLOR", "--max-frames", "8", "--no-reconnect",
            "--log-level", "INFO",
        )
        out, err = client.communicate(timeout=180)
        assert client.returncode == 0, err.decode()[-2000:]
        assert b"server supports h265" in err  # negotiation happened
        assert b"\x1b[" in out  # frames rendered from DECODED h265 uploads
        assert srv.poll() is None
    finally:
        srv.terminate()
        srv.wait(timeout=10)


def test_server_survives_protocol_fuzz_and_churn():
    """Robustness: random garbage, malformed packets, truncated handshakes,
    and rapid connect/disconnect churn (the resource-leak hotspot for the
    per-client codec contexts) must not kill the server, and a well-behaved
    client must still work afterwards."""
    import asyncio
    import random

    from asciichat_tpu.net import packet as pkt
    from asciichat_tpu.net.transport import connect_tcp

    port = PORT + 24
    srv = _spawn("server", "--port", str(port), "--log-level", "ERROR")
    time.sleep(4)
    try:
        assert srv.poll() is None, srv.stderr.read().decode()[-2000:]

        async def fuzz():
            rng = random.Random(1234)
            # 1) raw garbage streams
            for _ in range(10):
                r, w = await asyncio.open_connection("127.0.0.1", port)
                w.write(rng.randbytes(rng.randint(1, 4096)))
                try:
                    await w.drain()
                    w.close()
                    await w.wait_closed()
                except (ConnectionError, OSError):
                    pass
            # 2) valid headers + malformed payloads for every packet type
            types = [1, 1000, 1100, 1102, 2000, 2002, 3000, 3001, 3002,
                     4000, 4001, 5000, 5001, 5005, 6000, 6051]
            for ptype in types:
                try:
                    t = await connect_tcp("127.0.0.1", port)
                    for _ in range(3):
                        await t.send(ptype, rng.randbytes(rng.randint(0, 512)))
                    await t.close()
                except (ConnectionError, OSError, ValueError):
                    pass
            # 3) truncated handshakes
            for _ in range(5):
                try:
                    t = await connect_tcp("127.0.0.1", port)
                    await t.send(pkt.PacketType.CRYPTO_CAPABILITIES, b"\x01")
                    await t.close()
                except (ConnectionError, OSError):
                    pass
            # 4) rapid connect/disconnect churn with caps (codec ctx churn)
            from asciichat_tpu.net import protocol as proto

            for i in range(20):
                try:
                    t = await connect_tcp("127.0.0.1", port)
                    await t.send(pkt.PacketType.CLIENT_CAPABILITIES,
                                 proto.WireCapabilities().pack())
                    await t.send(pkt.PacketType.AUDIO_OPUS_BATCH,
                                 pkt.pack_audio_batch(rng.randbytes(40), 480, 1))
                    await t.close()
                except (ConnectionError, OSError):
                    pass

        asyncio.run(asyncio.wait_for(fuzz(), 60))
        time.sleep(1)
        assert srv.poll() is None, "server died under fuzz"

        # a well-behaved client still gets frames
        client = _spawn("client", "127.0.0.1", "--port", str(port),
                        "--test-pattern", "--width", "40", "--height", "10",
                        "--color-mode", "NONE", "--max-frames", "3",
                        "--no-reconnect", "--log-level", "WARNING")
        out, err = client.communicate(timeout=180)
        assert client.returncode == 0, err.decode()[-2000:]
        assert len(out) > 100
    finally:
        srv.terminate()
        srv.wait(timeout=10)


def test_mixed_codec_population(tmp_path):
    """Heterogeneous client population on ONE server (the reference's normal
    deployment; ROADMAP 'mixed opus/raw + h265/raw populations'): client A
    uplinks Opus audio (+H.265 video when a codec exists), client B uplinks
    raw PCM + raw RGB, and an in-process viewer watches. Every per-client
    decode path feeds the same batched tick; cross-codec audio is proven by
    spectrum: B's mix is dominated by A's 440 Hz tone (decoded from Opus)
    and A's mix by B's 220 Hz tone (raw), each through the exclude-self
    mixer."""
    import signal

    from asciichat_tpu.runtime import codecs as codecs_mod

    try:
        codecs_mod.OpusCodec()
    except codecs_mod.CodecUnavailable:
        pytest.skip("no libopus")
    try:
        codecs_mod.H265Encoder(64, 48).close()
        h265_args = ["--h265"]
    except codecs_mod.CodecUnavailable:
        h265_args = []  # still a mixed opus/raw population

    port = PORT + 26
    srv = _spawn("server", "--port", str(port), "--log-level", "WARNING")
    time.sleep(4)
    fa, fb = str(tmp_path / "a.f32"), str(tmp_path / "b.f32")
    try:
        assert srv.poll() is None, srv.stderr.read().decode()[-2000:]
        a = _spawn("client", "127.0.0.1", "--port", str(port), "--test-pattern",
                   "--opus", *h265_args, "--tone-hz", "440", "--audio-out", fa,
                   "--width", "60", "--height", "20",
                   "--no-reconnect", "--log-level", "WARNING")
        b = _spawn("client", "127.0.0.1", "--port", str(port), "--test-pattern",
                   "--tone-hz", "220", "--audio-out", fb,
                   "--width", "60", "--height", "20",
                   "--no-reconnect", "--log-level", "WARNING")

        # in-process viewer: sees both streams composited + roster state
        async def viewer():
            from asciichat_tpu.net import packet as pkt
            from asciichat_tpu.net import protocol as proto
            from asciichat_tpu.net.transport import connect_tcp
            from asciichat_tpu.render.types import (
                ColorLevel, RenderMode, TerminalCapabilities,
            )

            t = await connect_tcp("127.0.0.1", port)
            caps = proto.WireCapabilities(
                caps=TerminalCapabilities(ColorLevel.TRUECOLOR,
                                          RenderMode.HALF_BLOCK),
                width=80, height=24)
            await t.send(pkt.PacketType.CLIENT_CAPABILITIES, caps.pack())
            import json as _json

            frames = 0
            streaming = 0
            deadline = asyncio.get_running_loop().time() + 90
            while asyncio.get_running_loop().time() < deadline:
                ptype, payload = await asyncio.wait_for(t.recv(), 30)
                if ptype == pkt.PacketType.ASCII_FRAME:
                    frames += 1
                elif ptype == pkt.PacketType.SERVER_STATE:
                    streaming = max(
                        streaming, _json.loads(payload).get("streaming", 0))
                elif ptype == pkt.PacketType.PING:
                    # answer keepalive probes: a silent viewer is swept
                    await t.send(pkt.PacketType.PONG, payload)
                if frames >= 30 and streaming >= 2:
                    await t.close()
                    return frames, streaming
            raise AssertionError(
                f"viewer saw frames={frames} streaming={streaming}")

        frames, streaming = asyncio.run(viewer())
        assert frames >= 30 and streaming >= 2

        _wait_audio_samples(fb, 96000, procs=(a, b))
        _wait_audio_samples(fa, 96000, procs=(a, b))
        for p in (a, b):
            p.send_signal(signal.SIGINT)
        for p in (a, b):
            try:
                p.wait(timeout=20)
            except subprocess.TimeoutExpired:
                p.kill()

        def dominant_hz(path):
            v = np.fromfile(path, "<f4")
            v = v[len(v) // 2:]  # steady state
            spec = np.abs(np.fft.rfft(v * np.hanning(len(v))))
            spec[:3] = 0  # ignore DC/duck envelope drift
            return float(np.fft.rfftfreq(len(v), 1 / 48000)[int(np.argmax(spec))])

        hz_b = dominant_hz(fb)  # B hears A's 440 (Opus-decoded server-side)
        hz_a = dominant_hz(fa)  # A hears B's 220 (raw)
        assert abs(hz_b - 440) < 25, f"B's mix dominated by {hz_b:.0f} Hz, not 440"
        assert abs(hz_a - 220) < 25, f"A's mix dominated by {hz_a:.0f} Hz, not 220"
    finally:
        srv.terminate()
        srv.wait(timeout=10)


def test_render_group_churn_under_load():
    """Live re-negotiation stress: while an uploader streams and a viewer
    watches continuously, a churner re-sends CLIENT_CAPABILITIES every few
    frames cycling geometry x render mode x color level x filter x palette
    (each change re-plans a device render group, apps/server.py group
    cache). Frames must keep flowing to BOTH receivers, the churner must
    observe its geometry changes honored, and the server must stay alive."""
    from asciichat_tpu.net import packet as pkt
    from asciichat_tpu.net import protocol as proto
    from asciichat_tpu.net.transport import connect_tcp
    from asciichat_tpu.render.types import (
        ColorLevel, RenderMode, TerminalCapabilities,
    )

    port = PORT + 32
    srv = _spawn("server", "--port", str(port), "--log-level", "ERROR")
    time.sleep(4)
    try:
        assert srv.poll() is None, srv.stderr.read().decode()[-2000:]

        async def run():
            up = await connect_tcp("127.0.0.1", port)
            await up.send(pkt.PacketType.CLIENT_CAPABILITIES,
                          proto.WireCapabilities().pack())
            frame = np.zeros((60, 80, 3), np.uint8)
            frame[:, :40] = [220, 40, 90]

            async def uploader():
                while True:
                    await up.send(pkt.PacketType.IMAGE_FRAME,
                                  pkt.pack_image_frame(frame.tobytes(), 80, 60))
                    await asyncio.sleep(0.05)

            viewer = await connect_tcp("127.0.0.1", port)
            await viewer.send(
                pkt.PacketType.CLIENT_CAPABILITIES,
                proto.WireCapabilities(
                    caps=TerminalCapabilities(ColorLevel.TRUECOLOR,
                                              RenderMode.HALF_BLOCK),
                    width=64, height=20).pack())
            viewer_frames = 0

            async def watch():
                nonlocal viewer_frames
                while True:
                    ptype, _payload = await viewer.recv()
                    if ptype == pkt.PacketType.ASCII_FRAME:
                        viewer_frames += 1

            churner = await connect_tcp("127.0.0.1", port)
            churn_widths = set()

            async def churn():
                pool = [
                    (40, 12, ColorLevel.NONE, RenderMode.FOREGROUND, 0, ""),
                    (60, 20, ColorLevel.TRUECOLOR, RenderMode.HALF_BLOCK, 3, ""),
                    (30, 10, ColorLevel.COLOR_256, RenderMode.FOREGROUND, 8,
                     "   .-+*#"),
                    (50, 16, ColorLevel.COLOR_16, RenderMode.HALF_BLOCK, 12, ""),
                    (45, 14, ColorLevel.TRUECOLOR, RenderMode.FOREGROUND, 6, ""),
                ]
                for i in range(40):
                    w, h, lvl, mode, filt, palette = pool[i % len(pool)]
                    await churner.send(
                        pkt.PacketType.CLIENT_CAPABILITIES,
                        proto.WireCapabilities(
                            caps=TerminalCapabilities(lvl, mode),
                            width=w, height=h, color_filter=filt,
                            palette_custom=palette).pack())
                    # drain a frame or two at the new settings
                    deadline = asyncio.get_running_loop().time() + 3
                    while asyncio.get_running_loop().time() < deadline:
                        ptype, payload = await asyncio.wait_for(
                            churner.recv(), 5)
                        if ptype == pkt.PacketType.ASCII_FRAME:
                            fw, _fh, _o, _c, _crc, _fl = (
                                pkt.ASCII_FRAME_HDR.unpack(payload[:24]))
                            churn_widths.add(fw)
                            break

            tasks = [asyncio.create_task(uploader()),
                     asyncio.create_task(watch())]
            try:
                await asyncio.wait_for(churn(), 90)
                # viewer kept receiving through 40 re-negotiations
                assert viewer_frames > 20, viewer_frames
                # the churner's geometry changes were honored
                assert len(churn_widths) >= 3, churn_widths
            finally:
                for t in tasks:
                    t.cancel()
                await up.close()
                await viewer.close()
                await churner.close()

        asyncio.run(asyncio.wait_for(run(), 120))
        assert srv.poll() is None, "server died under render-group churn"
    finally:
        srv.terminate()
        srv.wait(timeout=10)


def test_zero_dim_frame_rejected_and_zombies_swept(tmp_path):
    """Two hardening regressions: (1) a 0x0 IMAGE_FRAME must get the sender
    disconnected (it used to pass validation and NaN-poison the compositor
    plan every tick — remote video DoS for everyone); (2) a half-open client
    that goes silent is PING-probed and then swept, freeing its slot
    (keepalive.c counterpart), while a pinging client survives."""
    import os as _os

    port = PORT + 34
    env = {**ENV, "ASCIICHAT_CLIENT_TIMEOUT": "6"}
    srv = subprocess.Popen(
        [sys.executable, "-m", "asciichat_tpu.apps.main", "server",
         "--port", str(port), "--log-level", "WARNING"],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    time.sleep(4)
    try:
        assert srv.poll() is None, srv.stderr.read().decode()[-2000:]

        async def run():
            from asciichat_tpu.net import packet as pkt
            from asciichat_tpu.net import protocol as proto
            from asciichat_tpu.net.transport import connect_tcp

            # (1) zero-dim frame -> disconnect, server survives
            evil = await connect_tcp("127.0.0.1", port)
            await evil.send(pkt.PacketType.CLIENT_CAPABILITIES,
                            proto.WireCapabilities().pack())
            await evil.send(pkt.PacketType.IMAGE_FRAME,
                            pkt.pack_image_frame(b"", 0, 0))
            with pytest.raises((asyncio.IncompleteReadError, ConnectionError,
                                asyncio.TimeoutError, ValueError)):
                # the server must drop us; recv eventually fails
                for _ in range(200):
                    await asyncio.wait_for(evil.recv(), 10)

            # a good client still gets frames after the attack
            good = await connect_tcp("127.0.0.1", port)
            await good.send(pkt.PacketType.CLIENT_CAPABILITIES,
                            proto.WireCapabilities().pack())
            frame = np.full((24, 32, 3), 180, np.uint8)
            await good.send(pkt.PacketType.IMAGE_FRAME,
                            pkt.pack_image_frame(frame.tobytes(), 32, 24))
            got_frame = False
            deadline = asyncio.get_running_loop().time() + 20
            while not got_frame and asyncio.get_running_loop().time() < deadline:
                ptype, _ = await asyncio.wait_for(good.recv(), 10)
                if ptype == pkt.PacketType.ASCII_FRAME:
                    got_frame = True
            assert got_frame, "video tick dead after 0x0 frame attack"

            # (2) zombie sweep: a silent client is probed then dropped;
            # the pinging client lives through the same window
            zombie = await connect_tcp("127.0.0.1", port)
            await zombie.send(pkt.PacketType.CLIENT_CAPABILITIES,
                              proto.WireCapabilities().pack())

            async def keep_pinging():
                for _ in range(30):
                    good.send_nowait(pkt.PacketType.PING, b"alive")
                    await asyncio.sleep(1.0)

            pinger = asyncio.create_task(keep_pinging())
            probed = dropped = False
            deadline = asyncio.get_running_loop().time() + 25
            try:
                while asyncio.get_running_loop().time() < deadline:
                    ptype, _ = await asyncio.wait_for(zombie.recv(), 20)
                    if ptype == pkt.PacketType.PING:
                        probed = True  # server probes the quiet client...
                        # ...and we deliberately do NOT answer
            except (asyncio.IncompleteReadError, ConnectionError,
                    asyncio.TimeoutError):
                dropped = True
            assert probed, "server never probed the silent client"
            assert dropped, "silent client was never swept"
            # the pinging client is still being served
            ptype, _ = await asyncio.wait_for(good.recv(), 10)
            pinger.cancel()
            await good.close()

        asyncio.run(asyncio.wait_for(run(), 120))
        assert srv.poll() is None
    finally:
        srv.terminate()
        srv.wait(timeout=10)


def test_client_webrtc_cli_flag():
    """`client --webrtc` end-to-end as REAL spawned binaries: the server's
    ws listener answers the SDP POST, the client runs ICE+DTLS+SCTP, and
    frames flow — validating the CLI arg plumbing (args.webrtc ->
    AsciiChatClient) that the in-process e2e tests bypass."""
    ws_port = PORT + 101
    srv = _spawn("server", "--port", str(PORT + 100), "--ws-port",
                 str(ws_port), "--log-level", "WARNING")
    try:
        time.sleep(4)  # jax import + listeners
        assert srv.poll() is None, srv.stderr.read().decode()[-2000:]
        cli = _spawn("client", "127.0.0.1", "--port", str(ws_port),
                     "--webrtc", "--test-pattern", "--max-frames", "4",
                     "--no-reconnect", "--log-level", "WARNING",
                     stdout=subprocess.DEVNULL)
        rc = cli.wait(timeout=120)
        err = cli.stderr.read().decode()
        assert rc == 0, err[-2000:]
    finally:
        srv.terminate()
        srv.wait(timeout=10)
