"""Codec seats + error system."""

import numpy as np
import pytest

from asciichat_tpu.runtime import codecs
from asciichat_tpu.utils import errors


def test_raw_float_codec_roundtrip():
    c = codecs.RawFloatAudioCodec()
    samples = np.random.default_rng(0).normal(0, 0.3, 960).astype(np.float32)
    np.testing.assert_array_equal(c.decode(c.encode(samples)), samples)


def test_best_audio_codec_prefers_opus_when_present():
    c = codecs.best_audio_codec()
    try:
        codecs.OpusCodec()
        assert c.name == "opus"
    except codecs.CodecUnavailable as e:
        assert c.name == "raw_float"
        assert "libopus" in str(e)


def test_h265_real_roundtrip():
    """REAL H.265 through the native libavcodec shim (or the ffmpeg CLI
    fallback): encode a color pattern, decode it back, colors survive."""
    try:
        enc = codecs.H265Encoder(64, 48)
        dec = codecs.H265Decoder(64, 48)
    except codecs.CodecUnavailable:
        pytest.skip("no libavcodec shim and no ffmpeg")
    decoded = []
    for i in range(8):
        f = np.full((48, 64, 3), i * 25, np.uint8)
        f[:, :32] = (0, 255, 0)
        for au in enc.encode(f):
            decoded += dec.decode(au)
    assert len(decoded) >= 6  # low-latency: at most a frame or two buffered
    assert decoded[0][:, :32, 1].mean() > 200  # green half preserved
    assert decoded[0][:, 32:, 1].mean() < 80
    enc.close()
    dec.close()


def test_probe_video_codecs():
    assert "raw_rgb24" in codecs.probe_video_codecs()


def test_errno_thread_local():
    import threading

    errors.clear_errno()
    assert not errors.has_errno()
    errors.set_errno(errors.ErrorCode.NETWORK, "boom")
    assert errors.has_errno()
    code, msg = errors.get_errno()
    assert code == errors.ErrorCode.NETWORK and msg == "boom"

    seen = {}

    def other():
        seen["other"] = errors.has_errno()

    t = threading.Thread(target=other)
    t.start()
    t.join()
    assert seen["other"] is False  # thread-local isolation
    errors.clear_errno()


def test_error_strings():
    assert errors.error_string(errors.ErrorCode.CRYPTO) == "cryptographic failure"
    e = errors.AsciiChatError(errors.ErrorCode.AUTH_FAILED, "nope")
    assert e.code == errors.ErrorCode.AUTH_FAILED


def test_hevc_au_splitter():
    """Annex-B access-unit framing: AUs split on AUD NALs (type 35),
    partial tails retained."""
    aud4 = b"\x00\x00\x00\x01" + bytes([35 << 1, 0x01])  # 4-byte start code AUD
    aud3 = b"\x00\x00\x01" + bytes([35 << 1, 0x01])
    slice_nal = b"\x00\x00\x01" + bytes([1 << 1]) + b"payload"
    buf = bytearray(aud4 + slice_nal + aud3 + slice_nal + aud4 + b"\x00\x00")
    aus = codecs._split_access_units(buf)
    assert len(aus) == 2
    assert aus[0] == aud4 + slice_nal
    assert aus[1] == aud3 + slice_nal
    assert bytes(buf).startswith(aud4)  # partial last AU retained


class _MockEnc:
    """Stand-in codec proving the IMAGE_FRAME_H265 protocol wiring without
    ffmpeg: 'encode' = zlib of the raw frame, one AU per frame."""

    def __init__(self, width, height, fps=30):
        import zlib

        self.width, self.height, self._z = width, height, zlib

    def encode(self, frame):
        return [self._z.compress(np.ascontiguousarray(frame, np.uint8).tobytes())]

    def close(self):
        pass


class _MockDec:
    def __init__(self, width, height):
        import zlib

        self.width, self.height, self._z = width, height, zlib

    def decode(self, au):
        raw = self._z.decompress(au)
        return [np.frombuffer(raw, np.uint8).reshape(self.height, self.width, 3)]

    def close(self):
        pass


def test_h265_protocol_wiring_loopback(monkeypatch):
    """Capability-negotiated H.265 uplink end-to-end over real sockets:
    server advertises a decoder in SERVER_STATE, the client switches from
    raw RGB to IMAGE_FRAME_H265, the server's per-client decode ctx feeds
    the render pipeline, ASCII frames come back (codec mocked: the wiring
    under test is negotiation + packet flow + per-client contexts,
    session/h265/server.c:14-25)."""
    import asyncio

    monkeypatch.setattr(codecs, "H265Encoder", _MockEnc)
    monkeypatch.setattr(codecs, "H265Decoder", _MockDec)
    monkeypatch.setattr(codecs, "probe_video_codecs",
                        lambda: ["raw_rgb24", "h265"])

    from asciichat_tpu.apps.client import AsciiChatClient
    from asciichat_tpu.apps.server import AsciiChatServer
    from asciichat_tpu.net import protocol as proto
    from asciichat_tpu.net.transport import serve_tcp
    from asciichat_tpu.render.types import ColorLevel, RenderMode, TerminalCapabilities
    from asciichat_tpu.runtime.framesource import open_source

    async def run():
        server = AsciiChatServer()
        srv = await serve_tcp(server._handle_conn, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]
        tick = asyncio.get_running_loop().create_task(server._tick_loop())
        caps = TerminalCapabilities(ColorLevel.NONE, RenderMode.FOREGROUND)
        client = AsciiChatClient(
            "127.0.0.1", port, open_source(test_pattern=True),
            proto.WireCapabilities(caps=caps, width=40, height=12),
            reconnect=False, want_h265=True,
        )
        try:
            await asyncio.wait_for(client.run(max_frames=5), 60)
        finally:
            tick.cancel()
            srv.close()
        assert client.h265_active, "client never switched to h265"
        assert client.h265_frames_sent >= 1
        assert client.frames_received >= 5  # decoded frames rendered back
        # per-client decode ctx existed on the server
        return client

    asyncio.run(asyncio.wait_for(run(), 90))


def test_opus_codec_real_libopus():
    """Real libopus via ctypes (lib/audio/opus.c analog): 10ms float frames,
    ~45x compression, tone survives the roundtrip."""
    try:
        c_enc = codecs.OpusCodec()
        c_dec = codecs.OpusCodec()
    except codecs.CodecUnavailable:
        pytest.skip("no libopus on this system")
    t = np.arange(480) / 48000
    tone = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    outs = []
    for _ in range(20):
        enc = c_enc.encode(tone)
        assert len(enc) < 480  # actually compressed
        outs.append(c_dec.decode(enc))
    steady = np.concatenate(outs[5:])
    rms = float(np.sqrt((steady ** 2).mean()))
    assert abs(rms - 0.212) < 0.05  # tone level preserved
    with pytest.raises(ValueError):
        c_enc.encode(tone[:100])  # wrong frame size


def test_h265_probe_order_fallback_logic():
    """Ordered hw->sw probe with injected failures (encoder.c:67-84 parity):
    the first candidate whose open succeeds wins; all-fail -> None."""
    from asciichat_tpu.runtime.codecs import H265_PROBE_ORDER, probe_h265_encoder

    assert H265_PROBE_ORDER == ("hevc_vaapi", "hevc_nvenc", "hevc_qsv",
                                "hevc_videotoolbox", "libx265")
    calls = []

    def fail_first_three(name):
        calls.append(name)
        return name == "hevc_videotoolbox"

    assert probe_h265_encoder(try_open=fail_first_three) == "hevc_videotoolbox"
    assert calls == ["hevc_vaapi", "hevc_nvenc", "hevc_qsv", "hevc_videotoolbox"]

    assert probe_h265_encoder(try_open=lambda n: False) is None
    assert probe_h265_encoder(try_open=lambda n: True) == "hevc_vaapi"
    # custom order respected
    assert probe_h265_encoder(order=("libx265", "hevc_nvenc"),
                              try_open=lambda n: n == "hevc_nvenc") == "hevc_nvenc"


def test_h265_probe_real_open_and_encoder_name():
    """On this box the real probe must fall through the absent hw encoders
    to libx265, and the opened encoder must carry that name."""
    import pytest

    from asciichat_tpu.runtime import codecs

    try:
        name = codecs.probe_h265_encoder()
    except Exception as e:  # pragma: no cover - env without libav*
        pytest.skip(f"libavcodec unavailable: {e}")
    if name is None:
        pytest.skip("no HEVC encoder in this libavcodec build")
    assert name == "libx265"  # no GPU/VAAPI device in this image
    # cached: second call returns instantly with the same answer
    assert codecs.probe_h265_encoder() == name
    enc = codecs.NativeH265Encoder(64, 48)
    try:
        assert enc.encoder_name == "libx265"
        import numpy as np

        pkts = []
        for _ in range(8):  # zerolatency buffers at most a frame or two
            pkts += enc.encode(np.zeros((48, 64, 3), np.uint8))
        assert pkts and pkts[0], "keyframe expected within 8 frames"
    finally:
        enc.close()
