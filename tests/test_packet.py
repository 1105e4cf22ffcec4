"""ACIP packet framing, CRC32-C, compression policy, payload structs."""

import numpy as np
import pytest

from asciichat_tpu.net import packet as pkt
from asciichat_tpu.net import protocol as proto
from asciichat_tpu.render.types import ColorLevel, RenderMode, TerminalCapabilities


def test_crc32c_known_vectors():
    # RFC 3720 iSCSI test vectors for CRC32-C
    assert pkt.crc32c(b"") == 0
    assert pkt.crc32c(b"123456789") == 0xE3069283
    assert pkt.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert pkt.crc32c(b"\xff" * 32) == 0x62A8AB43


def test_crc32c_native_matches_python():
    data = bytes(np.random.default_rng(0).integers(0, 256, 10_000, dtype=np.uint8))
    assert pkt.crc32c(data) == pkt._crc32c_py(data)


def test_header_roundtrip():
    payload = b"hello ascii"
    buf = pkt.pack_packet(pkt.PacketType.TEXT_MESSAGE, payload)
    assert len(buf) == pkt.HEADER_SIZE + len(payload)
    ptype, length, crc, cid = pkt.unpack_header(buf)
    assert ptype == pkt.PacketType.TEXT_MESSAGE
    assert length == len(payload)
    assert cid == 0
    assert pkt.verify_payload(payload, crc)
    # header bytes: magic is big-endian 0xA5C11C4A1 in the first 8 bytes
    assert buf[:8] == (0xA5C11C4A1).to_bytes(8, "big")


def test_bad_magic_rejected():
    buf = b"\x00" * pkt.HEADER_SIZE
    with pytest.raises(ValueError):
        pkt.unpack_header(buf)


def test_compression_policy():
    small = b"x" * 100
    out, compressed = pkt.maybe_compress(small)
    assert not compressed and out == small  # < 1 KB threshold
    big = b"a" * 4096
    out, compressed = pkt.maybe_compress(big)
    assert compressed and len(out) < 0.8 * len(big)
    # incompressible stays raw (ratio >= 0.8)
    rnd = bytes(np.random.default_rng(1).integers(0, 256, 4096, dtype=np.uint8))
    out, compressed = pkt.maybe_compress(rnd)
    assert not compressed


def test_ascii_frame_roundtrip():
    frame = ("\x1b[38;2;1;2;3mXY\n" * 300).encode()
    payload = pkt.pack_ascii_frame(frame, 80, 24)
    got, w, h, flags = pkt.unpack_ascii_frame(payload)
    assert got == frame and (w, h) == (80, 24)
    assert flags & pkt.FRAME_FLAG_IS_COMPRESSED  # repetitive -> compressed
    # uncompressed path
    payload = pkt.pack_ascii_frame(b"tiny", 4, 1)
    got, w, h, flags = pkt.unpack_ascii_frame(payload)
    assert got == b"tiny" and flags == 0


def test_ascii_frame_corruption_detected():
    payload = bytearray(pkt.pack_ascii_frame(b"tiny frame data", 5, 1))
    payload[-1] ^= 0xFF
    with pytest.raises(ValueError):
        pkt.unpack_ascii_frame(bytes(payload))


def test_image_frame_roundtrip():
    px = bytes(np.random.default_rng(2).integers(0, 256, 120 * 90 * 3, dtype=np.uint8))
    payload = pkt.pack_image_frame(px, 120, 90)
    got, w, h, fmt = pkt.unpack_image_frame(payload)
    assert got == px and (w, h, fmt) == (120, 90, pkt.PIXEL_FORMAT_RGB24)


def test_audio_batch_roundtrip():
    samples = np.arange(480, dtype="<f4").tobytes()
    payload = pkt.pack_audio_batch(samples, 480, 1)
    body, bc, total, rate, ch = pkt.unpack_audio_batch(payload)
    assert body == samples and (bc, total, rate, ch) == (1, 480, 48000, 1)


def test_wire_capabilities_roundtrip():
    wc = proto.WireCapabilities(
        caps=TerminalCapabilities(ColorLevel.COLOR_256, RenderMode.HALF_BLOCK,
                                  wants_padding=False, utf8_support=True),
        width=132, height=43, term_type="xterm-kitty", desired_fps=120,
        color_filter=3, palette_custom="@#*.",
    )
    buf = wc.pack()
    assert len(buf) == proto.CAPS_STRUCT.size
    back = proto.WireCapabilities.unpack(buf)
    assert back.caps == wc.caps
    assert (back.width, back.height) == (132, 43)
    assert back.term_type == "xterm-kitty"
    assert back.desired_fps == 120 and back.color_filter == 3
    assert back.palette_custom == "@#*."


def test_wire_capabilities_auto_color_level():
    wc = proto.WireCapabilities(caps=TerminalCapabilities(ColorLevel.AUTO))
    back = proto.WireCapabilities.unpack(wc.pack())
    assert back.caps.color_level == ColorLevel.AUTO


def test_size_and_error_messages():
    assert proto.unpack_size(proto.pack_size(203, 64)) == (203, 64)
    code, msg = proto.unpack_error(proto.pack_error(42, "bad thing"))
    assert (code, msg) == (42, "bad thing")


def test_decompression_bomb_rejected():
    import struct

    # image frame claiming 65535x65535 with a tiny compressed body
    comp, _ = pkt._zstd()
    body = comp.compress(b"\x00" * 100)
    hdr = pkt.IMAGE_FRAME_HDR.pack(0xFFFF, 0xFFFF, 0, len(body), 0, 0)
    with pytest.raises(ValueError, match="sanity|cap"):
        pkt.unpack_image_frame(hdr + body)
    # ascii frame claiming a 4GB original
    hdr = pkt.ASCII_FRAME_HDR.pack(80, 24, 0xFFFFFFF0, len(body), 0,
                                   pkt.FRAME_FLAG_IS_COMPRESSED)
    with pytest.raises(ValueError, match="cap"):
        pkt.unpack_ascii_frame(hdr + body)


def test_short_header_raises_valueerror():
    with pytest.raises(ValueError, match="short"):
        pkt.unpack_header(b"\x00" * 10)
    with pytest.raises(ValueError, match="short"):
        pkt.unpack_ascii_frame(b"tiny")
    with pytest.raises(ValueError, match="short"):
        pkt.unpack_image_frame(b"tiny")
