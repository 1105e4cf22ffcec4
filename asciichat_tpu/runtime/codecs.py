"""Audio/video codec abstraction: Opus and H.265 seats, gated on availability.

Parity mapping:
- Opus wrapper (lib/audio/opus.c:19-143): encode/decode float PCM in 20 ms
  (960-sample) batches with bitrate/DTX control. No libopus binding exists in
  this environment, so the default codec is RAW_FLOAT (the reference also
  ships raw PCM AUDIO_BATCH as the non-Opus path); the OpusCodec seat raises
  a clear CodecUnavailable and activates automatically if `opuslib` appears.
- H.265 (lib/video/h265/{encoder,decoder}.c, PACKET_TYPE_IMAGE_FRAME_H265):
  hardware-encoder probing + lazy open in the reference; here the seat probes
  the ffmpeg CLI (libx265) and pipes raw frames through it when present.
"""

from __future__ import annotations

import shutil
import subprocess
import threading

import numpy as np

from asciichat_tpu.utils.syncdebug import NamedLock

OPUS_FRAME_SAMPLES = 960  # 20 ms @ 48 kHz (src/server/render.c:57)


class CodecUnavailable(RuntimeError):
    pass


class RawFloatAudioCodec:
    """Identity codec: float32 PCM pass-through (AUDIO_BATCH wire format)."""

    name = "raw_float"

    def encode(self, samples: np.ndarray) -> bytes:
        return samples.astype("<f4").tobytes()

    def decode(self, data: bytes) -> np.ndarray:
        return np.frombuffer(data, "<f4")


class OpusCodec:
    """Opus seat (lib/audio/opus.c analog); requires an opus binding."""

    name = "opus"

    def __init__(self, bitrate: int = 32_000, dtx: bool = True):
        try:
            import opuslib  # noqa: F401
        except ImportError as e:
            raise CodecUnavailable(
                "opus unavailable: no libopus binding in this environment; "
                "using raw_float PCM (the reference's non-Opus path)"
            ) from e
        import opuslib

        self._enc = opuslib.Encoder(48000, 1, opuslib.APPLICATION_VOIP)
        self._enc.bitrate = bitrate
        self._dec = opuslib.Decoder(48000, 1)

    def encode(self, samples: np.ndarray) -> bytes:
        pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
        return self._enc.encode(pcm, OPUS_FRAME_SAMPLES)

    def decode(self, data: bytes) -> np.ndarray:
        pcm = self._dec.decode(data, OPUS_FRAME_SAMPLES)
        return np.frombuffer(pcm, "<i2").astype(np.float32) / 32767.0


def best_audio_codec(prefer_opus: bool = True):
    if prefer_opus:
        try:
            return OpusCodec()
        except CodecUnavailable:
            pass
    return RawFloatAudioCodec()


def _split_access_units(buf: bytearray) -> list[bytes]:
    """Split an Annex-B HEVC byte stream on Access Unit Delimiter NALs
    (type 35; the encoder runs with aud=1 so every AU starts with one).
    Complete AUs are removed from `buf`; a partial tail stays."""
    positions = []
    i = 0
    while True:
        j = buf.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        nal_start = j + 3
        if nal_start >= len(buf):
            break
        nal_type = (buf[nal_start] >> 1) & 0x3F
        if nal_type == 35:  # AUD
            # include a preceding zero byte (4-byte start code form)
            start = j - 1 if j > 0 and buf[j - 1] == 0 else j
            positions.append(start)
        i = j + 3
    if len(positions) < 2:
        return []
    aus = [bytes(buf[positions[k] : positions[k + 1]])
           for k in range(len(positions) - 1)]
    del buf[: positions[-1]]
    return aus


class H265Encoder:
    """Streaming H.265 encoder via the ffmpeg CLI (lib/video/h265/encoder.c
    analog: hardware probe + lazy open; here the probe is the ffmpeg binary).

    Low-latency x265 (tune zerolatency: no lookahead/reordering, one AU out
    per frame in) with aud=1 + repeat-headers=1 so each AU is self-framing
    and keyframe AUs are self-contained for mid-stream join."""

    name = "h265"

    def __init__(self, width: int, height: int, fps: int = 30, crf: int = 28,
                 keyint: int = 30):
        if not shutil.which("ffmpeg"):
            raise CodecUnavailable("h265 unavailable: no ffmpeg on PATH")
        self.width, self.height = width, height
        self._proc = subprocess.Popen(
            ["ffmpeg", "-v", "error", "-f", "rawvideo", "-pix_fmt", "rgb24",
             "-s", f"{width}x{height}", "-r", str(fps), "-i", "-",
             "-c:v", "libx265", "-preset", "ultrafast", "-tune", "zerolatency",
             "-x265-params", f"crf={crf}:keyint={keyint}:aud=1:repeat-headers=1",
             "-f", "hevc", "-"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
        )
        self._buf = bytearray()
        self._lock = NamedLock("codec.h265.encoder")
        self._reader = threading.Thread(target=self._drain, daemon=True)
        self._reader.start()

    def _drain(self) -> None:
        while True:
            chunk = self._proc.stdout.read(4096)
            if not chunk:
                return
            with self._lock:
                self._buf += chunk

    def encode(self, frame: np.ndarray) -> list[bytes]:
        """Feed one RGB24 frame; -> the complete encoded AUs available so far
        (zerolatency: normally one per call after the first)."""
        self._proc.stdin.write(np.ascontiguousarray(frame, np.uint8).tobytes())
        self._proc.stdin.flush()
        with self._lock:
            return _split_access_units(self._buf)

    def close(self) -> None:
        self._lock.unregister()
        try:
            self._proc.stdin.close()
            self._proc.wait(timeout=5)
        except Exception:
            self._proc.kill()


class H265Decoder:
    """Streaming H.265 decoder (src/session/h265/server.c:14-25 keeps one
    per client on the server; this is that per-client context)."""

    name = "h265"

    def __init__(self, width: int, height: int):
        if not shutil.which("ffmpeg"):
            raise CodecUnavailable("h265 unavailable: no ffmpeg on PATH")
        self.width, self.height = width, height
        self._frame_bytes = width * height * 3
        self._proc = subprocess.Popen(
            ["ffmpeg", "-v", "error", "-f", "hevc", "-i", "-",
             "-f", "rawvideo", "-pix_fmt", "rgb24", "-"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
        )
        self._buf = bytearray()
        self._lock = NamedLock("codec.h265.decoder")
        self._reader = threading.Thread(target=self._drain, daemon=True)
        self._reader.start()

    def _drain(self) -> None:
        while True:
            chunk = self._proc.stdout.read(self._frame_bytes)
            if not chunk:
                return
            with self._lock:
                self._buf += chunk

    def decode(self, au: bytes) -> list[np.ndarray]:
        """Feed one encoded AU; -> decoded RGB24 frames available so far."""
        self._proc.stdin.write(au)
        self._proc.stdin.flush()
        frames = []
        with self._lock:
            while len(self._buf) >= self._frame_bytes:
                raw = bytes(self._buf[: self._frame_bytes])
                del self._buf[: self._frame_bytes]
                frames.append(
                    np.frombuffer(raw, np.uint8).reshape(self.height, self.width, 3)
                )
        return frames

    def close(self) -> None:
        self._lock.unregister()
        try:
            self._proc.stdin.close()
            self._proc.wait(timeout=5)
        except Exception:
            self._proc.kill()


def probe_video_codecs() -> list[str]:
    """VIDEO_CODEC_CAP_* capability probe for CLIENT_CAPABILITIES /
    SERVER_STATE codec negotiation."""
    codecs = ["raw_rgb24"]
    if shutil.which("ffmpeg"):
        codecs.append("h265")
    return codecs
