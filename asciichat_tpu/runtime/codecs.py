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

import numpy as np

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


class H265Encoder:
    """H.265 seat via the ffmpeg CLI (encoder probe analog, encoder.c:67-84)."""

    name = "h265"

    def __init__(self, width: int, height: int, fps: int = 30, crf: int = 28):
        if not shutil.which("ffmpeg"):
            raise CodecUnavailable("h265 unavailable: no ffmpeg on PATH")
        self._proc = subprocess.Popen(
            ["ffmpeg", "-v", "error", "-f", "rawvideo", "-pix_fmt", "rgb24",
             "-s", f"{width}x{height}", "-r", str(fps), "-i", "-",
             "-c:v", "libx265", "-crf", str(crf), "-f", "hevc", "-"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        )

    def encode_frame(self, frame: np.ndarray) -> None:
        self._proc.stdin.write(frame.astype(np.uint8).tobytes())

    def finish(self) -> bytes:
        out, _ = self._proc.communicate()
        return out


def probe_video_codecs() -> list[str]:
    """VIDEO_CODEC_CAP_* capability probe for CLIENT_CAPABILITIES."""
    codecs = ["raw_rgb24"]
    if shutil.which("ffmpeg"):
        codecs.append("h265")
    return codecs
