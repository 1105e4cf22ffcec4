"""Codec seats + error system."""

import numpy as np
import pytest

from asciichat_tpu.runtime import codecs
from asciichat_tpu.utils import errors


def test_raw_float_codec_roundtrip():
    c = codecs.best_audio_codec()
    samples = np.random.default_rng(0).normal(0, 0.3, 960).astype(np.float32)
    out = c.decode(c.encode(samples))
    if c.name == "raw_float":
        np.testing.assert_array_equal(out, samples)
    else:  # opus is lossy
        assert out.shape == samples.shape


def test_opus_gated():
    try:
        codecs.OpusCodec()
    except codecs.CodecUnavailable as e:
        assert "raw_float" in str(e)


def test_h265_gated():
    import shutil

    if shutil.which("ffmpeg"):
        pytest.skip("ffmpeg present; seat active")
    with pytest.raises(codecs.CodecUnavailable):
        codecs.H265Encoder(64, 48)


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
