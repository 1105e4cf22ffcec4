"""Native ring buffer + V4L2 webcam module."""

import threading

import numpy as np
import pytest

from asciichat_tpu.runtime.ringbuffer import AudioRing


def test_ring_basic_rw():
    r = AudioRing(1024)
    assert len(r) == 0 and r.capacity == 1024
    data = np.arange(480, dtype=np.float32)
    assert r.write(data) == 480
    assert len(r) == 480
    out = r.read(480)
    np.testing.assert_array_equal(out, data)
    assert len(r) == 0
    # partial read
    r.write(data[:100])
    out = r.read(480)
    assert len(out) == 100


def test_ring_overflow_drops_newest():
    r = AudioRing(256)  # rounds to power of two
    assert r.write(np.zeros(200, np.float32)) == 200
    wrote = r.write(np.ones(200, np.float32))  # only 56 fit
    assert wrote == 56 and r.overruns == 144
    out = r.read(r.capacity)
    assert len(out) == 256
    np.testing.assert_array_equal(out[:200], 0.0)  # oldest kept (SPSC-safe)
    np.testing.assert_array_equal(out[200:], 1.0)


def test_ring_threaded_spsc():
    r = AudioRing(1 << 14)
    total = 50_000
    received = []


    import time

    done = threading.Event()

    def consumer():
        got = 0
        deadline = time.monotonic() + 30
        while got < total and time.monotonic() < deadline:
            out = r.read(480)
            got += len(out)
            if len(out):
                received.append(out)
            elif done.is_set() and len(r) == 0:
                break

    def producer_wrapped():
        sent = 0
        while sent < total:
            n = min(479, total - sent)
            wrote = r.write(np.arange(sent, sent + n, dtype=np.float32) % 1000)
            sent += wrote  # retry unwritten tail (drop-newest semantics)
        done.set()

    tp = threading.Thread(target=producer_wrapped)
    tc = threading.Thread(target=consumer)
    tp.start(); tc.start(); tp.join(timeout=30); tc.join(timeout=35)
    got = np.concatenate(received)
    want = np.arange(total, dtype=np.float32) % 1000
    # with producer retry there is no loss: order and content preserved
    assert len(got) == total
    np.testing.assert_array_equal(got, want)


def test_webcam_gated_or_reads():
    from asciichat_tpu.runtime.webcam import V4L2Webcam, WebcamUnavailable

    try:
        cam = V4L2Webcam()
    except WebcamUnavailable:
        pytest.skip("no camera in this environment (expected)")
    frame = cam.read()
    cam.close()
    assert frame is None or frame.shape[2] == 3


def test_yuyv_conversion():
    from asciichat_tpu.runtime.webcam import yuyv_to_rgb

    # pure white: Y=255, U=V=128
    buf = bytes([255, 128, 255, 128]) * (16 * 16 // 2)
    rgb = yuyv_to_rgb(buf, 16, 16)
    assert np.all(rgb == 255)
    # pure black
    buf = bytes([0, 128, 0, 128]) * (16 * 16 // 2)
    assert np.all(yuyv_to_rgb(buf, 16, 16) == 0)
    # red-ish: V high raises R above G/B
    buf = bytes([128, 128, 128, 255]) * (16 * 16 // 2)
    rgb = yuyv_to_rgb(buf, 16, 16)
    assert rgb[0, 0, 0] > rgb[0, 0, 1] and rgb[0, 0, 0] > rgb[0, 0, 2]


def test_device_frame_stager():
    import numpy as np

    from asciichat_tpu.runtime.device_stream import DeviceFrameStager

    stager = DeviceFrameStager()
    a = np.full((2, 4, 4, 3), 1, np.uint8)
    b = np.full((2, 4, 4, 3), 2, np.uint8)
    c = np.full((2, 4, 4, 3), 3, np.uint8)
    assert stager.stage(a) is None  # nothing resident yet
    got = stager.stage(b)
    np.testing.assert_array_equal(np.asarray(got), a)  # previous batch ready
    got = stager.stage(c)
    np.testing.assert_array_equal(np.asarray(got), b)
    np.testing.assert_array_equal(np.asarray(stager.latest()), c)
    stager.flush()


def test_c_api_shim_byte_exact(tmp_path):
    """The libasciichat-compatible C API (native/capi.cpp, the BASELINE
    'thin FFI shim' deliverable): a REAL C program links the shim, converts
    a frame, and its output is byte-identical to the Python oracle."""
    import shutil as shutil_mod
    import subprocess
    import sys

    import numpy as np
    import pytest

    if not shutil_mod.which("gcc"):
        pytest.skip("no C compiler")
    from asciichat_tpu.runtime.native_build import BUILD_DIR, load_library

    load_library("capi")  # compiles native/capi.cpp with embed flags
    so = next(BUILD_DIR.glob("libcapi*"), None)
    assert so is not None

    c_src = tmp_path / "drive.c"
    c_src.write_text(r"""
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
extern int asciichat_init(void);
extern char* asciichat_convert(const uint8_t*, int, int, int, int, int, int,
                               const char*, int, size_t*);
extern void asciichat_free(char*);
int main(void) {
  if (asciichat_init() != 0) return 1;
  int w = 64, h = 48;
  uint8_t* rgb = malloc((size_t)w * h * 3);
  for (int y = 0; y < h; y++)
    for (int x = 0; x < w; x++) {
      rgb[(y * w + x) * 3 + 0] = (uint8_t)(x * 255 / (w - 1));
      rgb[(y * w + x) * 3 + 1] = (uint8_t)(y * 255 / (h - 1));
      rgb[(y * w + x) * 3 + 2] = (uint8_t)((x + y) % 256);
    }
  size_t n = 0;
  char* frame = asciichat_convert(rgb, w, h, 40, 10, 0, 0, "standard", 1, &n);
  if (!frame) return 2;
  fwrite(frame, 1, n, stdout);
  asciichat_free(frame);
  return 0;
}
""")
    exe = tmp_path / "drive"
    subprocess.run(
        ["gcc", "-o", str(exe), str(c_src), str(so),
         f"-Wl,-rpath,{BUILD_DIR}"],
        check=True, capture_output=True,
    )
    import os

    env = {**os.environ, "ASCIICHAT_JAX_PLATFORM": "cpu", "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": str(BUILD_DIR.parent.parent)}
    out = subprocess.run([str(exe)], capture_output=True, env=env, timeout=180)
    assert out.returncode == 0, out.stderr.decode()[-2000:]

    from asciichat_tpu.render import oracle
    from asciichat_tpu.render.types import (
        ColorLevel, RenderMode, TerminalCapabilities,
    )

    yy, xx = np.mgrid[0:48, 0:64]
    frame = np.stack([(xx * 255 // 63), (yy * 255 // 47), (xx + yy) % 256],
                     -1).astype(np.uint8)
    caps = TerminalCapabilities(ColorLevel.NONE, RenderMode.FOREGROUND)
    want = oracle.ascii_convert_with_capabilities(frame, 40, 10, caps,
                                                  stretch=True)
    assert out.stdout == want  # byte-identical through the C ABI


def test_native_code_under_sanitizers():
    """ASan/UBSan build of the native pieces (the reference's sanitizer CI
    analog, tests/CMakeLists.txt sanitizer configs): all 10 emitter modes
    over random records with the EXACT production stride formulas, Argon2id,
    secretbox roundtrips, CRC — any overflow/UAF/UB aborts."""
    import shutil as shutil_mod
    import subprocess

    import pytest

    if not shutil_mod.which("g++"):
        pytest.skip("no g++")
    from asciichat_tpu.runtime.native_build import BUILD_DIR, NATIVE_DIR

    exe = BUILD_DIR / "sanitize_harness"
    src = NATIVE_DIR / "sanitize_harness.cpp"
    if not exe.exists() or exe.stat().st_mtime < max(
        p.stat().st_mtime for p in NATIVE_DIR.glob("*.cpp")
    ):
        subprocess.run(
            ["g++", "-O1", "-g", "-fsanitize=address,undefined",
             "-fno-sanitize-recover=all", "-pthread", "-o", str(exe), str(src)],
            check=True, capture_output=True, timeout=300,
        )
    out = subprocess.run([str(exe)], capture_output=True, timeout=300)
    assert out.returncode == 0, (out.stdout + out.stderr).decode()[-3000:]
    assert b"sanitize harness OK" in out.stdout


def test_avshim_under_sanitizers():
    """ASan/UBSan harness for the libavcodec shim (encode/decode roundtrip,
    recorder with audio track, media demux + rewind) — the component where a
    real sws buffer-overrun lived. Third-party one-time allocations
    (x265 encoder bookkeeping) are LSan-suppressed; OUR allocations stay
    leak-checked."""
    import shutil as shutil_mod
    import subprocess

    import pytest

    if not shutil_mod.which("g++"):
        pytest.skip("no g++")
    from asciichat_tpu.runtime.native_build import BUILD_DIR, NATIVE_DIR

    exe = BUILD_DIR / "sanitize_avshim"
    src = NATIVE_DIR / "sanitize_avshim.cpp"
    if not exe.exists() or exe.stat().st_mtime < max(
        src.stat().st_mtime, (NATIVE_DIR / "avshim.cpp").stat().st_mtime
    ):
        try:
            subprocess.run(
                ["g++", "-O1", "-g", "-fsanitize=address,undefined",
                 "-fno-sanitize-recover=all", "-pthread", "-o", str(exe),
                 str(src), "-lavcodec", "-lavformat", "-lavutil", "-lswscale"],
                check=True, capture_output=True, timeout=300,
            )
        except subprocess.CalledProcessError:
            pytest.skip("libav dev libraries not linkable here")
    import os

    env = {**os.environ, "LSAN_OPTIONS":
           f"suppressions={NATIVE_DIR / 'lsan_suppressions.txt'}"}
    out = subprocess.run([str(exe)], capture_output=True, timeout=300, env=env)
    if out.returncode == 77:
        pytest.skip("no HEVC codec in libavcodec")
    assert out.returncode == 0, (out.stdout + out.stderr).decode()[-3000:]
    assert b"sanitize avshim OK" in out.stdout


# --- cross-platform capture + console backends ------------------------------


def test_win_console_mode_bits():
    """Win32 console mode arithmetic (lib/platform/windows/terminal.c
    role) is pure and must hold on any platform: VT processing + no
    newline munging on output; no line/echo/^C cooking + VT input on
    input; unrelated host bits preserved."""
    from asciichat_tpu.utils import platform_win as pw

    out = pw.vt_output_mode(0x0003)  # PROCESSED | WRAP_AT_EOL (host bits)
    assert out & pw.ENABLE_VIRTUAL_TERMINAL_PROCESSING
    assert out & pw.DISABLE_NEWLINE_AUTO_RETURN
    assert out & 0x0002  # host's WRAP_AT_EOL preserved

    raw = pw.raw_input_mode(pw.ENABLE_PROCESSED_INPUT | pw.ENABLE_LINE_INPUT
                            | pw.ENABLE_ECHO_INPUT | 0x0010)
    assert not raw & pw.ENABLE_PROCESSED_INPUT
    assert not raw & pw.ENABLE_LINE_INPUT
    assert not raw & pw.ENABLE_ECHO_INPUT
    assert raw & pw.ENABLE_VIRTUAL_TERMINAL_INPUT
    assert raw & 0x0010  # unrelated host bit preserved


def test_parse_dshow_devices():
    """ffmpeg -list_devices stderr parsing: modern (video)/(audio) markers
    AND the legacy section-header format; alternative-name lines skipped."""
    from asciichat_tpu.runtime.webcam import parse_dshow_devices

    modern = (
        '[dshow @ 0000020af2f0] "Integrated Camera" (video)\n'
        '[dshow @ 0000020af2f0]   Alternative name "@device_pnp_\\\\?\\usb#vid"\n'
        '[dshow @ 0000020af2f0] "OBS Virtual Camera" (video)\n'
        '[dshow @ 0000020af2f0]   Alternative name "@device_sw_{860}"\n'
        '[dshow @ 0000020af2f0] "Microphone (Realtek)" (audio)\n'
        "dummy: Immediate exit requested\n"
    )
    assert parse_dshow_devices(modern) == ["Integrated Camera",
                                           "OBS Virtual Camera"]
    legacy = (
        "[dshow @ 03ae] DirectShow video devices\n"
        '[dshow @ 03ae]  "USB2.0 HD UVC WebCam"\n'
        "[dshow @ 03ae] DirectShow audio devices\n"
        '[dshow @ 03ae]  "Microphone Array"\n'
    )
    assert parse_dshow_devices(legacy) == ["USB2.0 HD UVC WebCam"]


def test_ffmpeg_device_webcam_pipe_path(tmp_path):
    """The FfmpegDeviceWebcam read loop (framing, end-of-stream, error
    propagation) against a FAKE ffmpeg binary emitting rawvideo — the
    same pipe contract the real avfoundation/dshow demuxers use. The real
    binary is absent in this image; on user machines only the argv
    differs."""
    import numpy as np

    from asciichat_tpu.runtime.webcam import FfmpegDeviceWebcam, WebcamUnavailable

    w, h, n = 32, 24, 3
    fake = tmp_path / "ffmpeg"
    fake.write_text(
        "#!/bin/sh\n"
        f"python3 -c 'import sys\n"
        f"for i in range({n}):\n"
        f"    sys.stdout.buffer.write(bytes([i %% 256]) * {w * h * 3})\n"
        f"' \n".replace("%%", "%")
    )
    fake.chmod(0o755)
    import os as _os

    old_path = _os.environ["PATH"]
    _os.environ["PATH"] = f"{tmp_path}:{old_path}"
    try:
        cam = FfmpegDeviceWebcam("avfoundation", "0", width=w, height=h)
        frames = []
        stalls = 0
        while stalls < 20:
            f = cam.read(timeout=1.0)
            if f is None:
                # None = transient stall OR end of stream (the production
                # caller, WebcamSource, retries exactly like this); the
                # fake's interpreter startup can exceed one timeout on a
                # loaded box
                if cam._proc.poll() is not None and len(frames) >= n:
                    break
                stalls += 1
                continue
            frames.append(f)
        cam.close()
        assert len(frames) == n
        assert frames[0].shape == (h, w, 3)
        assert frames[0].dtype == np.uint8
        assert frames[1][0, 0, 0] == 1  # frame content framing is correct

        # a failing device surfaces ffmpeg's stderr as WebcamUnavailable
        bad = tmp_path / "ffmpeg"
        bad.write_text("#!/bin/sh\necho 'Could not find video device' >&2\nexit 1\n")
        cam = FfmpegDeviceWebcam("dshow", "video=Nope", width=w, height=h)
        try:
            cam.read()
            raise AssertionError("expected WebcamUnavailable")
        except WebcamUnavailable as e:
            assert "Could not find video device" in str(e)
        finally:
            cam.close()
    finally:
        _os.environ["PATH"] = old_path


def test_open_webcam_linux_dispatch_unchanged():
    """On Linux the dispatch must still go to the native V4L2 backend
    (gated: no camera in this image -> WebcamUnavailable)."""
    import sys

    import pytest as _pytest

    from asciichat_tpu.runtime.webcam import WebcamUnavailable, open_webcam

    if not sys.platform.startswith("linux"):
        _pytest.skip("linux-only dispatch check")
    import os as _os

    if _os.path.exists("/dev/video0"):
        _pytest.skip("a real camera exists; exercised elsewhere")
    with _pytest.raises(WebcamUnavailable):
        open_webcam()
