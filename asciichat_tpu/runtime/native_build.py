"""Build + load the native C++ runtime pieces (ctypes, no pybind11).

Compiles native/*.cpp into shared libraries on first use and caches the result
next to the sources (rebuilt when the source mtime changes). The reference
builds its runtime in C via CMake (CMakeLists.txt:417); here the native pieces
are small enough that a direct g++ invocation keeps the loop tight.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
import sysconfig
from pathlib import Path

NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
BUILD_DIR = NATIVE_DIR / "build"

from asciichat_tpu.utils.syncdebug import NamedLock

# two threads loading the same library concurrently would compile it twice
# (and one could dlopen a half-written .so) — tracked in the sync registry.
# CROSS-process safety comes from the flock in load_library plus the
# compile-to-temp + atomic os.replace in _compile (an interrupted compile
# can never leave a fresh-mtime corrupt .so behind).
_build_lock = NamedLock("native_build.compile")


def _run_gcc(cmd: list) -> subprocess.CompletedProcess:
    return subprocess.run(cmd, capture_output=True)


def _compile(src: Path, out: Path, extra_flags: tuple[str, ...] = ()) -> None:
    BUILD_DIR.mkdir(parents=True, exist_ok=True)
    # compile to a per-pid temp path, then atomically replace: g++ writing
    # `out` in place meant a concurrent process could dlopen a half-written
    # library, and a Ctrl-C mid-compile left a truncated .so with a fresh
    # mtime that the staleness check would never rebuild
    tmp = out.with_suffix(out.suffix + f".tmp{os.getpid()}")
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        "-o",
        str(tmp),
        str(src),
        *extra_flags,  # -l libs must FOLLOW the source for the linker
    ]
    try:
        # -march=native when the toolchain supports it; fall back silently.
        r = _run_gcc(cmd[:1] + ["-march=native"] + cmd[1:])
        if r.returncode != 0:
            r = _run_gcc(cmd)
        if r.returncode != 0:
            # surface the ACTUAL compiler diagnostics, not a bare exit code
            raise RuntimeError(
                f"native build of {src.name} failed:\n"
                f"{r.stderr.decode(errors='replace')[-4000:]}")
        os.replace(tmp, out)
    finally:
        if tmp.exists():
            tmp.unlink()


def _python_embed_flags() -> tuple[str, ...]:
    """Compile/link flags for embedding this interpreter (the C-API shim)."""
    inc = sysconfig.get_paths()["include"]
    libdir = sysconfig.get_config_var("LIBDIR") or ""
    ldver = sysconfig.get_config_var("LDVERSION") or sysconfig.get_config_var("VERSION")
    return (f"-I{inc}", f"-L{libdir}", f"-lpython{ldver}", "-ldl", "-lm")


# per-library extra compile/link flags (system libraries some shims bind)
LIB_FLAGS: dict[str, tuple[str, ...]] = {
    "avshim": ("-lavcodec", "-lavformat", "-lavutil", "-lswscale"),
    # no Qt dev package on this image: link the runtime .so.5 by exact name
    "qjs": ("-L/usr/lib/x86_64-linux-gnu",
            "-l:libQt5Qml.so.5", "-l:libQt5Core.so.5"),
}


def _lib_flags(name: str) -> tuple[str, ...]:
    if name == "capi":
        return _python_embed_flags()
    return LIB_FLAGS.get(name, ())


def load_library(name: str) -> ctypes.CDLL:
    """Load native/<name>.cpp as a shared library, compiling if stale.

    The in-process NamedLock serializes threads; the flock serializes
    PROCESSES (server + client on one box, parallel pytest workers) so
    only one compiles while the others wait and then load the result."""
    src = NATIVE_DIR / f"{name}.cpp"
    out = BUILD_DIR / f"lib{name}{sysconfig.get_config_var('SHLIB_SUFFIX') or '.so'}"
    with _build_lock:
        if not out.exists() or out.stat().st_mtime < src.stat().st_mtime:
            BUILD_DIR.mkdir(parents=True, exist_ok=True)
            lockf = open(BUILD_DIR / f".{name}.lock", "w")
            try:
                try:
                    import fcntl

                    fcntl.flock(lockf, fcntl.LOCK_EX)
                except ImportError:  # pragma: no cover - non-POSIX
                    pass
                # re-check under the lock: another process may have built it
                if not out.exists() or out.stat().st_mtime < src.stat().st_mtime:
                    _compile(src, out, extra_flags=_lib_flags(name))
            finally:
                lockf.close()  # releases the flock
    return ctypes.CDLL(str(out))


@functools.lru_cache(maxsize=None)
def emitter_lib() -> ctypes.CDLL:
    lib = load_library("emitter")
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    c_int = ctypes.c_int
    c_i64 = ctypes.c_int64

    lib.ac_emit_mono.argtypes = [u8p, c_int, c_int, c_int, u8p, c_int, c_int, u8p, c_i64, i64p, c_int]
    lib.ac_emit_truecolor_fg.argtypes = [u8p, u8p, c_int, c_int, c_int, u8p, c_int, c_int, u8p, c_i64, i64p, c_int]
    lib.ac_emit_indexed.argtypes = [u8p, u8p, c_int, c_int, c_int, c_int, u8p, c_int, c_int, u8p, c_i64, i64p, c_int]
    lib.ac_emit_16_dithered.argtypes = [u8p, u8p, c_int, c_int, c_int, c_int, u8p, u8p, c_int, c_int, u8p, c_i64, i64p, c_int]
    lib.ac_emit_halfblock_truecolor.argtypes = [u8p, u8p, c_int, c_int, c_int, c_int, c_int, u8p, c_i64, i64p, c_int]
    lib.ac_emit_halfblock_indexed.argtypes = [u8p, u8p, u8p, c_int, c_int, c_int, c_int, c_int, c_int, u8p, c_i64, i64p, c_int]
    lib.ac_emit_halfblock_mono.argtypes = [u8p, u8p, c_int, c_int, c_int, c_int, c_int, u8p, c_i64, i64p, c_int]
    for fn in (
        lib.ac_emit_mono,
        lib.ac_emit_truecolor_fg,
        lib.ac_emit_indexed,
        lib.ac_emit_16_dithered,
        lib.ac_emit_halfblock_truecolor,
        lib.ac_emit_halfblock_indexed,
        lib.ac_emit_halfblock_mono,
    ):
        fn.restype = None
    return lib
