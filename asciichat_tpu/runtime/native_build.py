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
# (and one could dlopen a half-written .so) — tracked in the sync registry
_build_lock = NamedLock("native_build.compile")


def _compile(src: Path, out: Path, extra_flags: tuple[str, ...] = ()) -> None:
    BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        "-o",
        str(out),
        str(src),
        *extra_flags,  # -l libs must FOLLOW the source for the linker
    ]
    # -march=native when the toolchain supports it; fall back silently.
    native_cmd = cmd[:1] + ["-march=native"] + cmd[1:]
    try:
        subprocess.run(native_cmd, check=True, capture_output=True)
        return
    except (subprocess.CalledProcessError, FileNotFoundError):
        pass
    subprocess.run(cmd, check=True, capture_output=True)


def _python_embed_flags() -> tuple[str, ...]:
    """Compile/link flags for embedding this interpreter (the C-API shim)."""
    inc = sysconfig.get_paths()["include"]
    libdir = sysconfig.get_config_var("LIBDIR") or ""
    ldver = sysconfig.get_config_var("LDVERSION") or sysconfig.get_config_var("VERSION")
    return (f"-I{inc}", f"-L{libdir}", f"-lpython{ldver}", "-ldl", "-lm")


# per-library extra compile/link flags (system libraries some shims bind)
LIB_FLAGS: dict[str, tuple[str, ...]] = {
    "avshim": ("-lavcodec", "-lavformat", "-lavutil", "-lswscale"),
}


def _lib_flags(name: str) -> tuple[str, ...]:
    if name == "capi":
        return _python_embed_flags()
    return LIB_FLAGS.get(name, ())


def load_library(name: str) -> ctypes.CDLL:
    """Load native/<name>.cpp as a shared library, compiling if stale."""
    src = NATIVE_DIR / f"{name}.cpp"
    out = BUILD_DIR / f"lib{name}{sysconfig.get_config_var('SHLIB_SUFFIX') or '.so'}"
    with _build_lock:
        if not out.exists() or out.stat().st_mtime < src.stat().st_mtime:
            _compile(src, out, extra_flags=_lib_flags(name))
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
