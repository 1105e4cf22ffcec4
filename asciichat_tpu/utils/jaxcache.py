"""Persistent XLA compilation cache.

Every device entry point calls `ensure()` once: compiled executables land
in an on-disk cache keyed by (HLO, compiler version, backend), so graphs
any prior process compiled (the bench's K-step fori loops and the server
tick are the expensive ones) load instead of recompiling. A libtpu/jaxlib
upgrade changes the key and simply misses — the r02 libtpu-drift failure
mode cannot poison it.

Scope note (measured 2026-08-17): the wild 30 s-10 min wall-clock variance
of first-touch device runs on THIS session's tunneled TPU is dispatch and
transfer latency on the axon tunnel, NOT compilation — the 40x12 convert
compiles in 0.48 s. The cache removes the genuinely-slow compiles; it
cannot help the tunnel. On normal (PCIe-attached) hardware neither cost
exists at this scale.
"""

from __future__ import annotations

import os

_done = False


def ensure() -> None:
    """Idempotently point JAX at a persistent compilation cache dir."""
    global _done
    if _done:
        return
    _done = True
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return  # operator already configured one
        path = os.environ.get(
            "ASCIICHAT_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "asciichat_jax"))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took meaningful compile time; tiny CPU
        # test graphs stay out (they recompile faster than disk I/O)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # never let cache plumbing break a compute path
