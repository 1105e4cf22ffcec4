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


def _topology_key() -> str:
    """Partition the cache by the execution topology knobs this repo
    actually varies. INCIDENT (2026-08-17): with one shared directory, an
    executable compiled under plain 1-device CPU (tools/soak_mixed.py)
    was replayed inside the test environment's 8-virtual-device CPU mesh
    (conftest's xla_force_host_platform_device_count=8) and produced
    silently wrong results — test_mixed_codec_population's audio mix came
    back all-zeros, deterministically, until the cache was cleared. The
    persistent-cache key evidently does not cover everything these flags
    change, so the directory does."""
    import jax

    plats = str(jax.config.jax_platforms or "default").replace(",", "+")
    hostdev = "1"
    for part in os.environ.get("XLA_FLAGS", "").split():
        if "xla_force_host_platform_device_count=" in part:
            hostdev = part.rsplit("=", 1)[1]
    return f"{plats}-hd{hostdev}-{_machine_key()}"


def _machine_key() -> str:
    """Fingerprint of the HOST CPU features. XLA:CPU persists AOT results
    compiled for the build machine's exact feature set; replayed on a host
    of a different generation they load with a 'could lead to SIGILL'
    warning (observed 2026-08-18: +amx/+avx512 executables from a prior
    session's host loaded on one without prefer-no-scatter support). The
    shared ~/.cache can outlive a host, so the directory must not."""
    import hashlib
    import platform

    feat = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feat += line
                    break
    except OSError:
        pass
    return hashlib.sha256(feat.encode()).hexdigest()[:10]


_key_applied: str | None = None


def ensure() -> None:
    """Point JAX at a persistent compilation cache dir for the CURRENT
    topology.

    Called ONLY from the real-device entry points (bench.py,
    __graft_entry__) — the cache exists to keep tunneled-TPU compiles
    from repeating, not to micro-optimize CPU test runs, and the smaller
    the population surface the smaller the contamination surface.

    Re-entrant with a topology re-check: entry() then dryrun_multichip(8)
    in ONE process changes platform + device count, and a once-latched
    directory would persist the 8-device executables into the 1-device
    partition — the exact poisoning incident the key exists to prevent."""
    global _key_applied
    if "PYTEST_CURRENT_TEST" in os.environ:
        # the CPU test suite must stay out entirely: one test calling
        # entry() would otherwise enable the cross-run cache for the whole
        # session, making test results order- and ~/.cache-dependent
        return
    try:
        import jax

        key = _topology_key()
        if key == _key_applied:
            return
        if _key_applied is None and jax.config.jax_compilation_cache_dir:
            _key_applied = key
            return  # operator already configured one; never fight it
        path = os.path.join(
            os.environ.get(
                "ASCIICHAT_JAX_CACHE",
                os.path.join(os.path.expanduser("~"), ".cache",
                             "asciichat_jax")),
            key)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache almost everything: the server's per-geometry group steps
        # compile in ~0.1-0.4 s EACH on XLA:CPU, under the old 0.5 s gate —
        # but a 9-client soak compiles dozens of them (4 geometries x
        # layout churn), so nothing persisted while warmup still cost
        # minutes and a ~2.3 GB LLVM-arena RSS peak per process. Disk I/O
        # for a cache hit is ~1 ms; only sub-10 ms throwaway graphs stay out.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.01)
        _key_applied = key
    except Exception:
        pass  # never let cache plumbing break a compute path
