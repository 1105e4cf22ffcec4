"""Test config: force an 8-device virtual CPU mesh BEFORE jax import.

Multi-chip sharding paths are validated on host CPU devices (the driver
separately dry-runs dryrun_multichip); real-TPU numbers come from bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the remote-TPU backend and overrides
# JAX_PLATFORMS; override it back so tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def synthetic_frame(h: int, w: int, seed: int = 0) -> np.ndarray:
    """Deterministic gradient+noise test pattern (mirrors the reference's
    --test-pattern synthetic webcam, lib/video/webcam/webcam.c:21-27)."""
    gen = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((xx + yy) % 256).astype(np.uint8)
    base = np.stack([r, g, b], axis=-1)
    noise = gen.integers(0, 32, (h, w, 3), dtype=np.uint8)
    return (base.astype(np.int32) + noise).clip(0, 255).astype(np.uint8)


@pytest.fixture
def test_pattern():
    return synthetic_frame
