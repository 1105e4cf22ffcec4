"""Host -> HBM double-buffered frame staging.

The reference overlaps decode with rendering via its 3-thread pipeline and
bounded queues (src/common/session/pipeline.c, SURVEY §2e.2); the TPU-native
equivalent overlaps HOST->DEVICE transfer with device compute: two staging
slots, `stage()` starts an async device_put of the incoming batch (JAX
transfers are asynchronous) and returns the PREVIOUS batch, which is already
resident and ready to feed the render kernels while the new one streams in.
"""

from __future__ import annotations

import jax
import numpy as np


class DeviceFrameStager:
    """Two-slot H2D pipeline: upload of batch N overlaps compute on N-1."""

    def __init__(self, device=None, sharding=None):
        self._dst = sharding if sharding is not None else (device or jax.devices()[0])
        self._slots: list[jax.Array | None] = [None, None]
        self._next = 0
        self.staged = 0

    def stage(self, frames: np.ndarray) -> jax.Array | None:
        """Start uploading `frames`; return the previously staged device batch
        (None on the first call, when nothing is resident yet)."""
        slot = self._next
        self._next = 1 - slot
        ready = self._slots[self._next]  # the other slot: previous upload
        self._slots[slot] = jax.device_put(frames, self._dst)  # async
        self.staged += 1
        return ready

    def latest(self) -> jax.Array | None:
        """The most recently staged batch (may still be in flight; consuming
        it in a jit computation synchronizes naturally)."""
        return self._slots[1 - self._next]

    def flush(self) -> None:
        for s in self._slots:
            if s is not None:
                jax.block_until_ready(s)
