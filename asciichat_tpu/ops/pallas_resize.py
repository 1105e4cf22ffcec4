"""Pallas TPU kernel: fused nearest-neighbour resize via block-DMA + MXU
column selection.

The hot path of the whole framework is the 16.16 fixed-point NN downscale
(image_resize_interpolation, image.c:267-328) feeding the ASCII renderers.
Device formulations (see ops/pixel.py): XLA gather (scalar-core bound, ~15k
fps at 1080p->203x57 B=64) and one-hot double matmul on the MXU (~80k fps at
B=128, the current production path), which streams the FULL 6.2 MB frame
through the row-selection matmul. This kernel instead only moves the sampled
rows:

STATUS: bit-exact (golden-tested) but currently SLOWER than the MXU einsum
path (~7.6k fps): issuing DH manual DMAs per grid program from a fori_loop
serializes on the scalar core. The XLA-level variants of the same idea were
also measured on the real chip (2026-08-17, B=128 1080p->57x203):
  mxu full-frame einsum (production) : 105k fps ( 9.5 us/frame)
  jnp.take rows + einsum cols        :  24k fps (42.2 us/frame)
  static-slice concat rows + einsum  :  47k fps (21.1 us/frame)
i.e. every sparse-row formulation loses to streaming the full 6.2 MB frame
through the MXU: 57 scattered single-row fetches are DMA-DESCRIPTOR-bound
(~0.5-1 us each on the scalar core), and 9.5 us/frame is already within
~25% of the 7.6 us full-read HBM bound — the matmul IS the speed-of-light
formulation here. Kept for reference and for the interpret-mode golden
test; the production path stays ops/pixel.resize_nn("mxu").

- ROW fetch is pure data movement: for each of the DH output rows, one async
  DMA copies the 8-row-aligned source block containing the sampled row,
  HBM -> VMEM (Mosaic DMAs must slice on leading dims / tile-aligned bounds,
  hence blocks of 8 rows, an 8x overfetch that is still ~19x less than the
  full frame). `sy` block indices arrive via scalar prefetch and drive
  `frames.at[b, blk[y]]` index maps.
- WITHIN-BLOCK row pick is an exact int32 one-hot multiply-sum on the VPU
  (8 candidates per output row).
- COLUMN selection rides the MXU: one dot_general per frame against a one-hot
  bf16 selector over channel-interleaved columns. uint8 <= 255 < 2^8 is exact
  in bfloat16 and each output element accumulates exactly one nonzero product
  in f32, so the whole kernel is bit-identical to the C resize.

Layout notes: VMEM tiles are (sublane, 128-lane) on the LAST TWO dims, so all
row buffers are channel-flattened [.., W*3] and per-row slicing happens on
leading dims only. Callers reshape [B, DH, DW*3] -> [B, DH, DW, 3] outside
(free in XLA). Mosaic lacks u8<->bf16/f32->u8 casts; we bounce through int32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asciichat_tpu.utils.aspect import resize_indices

ROW_BLOCK = 8


def _resize_kernel(dst_h: int):
    def kernel(blk_ref, frames_ref, sel_ref, onehot_ref, out_ref, blockbuf, sems):
        b = pl.program_id(0)

        def start_dma(y, carry):
            pltpu.make_async_copy(
                frames_ref.at[b, blk_ref[y]], blockbuf.at[y], sems.at[y]
            ).start()
            return carry

        jax.lax.fori_loop(0, dst_h, start_dma, None)

        def wait_dma(y, carry):
            pltpu.make_async_copy(
                frames_ref.at[b, blk_ref[y]], blockbuf.at[y], sems.at[y]
            ).wait()
            return carry

        jax.lax.fori_loop(0, dst_h, wait_dma, None)

        blocks = blockbuf[...].astype(jnp.int32)  # [DH, 8, W*3]
        onehot = onehot_ref[...]  # [DH, 8] int32
        rows = jnp.sum(blocks * onehot[:, :, None], axis=1)  # exact row pick
        picked = jax.lax.dot_general(
            rows.astype(jnp.bfloat16),
            sel_ref[...],  # [DW*3, W*3] one-hot bf16
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [DH, DW*3]
        out_ref[0] = picked.astype(jnp.int32).astype(jnp.uint8)

    return kernel


@functools.partial(jax.jit, static_argnames=("dst_h", "dst_w", "interpret"))
def resize_nn_pallas(
    frames: jax.Array, dst_h: int, dst_w: int, interpret: bool = False
) -> jax.Array:
    """uint8 [B, H, W, 3] -> [B, dst_h, dst_w, 3], bit-exact NN resize.
    Requires H % 8 == 0 (pad on host otherwise; sampled indices are clamped
    so padding rows are never selected when H is already a multiple of 8)."""
    b, src_h, src_w, c = frames.shape
    assert c == 3
    pad_h = (-src_h) % ROW_BLOCK
    if pad_h:
        frames = jnp.pad(frames, ((0, 0), (0, pad_h), (0, 0), (0, 0)))
    n_blocks = (src_h + pad_h) // ROW_BLOCK
    flat = frames.reshape(b, n_blocks, ROW_BLOCK, src_w * 3)

    sy = resize_indices(src_h, dst_h)
    blk = (sy // ROW_BLOCK).astype(np.int32)
    off = (sy % ROW_BLOCK).astype(np.int32)
    onehot = np.zeros((dst_h, ROW_BLOCK), np.int32)
    onehot[np.arange(dst_h), off] = 1

    sx_idx = resize_indices(src_w, dst_w)
    sel = np.zeros((dst_w * 3, src_w * 3), np.float32)
    for ch in range(3):
        sel[np.arange(dst_w) * 3 + ch, sx_idx * 3 + ch] = 1.0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # frames stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # one-hot column selector
            pl.BlockSpec(memory_space=pltpu.VMEM),  # within-block row one-hot
        ],
        out_specs=pl.BlockSpec(
            (1, dst_h, dst_w * 3), lambda i, blk: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((dst_h, ROW_BLOCK, src_w * 3), jnp.uint8),
            pltpu.SemaphoreType.DMA((dst_h,)),
        ],
    )
    out = pl.pallas_call(
        _resize_kernel(dst_h),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, dst_h, dst_w * 3), jnp.uint8),
        interpret=interpret,
    )(jnp.asarray(blk), flat, jnp.asarray(sel, jnp.bfloat16), jnp.asarray(onehot))
    return out.reshape(b, dst_h, dst_w, 3)
