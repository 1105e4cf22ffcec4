"""All resize formulations must be bit-identical to the fixed-point C
semantics: gather (reference), MXU one-hot matmul, Pallas kernel (interpret
mode on CPU)."""

import numpy as np
import pytest

from asciichat_tpu.ops import pixel
from asciichat_tpu.render import oracle

from conftest import synthetic_frame


@pytest.mark.parametrize(
    "src,dst",
    [((48, 64), (12, 40)), ((37, 53), (20, 31)), ((16, 16), (40, 80)), ((240, 320), (57, 203))],
)
def test_gather_matches_oracle(src, dst):
    import jax.numpy as jnp

    frame = synthetic_frame(*src, seed=3)
    want = oracle.resize_image(frame, dst_w=dst[1], dst_h=dst[0])
    got = np.asarray(pixel.resize_nn(jnp.asarray(frame[None]), dst[0], dst[1], "gather"))[0]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("src,dst", [((48, 64), (12, 40)), ((240, 320), (57, 203))])
def test_mxu_matches_gather(src, dst):
    import jax.numpy as jnp

    frames = jnp.asarray(np.stack([synthetic_frame(*src, seed=s) for s in range(3)]))
    a = np.asarray(pixel.resize_nn(frames, dst[0], dst[1], "gather"))
    b = np.asarray(pixel.resize_nn(frames, dst[0], dst[1], "mxu"))
    np.testing.assert_array_equal(a, b)


def test_pallas_kernel_matches_gather_interpret():
    import jax.numpy as jnp

    from asciichat_tpu.ops.pallas_resize import resize_nn_pallas

    frames = jnp.asarray(np.stack([synthetic_frame(64, 96, seed=s) for s in range(2)]))
    a = np.asarray(pixel.resize_nn(frames, 17, 41, "gather"))
    b = np.asarray(resize_nn_pallas(frames, 17, 41, interpret=True))
    np.testing.assert_array_equal(a, b)
