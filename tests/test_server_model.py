"""Server tick model + color filters + multi-chip sharding equivalence."""

import numpy as np
import pytest

from asciichat_tpu.ops import filters
from asciichat_tpu.render.types import ColorLevel, RenderMode, TerminalCapabilities

from conftest import synthetic_frame


@pytest.mark.parametrize("name", ["green", "black", "white", "pink", "rainbow"])
def test_color_filter_matches_reference(name):
    import jax.numpy as jnp

    frame = synthetic_frame(20, 30, seed=4)
    want = filters.apply_color_filter_reference(frame, name, time_s=1.25)
    tint, fg_on_bg, is_rainbow, enabled = filters.filter_params([name], time_s=1.25)
    got = np.asarray(
        filters.apply_color_filter(
            jnp.asarray(frame[None]),
            jnp.asarray(tint),
            jnp.asarray(fg_on_bg),
            jnp.asarray(is_rainbow),
            jnp.asarray(enabled),
        )
    )[0]
    np.testing.assert_array_equal(got, want)


def test_filter_none_passthrough():
    import jax.numpy as jnp

    frame = synthetic_frame(8, 8, seed=1)
    tint, fg_on_bg, is_rainbow, enabled = filters.filter_params(["none"])
    got = np.asarray(
        filters.apply_color_filter(
            jnp.asarray(frame[None]), jnp.asarray(tint), jnp.asarray(fg_on_bg),
            jnp.asarray(is_rainbow), jnp.asarray(enabled)
        )
    )[0]
    np.testing.assert_array_equal(got, frame)


def test_server_tick_end_to_end():
    import jax.numpy as jnp

    from asciichat_tpu.models.server import ServerTick, plan_tick
    from asciichat_tpu.ops import cells
    from asciichat_tpu.render import emitter, oracle

    C = 3
    frames = np.stack([synthetic_frame(60, 80, seed=i) for i in range(C)])
    sizes = [(80, 60)] * C
    caps = TerminalCapabilities(ColorLevel.TRUECOLOR, RenderMode.HALF_BLOCK)
    plan = plan_tick(sizes, term_w=120, term_h=40, caps=caps)
    tick = ServerTick(plan)
    audio = np.random.default_rng(0).normal(0, 0.1, (C, 480)).astype(np.float32)
    records, mixes = tick.step(
        jnp.asarray(frames), jnp.asarray(audio), jnp.ones(C, bool)
    )
    assert np.asarray(mixes).shape == (C, 480)

    # per-client frames must be byte-exact vs the oracle applied to the
    # composite (the per-client convert path, stream.c:790-854)
    from asciichat_tpu.ops.compositor import composite_reference

    comp = composite_reference(frames, plan.composite)
    host = cells.records_to_numpy(records)
    outs = emitter.emit_frames(host, plan.render.mode, pad_w=plan.render.pad_w,
                               pad_h=plan.render.pad_h)
    want = oracle.ascii_convert_with_capabilities(comp, 120, 80, caps)
    for c in range(C):
        assert outs[c] == want  # no filters -> identical personalized frames


def test_server_tick_sharded_equals_single():
    """The sharded tick must produce identical records to single-device."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from asciichat_tpu.models.server import ServerTick, plan_tick
    from asciichat_tpu.parallel import mesh as meshlib

    C = 8
    frames = np.stack([synthetic_frame(24, 32, seed=i) for i in range(C)])
    audio = np.random.default_rng(1).normal(0, 0.1, (C, 480)).astype(np.float32)
    caps = TerminalCapabilities(ColorLevel.TRUECOLOR, RenderMode.FOREGROUND)
    plan = plan_tick([(32, 24)] * C, term_w=64, term_h=20, caps=caps)

    tick1 = ServerTick(plan)
    rec1, mix1 = tick1.step(jnp.asarray(frames), jnp.asarray(audio), jnp.ones(C, bool))

    mesh = meshlib.make_mesh(8)
    sh = NamedSharding(mesh, P(meshlib.CLIENTS_AXIS))
    tick2 = ServerTick(plan)
    rec2, mix2 = tick2.step(
        jax.device_put(frames, sh), jax.device_put(audio, sh),
        jax.device_put(np.ones(C, bool), sh),
    )
    for k in rec1:
        np.testing.assert_array_equal(np.asarray(rec1[k]), np.asarray(rec2[k]))
    np.testing.assert_allclose(np.asarray(mix1), np.asarray(mix2), rtol=1e-6, atol=1e-7)


def test_graft_entry():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out["rgb"].shape == (2, 28, 80, 3)
    g.dryrun_multichip(8)


def test_sharded_tick_inserts_collectives():
    """The compiled multi-chip tick must contain an all-gather (the composite
    needs every client's frame) — evidence XLA routes it over the mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from asciichat_tpu.models.server import ServerTick, plan_tick, tick_compute
    from asciichat_tpu.parallel import mesh as meshlib
    from asciichat_tpu.render.types import ColorLevel, RenderMode, TerminalCapabilities

    C = 8
    mesh = meshlib.make_mesh(8)
    plan = plan_tick([(32, 24)] * C, term_w=64, term_h=20,
                     caps=TerminalCapabilities(ColorLevel.TRUECOLOR, RenderMode.FOREGROUND))
    tick = ServerTick(plan)
    sh = NamedSharding(mesh, P(meshlib.CLIENTS_AXIS))
    frames = jax.device_put(np.zeros((C, 24, 32, 3), np.uint8), sh)
    audio = jax.device_put(np.zeros((C, 480), np.float32), sh)
    active = jax.device_put(np.ones(C, bool), sh)
    state = tuple(jax.device_put(np.asarray(x), sh) for x in tick.mixer_state)

    import functools

    fn = functools.partial(tick_compute, mode=plan.render.mode,
                           dst_h=plan.render.dst_h_px, dst_w=plan.render.dst_w)
    lowered = jax.jit(fn).lower(frames, audio, active, state, *tick.consts)
    hlo = lowered.compile().as_text()
    assert "all-gather" in hlo or "all-reduce" in hlo or "collective" in hlo, (
        "expected a cross-device collective in the compiled sharded tick"
    )
