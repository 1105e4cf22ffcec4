"""The flagship "model": the server tick — N clients in, N personalized
ASCII-frame records + N audio mixes out, as ONE jitted step.

Replaces the reference server's 2-threads-per-client render fan-out
(src/server/render.c:340,765 + src/server/stream.c:958): per tick the device
executes composite-gather -> per-client color filter -> batched ASCII cell
render -> batched exclude-self audio mix, all fused by XLA. Multi-chip: the
client axis is sharded over the mesh (parallel/mesh.py); the composite gather
needs every client's frame, so XLA inserts an all-gather over ICI there, and
everything downstream stays client-local.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from asciichat_tpu.ops import audio as audio_ops
from asciichat_tpu.ops import cells, compositor, filters
from asciichat_tpu.render import palette as pal
from asciichat_tpu.render.pipeline import RenderPlan, plan_render
from asciichat_tpu.render.types import RenderMode, TerminalCapabilities


@dataclasses.dataclass(frozen=True)
class ServerTickPlan:
    """Static per-layout plan: recomputed on join/leave/resize, not per tick."""

    composite: compositor.CompositePlan
    render: RenderPlan
    num_clients: int
    audio_samples: int


def plan_tick(
    source_sizes: list[tuple[int, int]],
    term_w: int,
    term_h: int,
    caps: TerminalCapabilities,
    num_clients: int | None = None,
    audio_samples: int = audio_ops.AUDIO_FRAME_SAMPLES,
) -> ServerTickPlan:
    comp = compositor.plan_composite(source_sizes, term_w, term_h)
    # Server raises the height cap x2 for half-block clients (stream.c:831);
    # the convert driver then re-doubles into pixel rows (ascii.c:230).
    req_h = term_h * 2 if caps.render_mode == RenderMode.HALF_BLOCK else term_h
    render = plan_render(comp.width_px, comp.height_px, term_w, req_h, caps)
    return ServerTickPlan(comp, render, num_clients or len(source_sizes), audio_samples)


def tick_compute(
    frames: jax.Array,  # uint8 [C, H, W, 3] latest frame per client
    audio: jax.Array,  # float32 [C, N]
    active: jax.Array,  # bool [C]
    mixer_state: tuple,
    ramp: jax.Array,
    tint: jax.Array,
    fg_on_bg: jax.Array,
    is_rainbow: jax.Array,
    filter_on: jax.Array,
    cidx: jax.Array,
    src_y: jax.Array,
    src_x: jax.Array,
    comp_mask: jax.Array,
    *,
    mode: str,
    dst_h: int,
    dst_w: int,
    resized_hook=None,
):
    """The full tick as a pure jittable function — the single source of truth
    also traced by bench.py's server-tick benchmark and
    __graft_entry__.dryrun_multichip (resized_hook lets the dry run insert a
    sharding constraint on the per-client resized batch)."""
    c = frames.shape[0]
    # 1. composite gather (needs all clients -> all-gather over ICI when sharded)
    gathered = frames[cidx, src_y, src_x]
    composite = jnp.where(comp_mask, gathered, jnp.zeros_like(gathered))
    # 2. per-client personalization: replicate + color filter (data, not branches)
    batch = jnp.broadcast_to(composite, (c, *composite.shape))
    batch = filters.apply_color_filter(batch, tint, fg_on_bg, is_rainbow, filter_on)
    # 3. batched ASCII cell render at the clients' terminal geometry
    resized = cells.pixel.resize_nn(batch, dst_h, dst_w)
    if resized_hook is not None:
        resized = resized_hook(resized)
    records = cells._records_for_mode(resized, mode, ramp)
    # 4. exclude-self audio mixes (mixer.c:636 semantics, O(1) per client)
    mixes, mixer_state = audio_ops.mixer_process(audio, active, mixer_state)
    return records, mixes, mixer_state


_tick_step = functools.partial(jax.jit, static_argnames=("mode", "dst_h", "dst_w"))(
    tick_compute
)


class ServerTick:
    """Stateful wrapper owning mixer state + static plan arrays."""

    def __init__(
        self,
        plan: ServerTickPlan,
        palette: str = pal.DEFAULT_PALETTE,
        client_filters: list[str] | None = None,
    ):
        self.plan = plan
        self.palette = palette
        self.ramp = cells.ramp_for_palette(palette)
        c = plan.num_clients
        names = client_filters or ["none"] * c
        tint, fg_on_bg, is_rainbow, enabled = filters.filter_params(names)
        self.tint = jnp.asarray(tint)
        self.fg_on_bg = jnp.asarray(fg_on_bg)
        self.is_rainbow = jnp.asarray(is_rainbow)
        self.filter_on = jnp.asarray(enabled)
        self.cidx = jnp.asarray(np.maximum(plan.composite.client_idx, 0))
        self.comp_mask = jnp.asarray((plan.composite.client_idx >= 0)[..., None])
        self.src_y = jnp.asarray(plan.composite.src_y)
        self.src_x = jnp.asarray(plan.composite.src_x)
        self.mixer_state = audio_ops.MixerState.init(c, c).astuple()

    @property
    def consts(self) -> tuple:
        """The static per-layout arrays, in tick_compute argument order."""
        return (self.ramp, self.tint, self.fg_on_bg, self.is_rainbow,
                self.filter_on, self.cidx, self.src_y, self.src_x, self.comp_mask)

    def step(self, frames, audio, active):
        records, mixes, self.mixer_state = _tick_step(
            frames,
            audio,
            active,
            self.mixer_state,
            self.ramp,
            self.tint,
            self.fg_on_bg,
            self.is_rainbow,
            self.filter_on,
            self.cidx,
            self.src_y,
            self.src_x,
            self.comp_mask,
            mode=self.plan.render.mode,
            dst_h=self.plan.render.dst_h_px,
            dst_w=self.plan.render.dst_w,
        )
        return records, mixes
