"""Spatially partitioned grids: row slabs + reduce-scatter (SURVEY §2.9).

The default data-parallel layout (`parallel.sharding`) replicates the flow
and view grids on every device and `psum`s full-grid splat partials — fine
at 1080p, but at 4K+ each chip then holds every grid and the all-reduce
moves `2·(D-1)/D · C·H·W·4` bytes per frame. This module keeps particles
data-parallel but shards the GRIDS by row slabs:

  - each shard still accumulates its own particles' full-grid splat
    partials (deposits are unconstrained — a particle may land anywhere),
  - the partials are `psum_scatter`'d over rows, so each device reduces,
    RESOLVES and STORES only its `H/D`-row slab (collective: one
    reduce-scatter = half an all-reduce's bytes),
  - the next step's flow read `all_gather`s only the 2 pre-decayed
    effective-velocity channels (not the 4-channel payload).

ICI bytes per device per frame, MEASURED from the compiled HLO's actual
collectives (`scripts/ici_bytes.py`, ring model, 8-device mesh, 1080p —
both ratios are resolution-independent since every collective is
grid-proportional):
  replicate+psum: one 12-channel all-reduce  = 166.1 MB moved/device
  slab mode: 12ch reduce-scatter + 2ch all-gather = 96.9 MB  (**0.583x**)
At 4K the same ratio holds over 4x the bytes; grids held per device drop
to 1/8 and the blend resolve runs on 1/8 of the pixels. The reference has
no multi-device analogue (SURVEY §2.9) — this is the TPU-native design
for high-resolution scaling.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import state as state_mod
from ..engine import EngineConfig
from ..ops import coords, flow as flow_ops, logic, render, sample
from ..ops import splat as splat_ops
from .sharding import AXIS, make_mesh  # noqa: F401  (re-export make_mesh)


def _sim_specs(force=False):
    return state_mod.SimState(
        particles=P(None, AXIS),
        previous=P(None, AXIS),
        targets=P(None, AXIS),
        flow=P(None, AXIS, None),   # row slabs
        view=P(None, None, AXIS, None),
        color_map=P(),
        key=P(),
        idx=P(AXIS),
        force=(P(None, AXIS) if force else None),
    )


def shard_sim_spatial(sim: state_mod.SimState, mesh: Mesh):
    """Place a SimState with row-slab grids on the mesh."""
    sim = dataclasses.replace(sim, force=None)
    specs = _sim_specs()
    kw = {
        f.name: jax.device_put(getattr(sim, f.name),
                               NamedSharding(mesh, getattr(specs, f.name)))
        for f in dataclasses.fields(sim)
        if getattr(sim, f.name) is not None
    }
    return dataclasses.replace(sim, **kw)


def _slab_carry(cfg: EngineConfig) -> bool:
    """Whether the slab frame carries the next step's flow force (fused
    Pallas path only — the draw's segment sort doubles as the gather
    binning, exactly like `engine.carry_enabled`)."""
    from ..engine import carry_enabled
    return carry_enabled(cfg)


def _slab_step(sim, params, time, dt, cfg: EngineConfig, view_size):
    """The slab-mode logic step (shard_map body fragment): flow force from
    the carried per-shard force when present, else gathered from the
    all-gathered 2-channel effective velocity — through the Pallas binned
    gather on the pallas backend (the XLA `jnp.take` gather costs
    ~1 µs/element on real TPU, VERDICT r3 item 4)."""
    h, w = cfg.view_res
    uv, index01, _ = state_mod.particle_coords_from_idx(sim.idx,
                                                        cfg.root_num)
    if sim.force is not None:
        force = sim.force

        def flow_force_fn(pos_screen):
            del pos_screen
            return force
    else:
        eff_local = sim.flow[:2] * jnp.maximum(
            0.0, 1.0 - (time - sim.flow[2]) * params["flowDecay"])[None]
        eff = jax.lax.all_gather(eff_local, AXIS, axis=1, tiled=True)

        if cfg.gather_backend == "pallas":
            from ..ops.gather_pallas import bilinear_gather

            def flow_force_fn(pos_screen):
                u = pos_screen * 0.5 + 0.5
                return bilinear_gather(eff, u[..., 0] * w, u[..., 1] * h)
        else:
            def flow_force_fn(pos_screen):
                u = pos_screen * 0.5 + 0.5
                return sample.bilinear_sample(eff, u[..., 0] * w,
                                              u[..., 1] * h)

    new_particles = logic.step_particles(
        sim.particles, None, sim.targets, params, uv, index01,
        view_size, time, dt, flow_force_fn=flow_force_fn)
    return dataclasses.replace(sim, particles=new_particles,
                               previous=sim.particles, force=None)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"),
                   donate_argnums=(0,))
def spatial_frame(sim, params, time, dt, cfg: EngineConfig, view_size,
                  mesh: Mesh):
    """One step+draw frame with row-slab grids (see module docstring).

    Constraints: `flow_res == view_res`, H divisible by the mesh size,
    one view buffer, one flow LOD (the slab all-gather covers level 0).

    On the fused Pallas path the frame CARRIES each shard's flow force
    (`_slab_carry`): the draw's segment sort emits the gather aux stream,
    the 2-channel eff all-gather moves from step time to the draw tail
    (same ICI bytes), and later steps pay no gather sort at all."""
    n_dev = mesh.devices.size
    h, w = cfg.view_res
    assert cfg.flow_shape == cfg.view_res, "slab mode shares one grid shape"
    assert h % n_dev == 0, f"H={h} not divisible by {n_dev} devices"
    assert cfg.num_view_buffers == 1 and cfg.flow_levels == 1

    carry = _slab_carry(cfg)
    in_specs = _sim_specs(force=sim.force is not None)
    out_specs = _sim_specs(force=carry)

    def body(sim, params, time, dt, view_size):
        # --- step (ref src/index.js:248-272).
        sim = _slab_step(sim, params, time, dt, cfg, view_size)
        _, _, colormap_uv = state_mod.particle_coords_from_idx(
            sim.idx, cfg.root_num)

        # --- draw (ref src/index.js:278-340), slab-resolved.
        from ..const import INERT
        pos = sim.particles[:2]
        vel = sim.particles[2:]
        prev_pos = sim.previous[:2]
        alive = ((pos[0] != INERT) | (pos[1] != INERT)) & \
                ((prev_pos[0] != INERT) | (prev_pos[1] != INERT))
        live = alive.astype(jnp.float32)

        p_clip0 = jnp.stack([prev_pos[0] * view_size[0],
                             prev_pos[1] * view_size[1]], axis=-1)
        p_clip1 = jnp.stack([pos[0] * view_size[0],
                             pos[1] * view_size[1]], axis=-1)
        p0 = coords.clip_to_pixel(p_clip0, (w, h))
        p1 = coords.clip_to_pixel(p_clip1, (w, h))

        def scatter_rows(parts):
            num, wsum, logt = parts
            return (jax.lax.psum_scatter(num, AXIS, scatter_dimension=1,
                                         tiled=True),
                    jax.lax.psum_scatter(wsum, AXIS, scatter_dimension=0,
                                         tiled=True),
                    jax.lax.psum_scatter(logt, AXIS, scatter_dimension=0,
                                         tiled=True))

        view0 = sim.view[0]
        view0 = view0 * (1.0 - params["autoClearView"])
        view0 = render.fade_fill(view0,
                                 params["fadeColor"] * params["autoFade"])

        if cfg.splat_backend == "pallas" and cfg.fused_draw:
            # Fused Pallas accumulate (one sort + one splat kernel for both
            # passes, the single-chip fast path) — full-grid partials per
            # shard, reduce-scattered to this shard's slab (VERDICT r2
            # item 6). With the carry path, the same segment sort emits the
            # flow-gather aux stream for the next step's force.
            from ..ops.draw_pallas import (_widen_excess,
                                           fused_draw_accumulate)
            from ..engine import force_from_aux
            mapped = sample.sample_uv(sim.color_map, colormap_uv.T) \
                * params["colorMapAlpha"]
            n_local = sim.particles.shape[1]
            out = fused_draw_accumulate(
                (h, w), p0, p1, vel, pos, mapped, live,
                params["speedLimit"], time, samples=cfg.view_samples,
                idx=(jnp.arange(n_local, dtype=jnp.int32) if carry
                     else None),
                flow_width=params["flowWidth"],
                line_width=params["lineWidth"],
                speed_alpha=params["speedAlpha"],
                sin_decay=jnp.sin(time * params["flowDecay"]),
                flow_decay=params["flowDecay"],
                base_color=params["baseColor"],
                flow_color=params["flowColor"])
            fp, vp = out[:2]
            # Width excess blurs cross slab rows — apply on the full
            # partials (linear, commutes with the psum) before scattering.
            flow_parts = scatter_rows(_widen_excess(fp, params["flowWidth"]))
            view_parts = scatter_rows(_widen_excess(vp, params["lineWidth"]))
            new_flow = splat_ops.composite_over(sim.flow, *flow_parts)
            view0 = splat_ops.composite_over(view0, *view_parts)
            sim = dataclasses.replace(sim, flow=new_flow,
                                      view=sim.view.at[0].set(view0))
            if carry:
                # Next step's force NOW (the step-time all-gather moves
                # here — same ICI bytes/frame — and the draw sort already
                # binned the stream, so no gather sort remains anywhere).
                read_time = time + dt
                eff_local = new_flow[:2] * jnp.maximum(
                    0.0, 1.0 - (read_time - new_flow[2])
                    * params["flowDecay"])[None]
                eff = jax.lax.all_gather(eff_local, AXIS, axis=1,
                                         tiled=True)
                force = force_from_aux(None, out[2], params, read_time,
                                       cfg, n=n_local, eff=eff)
                sim = dataclasses.replace(sim, force=force)
            return sim

        # Generic XLA backend: two separate passes.
        payload = flow_ops.flow_payload(vel, time, params["speedLimit"])
        flow_parts = scatter_rows(splat_ops.splat_segments_accumulate(
            p0, p1, payload, payload[3] * live, grid_hw=(h, w),
            width=params["flowWidth"], samples=cfg.flow_samples,
            rows=cfg.flow_rows, backend="xla"))
        new_flow = splat_ops.composite_over(sim.flow, *flow_parts)

        colors = render.particle_colors(pos, vel, colormap_uv,
                                        sim.color_map, params, time)
        view_parts = scatter_rows(splat_ops.splat_segments_accumulate(
            p0, p1, colors, colors[3] * live, grid_hw=(h, w),
            width=params["lineWidth"], samples=cfg.view_samples,
            rows=cfg.view_rows, backend="xla"))
        view0 = splat_ops.composite_over(view0, *view_parts)

        return dataclasses.replace(sim, flow=new_flow,
                                   view=sim.view.at[0].set(view0))

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(in_specs, P(), P(), P(), P()),
        out_specs=out_specs,
        check_vma=False)
    return fn(sim, params, time, dt, view_size)


class SpatialTendrils:
    """Multi-chip facade with row-slab grids (`spatial_frame`)."""

    def __init__(self, engine, mesh: Mesh | None = None):
        self.engine = engine
        self.mesh = mesh or make_mesh()
        n_dev = self.mesh.devices.size
        h, _ = engine.config.view_res
        if engine.config.n % n_dev or h % n_dev:
            raise ValueError("particles and grid rows must divide the mesh")
        engine.sim = shard_sim_spatial(engine.sim, self.mesh)

    def frame(self):
        eng = self.engine
        eng.timer.tick()
        eng._check_force_params()
        if eng.timer.paused:
            return self
        eng.sim = spatial_frame(
            eng.sim, eng.params(), jnp.float32(eng.timer.time),
            jnp.float32(eng.timer.dt), eng.config, eng._view_size,
            self.mesh)
        return self
