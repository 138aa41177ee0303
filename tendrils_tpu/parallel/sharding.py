"""Data-parallel particle sharding over a `jax.sharding.Mesh`.

Layout:
  particles / previous / targets / per-particle constants: sharded on the
  particle axis (`P(None, "dp")`);
  flow / view / color_map / params: replicated.

Collectives: one `psum` of splat partial sums per draw pass, riding ICI.
The logic step is collective-free (particles only read replicated grids).

The carried-force fast path runs PER SHARD: each shard's fused draw emits
its local flow-gather aux stream (ids are local rows), and the next step's
force is gathered from the replicated resolved flow — the sharded frame
pays no in-step gather sort, exactly like the single-chip hot path
(VERDICT r2 item 5).

Multi-host: `make_multihost_mesh` builds a `(hosts, chips)` mesh —
particles shard over BOTH axes flattened (`P(None, ("host", "dp"))`), and
the splat `psum` runs over `("host", "dp")`, which XLA stages as
ICI-reduce within each host first, then the already-reduced partials over
DCN (the chips axis is innermost). On a single host the same code path is
validated by reshaping local devices into `(hosts, chips)` — the
collective/spec composition is identical, only the transport differs.
Call `initialize_distributed()` (a guarded `jax.distributed.initialize`)
before any jax use in a true multi-process launch.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .. import state as state_mod
from ..engine import (EngineConfig, carry_enabled, draw_sim, fast_resolve_ok,
                      force_from_aux, resident_enabled, step_sim)

AXIS = "dp"
HOST_AXIS = "host"


def make_mesh(devices=None, axis=AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def initialize_distributed(**kw):
    """Guarded `jax.distributed.initialize` for multi-host launches: no-op
    when the process is already initialised or single-process with no
    coordinator configured (this box). Safe to call unconditionally at
    program start."""
    import os
    if jax.process_count() > 1:
        return  # already initialised by the launcher
    if "JAX_COORDINATOR_ADDRESS" in os.environ or "coordinator_address" in kw:
        try:
            jax.distributed.initialize(**kw)
        except RuntimeError:
            pass  # already initialised


def make_multihost_mesh(devices=None, hosts=None) -> Mesh:
    """`(hosts, chips)` mesh. With a real multi-process launch, `hosts`
    defaults to `jax.process_count()` and devices enumerate globally
    (host-major, so each host's chips are mesh-contiguous and the inner
    `dp` axis rides ICI). On one host, pass `hosts` explicitly to validate
    the composition on local (virtual) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    hosts = hosts if hosts is not None else max(jax.process_count(), 1)
    if devices.size % hosts:
        raise ValueError(f"{devices.size} devices not divisible by "
                         f"{hosts} hosts")
    return Mesh(devices.reshape(hosts, -1), (HOST_AXIS, AXIS))


def _axes(mesh: Mesh):
    """The particle-sharding axis name(s) of a DP mesh: `"dp"` for the
    single-axis mesh, `("host", "dp")` for the multi-host mesh."""
    names = tuple(mesh.axis_names)
    return names if len(names) > 1 else names[0]


def _sim_specs(force=False, axes=AXIS):
    return state_mod.SimState(
        particles=P(None, axes),
        previous=P(None, axes),
        targets=P(None, axes),
        flow=P(),
        view=P(),
        color_map=P(),
        key=P(),
        idx=P(axes),
        force=(P(None, axes) if force else None),
    )


def shard_sim(sim: state_mod.SimState, mesh: Mesh) -> state_mod.SimState:
    """Place a SimState on the mesh with the standard layout. The carried
    flow force is a single-device cache — dropped here (the first sharded
    frame gathers in-step, then carries per shard)."""
    sim = dataclasses.replace(sim, force=None)
    specs = _sim_specs(axes=_axes(mesh))
    kw = {
        f.name: jax.device_put(getattr(sim, f.name),
                               NamedSharding(mesh, getattr(specs, f.name)))
        for f in dataclasses.fields(sim)
        if getattr(sim, f.name) is not None
    }
    return dataclasses.replace(sim, **kw)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mesh", "targets_live",
                                    "fast_resolve"),
                   donate_argnums=(0,))
def parallel_frame(sim, params, time, dt, cfg: EngineConfig, view_size,
                   mesh: Mesh, targets_live=True, fast_resolve=False):
    """One full step+draw frame, shard_map'd over the particle axis (or
    both axes of a multi-host mesh).

    Grids stay replicated; each shard computes its particles' splat partial
    sums which are `psum`'d before the blend resolve (see
    `engine.draw_sim(axis_name=...)`). Per-particle constants derive from
    the sharded `sim.idx`.

    The body runs the SAME fast-path variant the single-chip `_frame_jit`
    picks (VERDICT r3 item 2): `stepped=True` (a step precedes the draw in
    this trace — drops the p0 sort operand on derive paths), resident
    -stream when `engine.resident_enabled(cfg)` (each shard's exact state
    rides its LOCAL segment sort; the fused `gather_reconstruct_p1` sets
    the carried force inside the draw), and `fast_resolve` (the raw
    11-channel accumulator is psum'd and every shard runs the fused Pallas
    resolve). The sim's only collective remains the accumulator psum.

    With the carry path enabled (`engine.carry_enabled(cfg)`) the output
    sim carries each shard's flow force for the next frame, gathered from
    the replicated resolved flow with the draw's local aux stream — no
    in-step gather sort on later frames. The first frame (force=None in)
    and steady state (force in) are two jit variants, like the single-chip
    engine."""
    axes = _axes(mesh)
    carry = carry_enabled(cfg)
    resident = resident_enabled(cfg)
    in_specs = _sim_specs(force=sim.force is not None, axes=axes)
    out_specs = _sim_specs(force=carry, axes=axes)

    def body(sim, params, time, dt, view_size):
        sim = step_sim(sim, params, time, dt, cfg, view_size)
        if not carry:
            return draw_sim(sim, params, time, cfg, view_size,
                            axis_name=axes, stepped=True,
                            fast_resolve=fast_resolve)
        out = draw_sim(sim, params, time, cfg, view_size,
                       axis_name=axes, want_aux=True, resident=resident,
                       targets_live=targets_live, stepped=True,
                       fast_resolve=fast_resolve, read_time=time + dt,
                       want_eff=fast_resolve, want_force=resident)
        if resident:  # fused gather+reconstruct set sim.force in the draw
            return out[0]
        sim, aux = out[:2]
        eff = out[2] if len(out) > 2 else None
        force = force_from_aux(sim.flow, aux, params, time + dt, cfg,
                               n=sim.particles.shape[1], eff=eff)
        return dataclasses.replace(sim, force=force)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(in_specs, P(), P(), P(), P()),
        out_specs=out_specs,
        check_vma=False)
    return fn(sim, params, time, dt, view_size)


class ParallelTendrils:
    """Multi-chip engine facade: same API shape as `engine.Tendrils`, with
    the frame dispatched through `parallel_frame` over a device mesh."""

    def __init__(self, engine, mesh: Mesh | None = None):
        from ..engine import Tendrils
        assert isinstance(engine, Tendrils)
        self.engine = engine
        self.mesh = mesh or make_mesh()
        n_dev = self.mesh.devices.size
        n = engine.config.n
        if n % n_dev:
            raise ValueError(
                f"particle count {n} not divisible by {n_dev} devices")
        engine.sim = shard_sim(engine.sim, self.mesh)

    def frame(self):
        eng = self.engine
        eng.timer.tick()
        eng._check_force_params()
        if eng.timer.paused:
            return self
        eng.sim = parallel_frame(
            eng.sim, eng.params(),
            jax.numpy.float32(eng.timer.time), jax.numpy.float32(eng.timer.dt),
            eng.config, eng._view_size, self.mesh,
            targets_live=eng._targets_live,
            fast_resolve=fast_resolve_ok(eng.config, eng.state))
        return self
