"""Data-parallel particle sharding over a `jax.sharding.Mesh`.

Layout:
  particles / previous / targets / per-particle constants: sharded on the
  particle axis (`P(None, "dp")`);
  flow / view / color_map / params: replicated.

Collectives: one `psum` of splat partial sums per draw pass, riding ICI.
The logic step is collective-free (particles only read replicated grids).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .. import state as state_mod
from ..engine import EngineConfig, draw_sim, step_sim

AXIS = "dp"


def make_mesh(devices=None, axis=AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _sim_specs(force=False):
    return state_mod.SimState(
        particles=P(None, AXIS),
        previous=P(None, AXIS),
        targets=P(None, AXIS),
        flow=P(),
        view=P(),
        color_map=P(),
        key=P(),
        idx=P(AXIS),
        force=(P(None, AXIS) if force else None),
    )


def shard_sim(sim: state_mod.SimState, mesh: Mesh) -> state_mod.SimState:
    """Place a SimState on the mesh with the standard layout. The carried
    flow force is a single-device cache — dropped here (the sharded step
    gathers from the replicated grid)."""
    sim = dataclasses.replace(sim, force=None)
    specs = _sim_specs()
    kw = {
        f.name: jax.device_put(getattr(sim, f.name),
                               NamedSharding(mesh, getattr(specs, f.name)))
        for f in dataclasses.fields(sim)
        if getattr(sim, f.name) is not None
    }
    return dataclasses.replace(sim, **kw)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mesh"),
                   donate_argnums=(0,))
def parallel_frame(sim, params, time, dt, cfg: EngineConfig, view_size,
                   mesh: Mesh):
    """One full step+draw frame, shard_map'd over the particle axis.

    Grids stay replicated; each shard computes its particles' splat partial
    sums which are `psum`'d before the blend resolve (see
    `engine.draw_sim(axis_name=...)`). Per-particle constants derive from
    the sharded `sim.idx`.
    """
    sim_specs = _sim_specs()

    def body(sim, params, time, dt, view_size):
        sim = step_sim(sim, params, time, dt, cfg, view_size)
        sim = draw_sim(sim, params, time, cfg, view_size, axis_name=AXIS)
        return sim

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(sim_specs, P(), P(), P(), P()),
        out_specs=sim_specs,
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
        if eng.timer.paused:
            return self
        eng.sim = parallel_frame(
            eng.sim, eng.params(),
            jax.numpy.float32(eng.timer.time), jax.numpy.float32(eng.timer.dt),
            eng.config, eng._view_size, self.mesh)
        return self
