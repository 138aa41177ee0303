"""Bisect the scan-only carry slowdown.

`timeout 550 python scripts/perf_carry3.py` on TPU."""

import dataclasses
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tendrils_tpu import EngineConfig, Tendrils  # noqa: E402
from tendrils_tpu.engine import (draw_sim, force_from_aux,  # noqa: E402
                                 initial_force, step_sim)
from tendrils_tpu.ops import spawn  # noqa: E402


def engine():
    cfg = EngineConfig(root_num=1024, view_res=(1080, 1920),
                       splat_backend="pallas", gather_backend="pallas",
                       flow_samples=2, flow_rows=1, view_samples=2)
    eng = Tendrils(cfg)
    eng.setup()
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
    return eng


@functools.partial(jax.jit, static_argnames=("cfg", "steps", "extra_rows"))
def scan_shape(sim, params, cfg, view_size, t0, dt, steps, extra_rows):
    """Pure shape probe: carry particles as [4+extra, N] with dummy rows;
    step/draw identical to the off path."""
    import tendrils_tpu.engine as eng_mod

    def body(c, i):
        time_ = t0 + dt * (i + 1)
        s = dataclasses.replace(sim, particles=c[0][:4], previous=c[1],
                                flow=c[2], view=c[3], force=None)
        s = eng_mod.step_sim(s, params, time_, dt, cfg, view_size)
        s = eng_mod.draw_sim(s, params, time_, cfg, view_size)
        pp = (jnp.concatenate([s.particles, c[0][4:]])
              if extra_rows else s.particles)
        return (pp, s.previous, s.flow, s.view), ()

    pp0 = jnp.concatenate(
        [sim.particles, jnp.zeros((extra_rows, cfg.n), jnp.float32)]) \
        if extra_rows else sim.particles
    c, _ = jax.lax.scan(body, (pp0, sim.previous, sim.flow, sim.view),
                        jnp.arange(steps, dtype=jnp.float32))
    return dataclasses.replace(sim, particles=c[0][:4], previous=c[1],
                               flow=c[2], view=c[3])


def run_shape(extra, steps=10):
    eng = engine()
    params = eng.params()
    dt = 1000.0 / 60.0
    cfg = dataclasses.replace(eng.config, carry_force=False)
    sim = scan_shape(eng.sim, params, cfg, eng._view_size, jnp.float32(0.0),
                     jnp.float32(dt), steps, extra)
    float(sim.particles[0, 0])
    t0 = time.time()
    sim = scan_shape(sim, params, cfg, eng._view_size,
                     jnp.float32(steps * dt), jnp.float32(dt), steps, extra)
    float(sim.particles[0, 0])
    print(f"scan shape extra={extra}: {(time.time() - t0) / steps * 1000:.2f}"
          " ms/step", flush=True)


@functools.partial(jax.jit, static_argnames=("cfg", "steps", "mode"))
def scan_run(sim, params, cfg, view_size, t0, dt, steps, mode):
    if mode == "tinydead":
        sim = dataclasses.replace(sim,
                                  force=jnp.zeros((2, 128), jnp.float32))
    elif mode != "off":
        sim = dataclasses.replace(
            sim, force=initial_force(sim, params, cfg, view_size, t0 + dt))

    def body(sim, i):
        time_ = t0 + dt * (i + 1)
        if mode == "auxonly":
            # Step ignores the carried force; draw still produces aux.
            sim = step_sim(dataclasses.replace(sim, force=None), params,
                           time_, dt, cfg, view_size)
            sim, aux = draw_sim(sim, params, time_, cfg, view_size,
                                want_aux=True)
            force = jnp.zeros((2, cfg.n), jnp.float32) + aux[0][0]
            sim = dataclasses.replace(sim, force=force)
            return sim, ()
        if mode in ("carrydead", "tinydead"):
            # Force rides the carry but nothing reads it; step/draw as off.
            sim2 = step_sim(dataclasses.replace(sim, force=None), params,
                            time_, dt, cfg, view_size)
            sim2 = draw_sim(sim2, params, time_, cfg, view_size)
            return dataclasses.replace(sim2, force=sim.force), ()
        sim = step_sim(sim, params, time_, dt, cfg, view_size)
        if mode == "off":
            sim = draw_sim(sim, params, time_, cfg, view_size)
        elif mode == "carryonly":
            # Step consumed the carried force; draw runs WITHOUT aux.
            sim = draw_sim(sim, params, time_, cfg, view_size)
            sim = dataclasses.replace(
                sim, force=jnp.zeros((2, cfg.n), jnp.float32)
                + sim.flow[0, 0, 0])
        else:
            sim, aux = draw_sim(sim, params, time_, cfg, view_size,
                                want_aux=True)
            if mode == "zeros":
                force = jnp.zeros((2, cfg.n), jnp.float32) + aux[0][0]
            else:
                force = force_from_aux(sim.flow, aux, params, time_ + dt,
                                       cfg)
            sim = dataclasses.replace(sim, force=force)
        return sim, ()

    sim, _ = jax.lax.scan(body, sim, jnp.arange(steps, dtype=jnp.float32))
    return sim


def run(mode, steps=10):
    eng = engine()
    params = eng.params()
    dt = 1000.0 / 60.0
    sim = scan_run(eng.sim, params, eng.config, eng._view_size,
                   jnp.float32(0.0), jnp.float32(dt), steps, mode)
    float(sim.particles[0, 0])
    t0 = time.time()
    sim = scan_run(sim, params, eng.config, eng._view_size,
                   jnp.float32(steps * dt), jnp.float32(dt), steps, mode)
    float(sim.particles[0, 0])
    print(f"scan mode={mode}: {(time.time() - t0) / steps * 1000:.2f} "
          "ms/step", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:] or ["off", "zeros", "full"]
    for m in args:
        if m.startswith("shape"):
            run_shape(int(m[5:]))
        else:
            run(m)
