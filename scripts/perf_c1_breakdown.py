"""Frame breakdown: time scan variants at a given root/resolution
to locate the frame floor (VERDICT r2 #3/#2). Each variant scans `steps`
frames with the carried-force structure held fixed; no donation so sims
can be reused across variants.

Run on TPU: `timeout 550 python scripts/perf_c1_breakdown.py [root] [steps] [H] [W]`.
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench  # noqa: E402
from tendrils_tpu.engine import (draw_sim, force_from_aux,  # noqa: E402
                                 initial_force, step_sim)


def main():
    root = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 720
    w = int(sys.argv[4]) if len(sys.argv) > 4 else 1280
    eng = bench._engine(root, (h, w), True)
    eng.state["flowWeight"] = 0.0
    params = eng.params()
    cfg, vs = eng.config, eng._view_size
    dt = 1000.0 / 60.0

    def seed(sim):
        return dataclasses.replace(
            sim, force=initial_force(sim, params, cfg, vs, dt))

    def mk(body):
        @jax.jit
        def run(sim):
            s, _ = jax.lax.scan(lambda c, i: (body(c, i), ()), sim,
                                jnp.arange(steps, dtype=jnp.float32))
            return s
        return run

    def b_step(sim, i):
        t = dt * (i + 1)
        s = step_sim(sim, params, t, dt, cfg, vs)
        return dataclasses.replace(s, force=sim.force)

    def b_step_draw(sim, i):
        t = dt * (i + 1)
        s = step_sim(sim, params, t, dt, cfg, vs)
        out = draw_sim(s, params, t, cfg, vs, want_aux=True, resident=True,
                       targets_live=False, stepped=True, fast_resolve=True,
                       read_time=t + dt, want_eff=True)
        return dataclasses.replace(out[0], force=sim.force)

    def b_full(sim, i):
        t = dt * (i + 1)
        s = step_sim(sim, params, t, dt, cfg, vs)
        out = draw_sim(s, params, t, cfg, vs, want_aux=True, resident=True,
                       targets_live=False, stepped=True, fast_resolve=True,
                       read_time=t + dt, want_eff=True)
        s, aux, eff = out
        force = force_from_aux(s.flow, aux, params, t + dt, cfg,
                               unsort=False, eff=eff)
        return dataclasses.replace(s, force=force)

    def b_full_xla_resolve(sim, i):
        t = dt * (i + 1)
        s = step_sim(sim, params, t, dt, cfg, vs)
        out = draw_sim(s, params, t, cfg, vs, want_aux=True, resident=True,
                       targets_live=False, stepped=True, fast_resolve=False,
                       read_time=t + dt)
        s, aux = out
        force = force_from_aux(s.flow, aux, params, t + dt, cfg,
                               unsort=False)
        return dataclasses.replace(s, force=force)

    sim0 = seed(eng.sim)
    for name, body in (("step only", b_step),
                       ("step+draw (FR)", b_step_draw),
                       ("full frame (FR)", b_full),
                       ("full frame (xla resolve)", b_full_xla_resolve)):
        f = mk(body)
        s = f(sim0)
        float(s.particles[0, 0])
        t0 = time.time()
        s = f(sim0)
        float(s.particles[0, 0])
        ms = (time.time() - t0) / steps * 1000
        print(f"{name:28s} {ms:6.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
