"""Isolate the carried-force slowdown: scan frames carry on/off; keyed
gather alone. `timeout 550 python scripts/perf_carry.py` on TPU."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tendrils_tpu import EngineConfig, Tendrils  # noqa: E402
from tendrils_tpu.ops import spawn  # noqa: E402
from bench import _run_scan  # noqa: E402


def probe(carry, steps=10):
    cfg = EngineConfig(root_num=1024, view_res=(1080, 1920),
                       splat_backend="pallas", gather_backend="pallas",
                       flow_samples=2, flow_rows=1, view_samples=2,
                       carry_force=carry)
    eng = Tendrils(cfg)
    eng.setup()
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
    params = eng.params()
    dt = 1000.0 / 60.0
    sim = _run_scan(eng.sim, params, cfg, eng._view_size, jnp.float32(0.0),
                    dt, steps)
    float(sim.particles[0, 0])
    t0 = time.time()
    sim = _run_scan(sim, params, cfg, eng._view_size,
                    jnp.float32(steps * dt), dt, steps)
    float(sim.particles[0, 0])
    ms = (time.time() - t0) / steps * 1000
    print(f"carry={carry}: {ms:.2f} ms/step", flush=True)
    return eng, params


def main():
    if "--scan" in sys.argv:
        probe(False)
        probe(True)
        return

    # Keyed gather alone on realistic data (fresh engine — probe scans
    # donate their sim buffers).
    cfg = EngineConfig(root_num=1024, view_res=(1080, 1920),
                       splat_backend="pallas", gather_backend="pallas",
                       flow_samples=2, flow_rows=1, view_samples=2)
    eng = Tendrils(cfg)
    eng.setup()
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
    params = eng.params()

    from tendrils_tpu.engine import draw_sim, force_from_aux, step_sim
    sim = jax.jit(lambda s: step_sim(s, params, jnp.float32(16.0),
                                     jnp.float32(16.0), cfg,
                                     eng._view_size))(eng.sim)
    drawf = jax.jit(lambda s: draw_sim(s, params, jnp.float32(16.0), cfg,
                                       eng._view_size, want_aux=True))
    sim2, aux = drawf(sim)

    forcef = jax.jit(lambda flow, aux: force_from_aux(
        flow, aux, params, jnp.float32(32.0), cfg))
    for _ in range(2):
        f = forcef(sim2.flow, aux)
    float(f[0, 0])
    t0 = time.time()
    for _ in range(10):
        f = forcef(sim2.flow, aux)
    float(f[0, 0])
    print(f"force_from_aux: {(time.time() - t0) / 10 * 1000:.2f} ms",
          flush=True)

    import numpy as np
    gidx, gkey, p1 = [np.asarray(a) for a in aux]
    kb = gkey.reshape(-1, 4096)
    visits = sum(len(np.unique(b)) for b in kb)
    print(f"gather stream: visits {visits}, blocks {kb.shape[0]}, "
          f"key range {gkey.min()}..{gkey.max()}", flush=True)
    wins = gkey.reshape(-1, 512)
    spread = (wins.max(1) - wins.min(1))
    print(f"window spread: mean {spread.mean():.1f} max {spread.max()}",
          flush=True)


if __name__ == "__main__":
    main()
