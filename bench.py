"""Benchmark: particle-steps/sec on the flow-feedback config (BASELINE.md
config 2 family: 1M particles, rasterised flow-field advection + trail
feedback at 1080p).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's implicit design point — its tier-1 quality is
1024² = 1,048,576 particles at the fixed 60 steps/s timestep
(`src/demo.main.js:978-1009`, `src/index.js:67`) → 62,914,560
particle-steps/s on a consumer GPU. vs_baseline = value / that.

Note: `jax.block_until_ready` does not block through the axon tunnel — all
timing uses host readbacks.
"""

import json
import time

import jax
import jax.numpy as jnp


BASELINE_PSTEPS = 1024 * 1024 * 60  # reference tier-1 @ 60 steps/s


def main():
    from tendrils_tpu import EngineConfig, Tendrils
    from tendrils_tpu.engine import run_headless
    from tendrils_tpu.ops import spawn

    on_tpu = jax.default_backend() == "tpu"
    root = 1024 if on_tpu else 64
    steps = 30 if on_tpu else 3
    cfg = EngineConfig(
        root_num=root, view_res=(1080, 1920),
        splat_backend="pallas" if on_tpu else "xla",
        gather_backend="pallas" if on_tpu else "xla",
        flow_samples=2, flow_rows=1, view_samples=2,
        resident_sort=0)

    eng = Tendrils(cfg)
    eng.setup()
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))

    params = eng.params()
    dt = 1000.0 / 60.0

    fn = jax.jit(
        lambda sim, t0: run_headless(sim, params, cfg, eng._view_size, t0,
                                     dt, steps),
        donate_argnums=(0,))

    sim = fn(eng.sim, jnp.float32(0.0))
    float(sim.particles[0, 0])  # force (block_until_ready lies on axon)

    t0 = time.time()
    sim = fn(sim, jnp.float32(steps * dt))
    float(sim.particles[0, 0])
    elapsed = time.time() - t0

    n = cfg.n
    psteps = n * steps / elapsed
    print(json.dumps({
        "metric": "particle_steps_per_sec",
        "value": round(psteps),
        "unit": "particle-steps/s (1M particles, flow feedback + 1080p trail)",
        "vs_baseline": round(psteps / BASELINE_PSTEPS, 4),
    }))


if __name__ == "__main__":
    # The axon tunnel's remote-compile endpoint occasionally 500s; one retry
    # rides out the transient.
    try:
        main()
    except Exception:
        import traceback
        traceback.print_exc()
        time.sleep(5)
        main()
