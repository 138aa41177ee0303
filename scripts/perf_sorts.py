"""Micro-probe: state-sort costs and draw-phase pieces. (The resident
resort path this originally profiled was deleted in round 3 — rejected by
measurement, see BENCHMARKS.md; the raw-sort probes remain useful.)

`timeout 550 python scripts/perf_sorts.py` on TPU.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def timeit(fn, *args, reps=20, warm=2):
    for _ in range(warm):
        out = fn(*args)
    out = jax.tree.leaves(out)[0]
    float(out.ravel()[0].astype(jnp.float32))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    out = jax.tree.leaves(out)[0]
    float(out.ravel()[0].astype(jnp.float32))
    return (time.time() - t0) / reps * 1000


def main():
    from tendrils_tpu import EngineConfig, Tendrils
    from tendrils_tpu.ops import spawn

    key = jax.random.PRNGKey(0)
    n = 1 << 20

    cfg = EngineConfig(root_num=1024, view_res=(1080, 1920),
                       splat_backend="pallas", gather_backend="pallas",
                       flow_samples=2, flow_rows=1, view_samples=2)
    eng = Tendrils(cfg)
    eng.setup()
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
    vs = eng._view_size
    sim = eng.sim

    # 1. raw 10-op sort with a realistic computed key (ball-clustered)
    pos = sim.particles
    tg = sim.targets
    idx = sim.idx

    def raw(pos, tg, idx):
        k = ((pos[1] * 500).astype(jnp.int32) * 68
             + (pos[0] * 900).astype(jnp.int32))
        ops = jax.lax.sort([k] + [pos[i] for i in range(4)]
                           + [tg[i] for i in range(4)] + [idx], num_keys=1)
        return ops[1]
    print(f"raw 10-op computed-key sort: "
          f"{timeit(jax.jit(raw), pos, tg, idx, reps=10):.2f} ms", flush=True)

    # 3. raw sort with random uniform key (dist sensitivity)
    k_rand = jax.random.randint(key, (n,), 0, 550, jnp.int32)
    vals = [jax.random.normal(key, (n,)) for _ in range(9)]
    f3 = jax.jit(lambda k, *v: jax.lax.sort([k, *v], num_keys=1)[1])
    print(f"raw 10-op random-key sort: {timeit(f3, k_rand, *vals, reps=10):.2f}"
          " ms", flush=True)

    # 4. ball-clustered key (most keys equal -> sort dist sensitivity)
    kball = ((pos[1] * 500).astype(jnp.int32) * 68
             + (pos[0] * 900).astype(jnp.int32))
    print(f"raw 10-op ball-key sort: {timeit(f3, kball, *vals, reps=10):.2f}"
          " ms", flush=True)

    # 5. sort of 1M x 5 int32 (segment-level sort candidate)
    ki = jax.random.randint(key, (n,), 0, 550, jnp.int32)
    vi = [jax.random.randint(key, (n,), 0, 2**30, jnp.int32)
          for _ in range(4)]
    f5 = jax.jit(lambda k, *v: jax.lax.sort([k, *v], num_keys=1)[1])
    print(f"sort 5 int32 ops x 1M: {timeit(f5, ki, *vi, reps=10):.2f} ms",
          flush=True)

    # 6. fused_draw_accumulate end-to-end (sort + kernel)
    from tendrils_tpu.ops.draw_pallas import fused_draw_accumulate
    p0 = jax.random.uniform(key, (n, 2)) * jnp.asarray([1920.0, 1080.0])
    p1 = p0 + jax.random.normal(key, (n, 2)) * 2.0
    vel = jax.random.normal(key, (2, n)) * 0.005
    colors = jax.random.uniform(key, (4, n))
    live = jnp.ones((n,))

    def g(p0, p1, vel, colors, live):
        fp, vp = fused_draw_accumulate(
            (1080, 1920), p0, p1, vel, colors, live, 0.01, 16.0,
            samples=2)
        return fp[0]
    print(f"fused_accumulate: "
          f"{timeit(jax.jit(g), p0, p1, vel, colors, live, reps=10):.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
