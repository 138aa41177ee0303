"""Micro-bench of frame components on the TPU: sorts, kernels, logic, blur.

`timeout 550 python scripts/perf_components.py`
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

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
    key = jax.random.PRNGKey(0)
    n = 1 << 20

    # Sorts of various widths.
    for ops_n, m in [(2, n), (6, n), (10, n), (11, n), (5, 2 * n),
                     (4, n), (3, n)]:
        k = jax.random.randint(key, (m,), 0, 550, jnp.int32)
        vals = [jax.random.normal(key, (m,)) for _ in range(ops_n - 1)]
        f = jax.jit(lambda k, *v: jax.lax.sort([k, *v], num_keys=1)[0])
        ms = timeit(f, k, *vals)
        print(f"sort {ops_n} ops x {m/1e6:.0f}M: {ms:.2f} ms", flush=True)

    # Frame split at 1M/1080p.
    from tendrils_tpu import EngineConfig, Tendrils
    from tendrils_tpu.engine import draw_sim, step_sim
    from tendrils_tpu.ops import spawn

    cfg = EngineConfig(root_num=1024, view_res=(1080, 1920),
                       splat_backend="pallas", gather_backend="pallas",
                       flow_samples=2, flow_rows=1, view_samples=2)
    eng = Tendrils(cfg)
    eng.setup()
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
    params = eng.params()
    vs = eng._view_size
    t, dt = jnp.float32(16.0), jnp.float32(16.0)

    stepf = jax.jit(lambda s: step_sim(s, params, t, dt, cfg, vs))
    drawf = jax.jit(lambda s: draw_sim(s, params, t, cfg, vs))
    print(f"step_sim (gather+logic): {timeit(stepf, eng.sim, reps=10):.2f} ms",
          flush=True)
    sim1 = stepf(eng.sim)
    print(f"draw_sim (pack+sort+splat+blur+resolve): "
          f"{timeit(drawf, sim1, reps=10):.2f} ms", flush=True)

    # colors alone
    from tendrils_tpu.ops import render
    from tendrils_tpu import state as sm
    pos = sim1.particles[:2]
    vel = sim1.particles[2:]
    cmuv = sm.particle_coords_from_idx(sim1.idx, cfg.root_num)[2]
    colf = jax.jit(lambda p, v: render.particle_colors(
        p, v, cmuv, sim1.color_map, params, t))
    print(f"particle_colors: {timeit(colf, pos, vel, reps=10):.2f} ms",
          flush=True)

    # blur alone (6 channels 1080p, radius 2)
    from tendrils_tpu.ops.draw_pallas import _box_blur_traced
    img = jax.random.normal(key, (6, 1080, 1920))
    blurf = jax.jit(lambda x: _box_blur_traced(x, jnp.float32(2.0)))
    print(f"box_blur 6ch 1080p: {timeit(blurf, img, reps=10):.2f} ms",
          flush=True)

    # gather alone, sorted vs clustered input
    from tendrils_tpu.ops.gather_pallas import bilinear_gather
    grid = jax.random.normal(key, (2, 1080, 1920))
    x = jax.random.uniform(key, (n,), minval=0.0, maxval=1920.0)
    y = jax.random.uniform(key, (n,), minval=0.0, maxval=1080.0)
    g1 = jax.jit(lambda g, x, y: bilinear_gather(g, x, y))
    print(f"bilinear_gather 1M random (sort+unsort): "
          f"{timeit(g1, grid, x, y, reps=10):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
