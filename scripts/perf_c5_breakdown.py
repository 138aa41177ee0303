"""Config-5 (16.7M particles, 4K) budget decomposition — VERDICT r3 #9.

Times the frame's components in isolation at the live-show shape so the
sort-frontier work attacks measured numbers:
  - full show frame (engine.frame + bokeh)     [the config-5 metric]
  - engine.frame alone (no bokeh)
  - logic step alone
  - the segment sort alone (same rows x operands x chunk policy as the
    resident draw: keym + idx + p1 + vl + 2 position rides = 6 int32)
  - splat accumulate (pack + sort + expand + splat kernel, no resolve)
  - resolve_fused alone
  - bokeh alone
The splat-kernel share ≈ accumulate − sort; the XLA tail ≈ frame − step −
accumulate − resolve.

Run on TPU: `timeout 1500 python scripts/perf_c5_breakdown.py [root] [H] [W] [frames]`.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402


def timed(label, fn, *args, reps=3, warm=2):
    out = None
    for _ in range(warm):
        out = fn(*args)
    for o in jax.tree.leaves(out):
        float(o.ravel()[0].astype(jnp.float32))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    for o in jax.tree.leaves(out):  # consume every output (DCE trap)
        float(o.ravel()[0].astype(jnp.float32))
    ms = (time.time() - t0) / reps * 1000
    print(f"  {label}: {ms:.1f} ms", flush=True)
    return ms


def main():
    root = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 2160
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 3840
    frames = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from tendrils_tpu.engine import step_sim
    from tendrils_tpu.ops import post
    from tendrils_tpu.ops.draw_pallas import (SORT_CHUNKS, _sort_chunks,
                                              fused_draw_accumulate,
                                              resolve_fused)

    eng = bench._engine(root, (h, w), True)
    n = eng.config.n
    params = eng.params()
    cfg, vs = eng.config, eng._view_size
    dt = 1000.0 / 60.0

    print(f"config5 breakdown: n={n}, {h}x{w}, "
          f"TT_SORT_CHUNKS={SORT_CHUNKS}", flush=True)

    # Warm the engine into resident steady state.
    for _ in range(3):
        eng.frame()
    float(eng.sim.particles[0, 0])

    bokeh = jax.jit(post.bokeh)

    def show_frame():
        # The config-5 metric: ONE dispatch (step + draw + bokeh).
        eng.timer.tick()
        return eng.step_draw_io(bokeh=(3.0, 40.0))

    t_full = timed("full show frame (one-dispatch io+bokeh)", show_frame,
                   reps=frames)

    def frame_only():
        eng.frame()
        return eng.sim.particles

    t_frame = timed("engine.frame only", frame_only, reps=frames)

    sim0 = jax.tree_util.tree_map(jnp.array, eng.sim)
    sim0 = dataclasses.replace(sim0, force=None)

    @jax.jit
    def step_only(sim):
        return step_sim(sim, params, jnp.float32(100.0), jnp.float32(dt),
                        cfg, vs).particles

    t_step = timed("logic step (in-step gather)", step_only, sim0,
                   reps=frames)

    # Sort alone at the resident draw's exact shape: 6 int32 operands
    # (keym, idx, p1, vl, px, py bitcast), chunk policy as production.
    seg_block = 16384
    n_pad = (n + seg_block - 1) // seg_block * seg_block
    chunks = _sort_chunks(n_pad, 4096 // cfg.view_samples)
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    ops = [jax.random.randint(ks[i], (n_pad,), 0, 1 << 30, jnp.int32)
           for i in range(6)]

    @jax.jit
    def sort6(*o):
        if chunks > 1:
            out = jax.lax.sort([x.reshape(chunks, -1) for x in o],
                               num_keys=1, is_stable=False)
            return [x.reshape(-1) for x in out]
        return jax.lax.sort(list(o), num_keys=1, is_stable=False)

    t_sort = timed(f"segment sort alone (6 ops, chunks={chunks})", sort6,
                   *ops, reps=frames)

    @jax.jit
    def sort5(*o):
        if chunks > 1:
            out = jax.lax.sort([x.reshape(chunks, -1) for x in o[:5]],
                               num_keys=1, is_stable=False)
            return [x.reshape(-1) for x in out]
        return jax.lax.sort(list(o[:5]), num_keys=1, is_stable=False)

    t_sort5 = timed(f"segment sort 5 ops — production count since the p1"
                    f" cut (chunks={chunks})", sort5, *ops, reps=frames)

    @jax.jit
    def sort4(*o):
        if chunks > 1:
            out = jax.lax.sort([x.reshape(chunks, -1) for x in o[:4]],
                               num_keys=1, is_stable=False)
            return [x.reshape(-1) for x in out]
        return jax.lax.sort(list(o[:4]), num_keys=1, is_stable=False)

    timed(f"segment sort 4 ops (chunks={chunks})", sort4, *ops,
          reps=frames)

    # Splat accumulate (pack + sort + expand + splat kernel; raw accum, no
    # resolve) on the real state.
    pos = sim0.particles[:2]
    vel = sim0.particles[2:]
    prev = sim0.previous[:2]
    import numpy as np
    p0 = jnp.stack([(prev[0] * vs[0] * 0.5 + 0.5) * w,
                    (prev[1] * vs[1] * 0.5 + 0.5) * h], axis=-1)
    p1 = jnp.stack([(pos[0] * vs[0] * 0.5 + 0.5) * w,
                    (pos[1] * vs[1] * 0.5 + 0.5) * h], axis=-1)
    live = jnp.ones((n,), jnp.float32)
    idx = jnp.arange(n, dtype=jnp.int32)
    ride = [sim0.particles[0], sim0.particles[1]]
    ms = sim0.color_map[:, 0, 0]

    @jax.jit
    def accum():
        return fused_draw_accumulate(
            (h, w), p0, p1, vel, None, None, live, params["speedLimit"],
            jnp.float32(100.0), idx=idx, ride=ride, idx_bound=n,
            samples=cfg.view_samples, derive_p0=True,
            view_size=vs, mapped_scalar=ms, raw_accum=True,
            flow_width=params["flowWidth"], line_width=params["lineWidth"],
            speed_alpha=params["speedAlpha"],
            sin_decay=jnp.float32(0.0), flow_decay=params["flowDecay"],
            base_color=params["baseColor"], flow_color=params["flowColor"])

    t_acc = timed("accumulate (pack+sort+expand+splat)", accum, reps=frames)

    acc = accum()[0]

    @jax.jit
    def resolve(a, flow, view):
        return resolve_fused(
            jnp.asarray(a), flow, view, params["fadeColor"],
            jnp.float32(0.0), jnp.float32(100.0), jnp.float32(100.0 + dt),
            params["flowDecay"], params["flowWidth"], params["lineWidth"],
            want_eff=True)

    t_res = timed("resolve_fused (want_eff)", resolve, acc, sim0.flow,
                  sim0.view[0], reps=frames)

    t_bok = timed("bokeh alone", lambda v: bokeh(v, jnp.float32(3.0),
                                                 jnp.float32(40.0)),
                  eng.sim.view[0], reps=frames)

    print("\n  derived:", flush=True)
    print(f"  splat-kernel share ≈ accumulate − sort5 = "
          f"{t_acc - t_sort5:.1f} ms", flush=True)
    print(f"  frame − (step+accum+resolve) ≈ XLA tail/gather = "
          f"{t_frame - t_step - t_acc - t_res:.1f} ms", flush=True)
    print(f"  bokeh share of full = {t_full - t_frame:.1f} ms "
          f"(standalone {t_bok:.1f})", flush=True)


if __name__ == "__main__":
    main()
