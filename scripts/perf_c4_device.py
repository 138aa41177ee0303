"""Config-4 device-frame decomposition (VERDICT r4 #4).

The driver-visible claim for config 4 is `device_ms_per_step` = the scanned
optical-flow pipeline (`bench._bench4_device_scan`): step + fused draw +
carried force + OF kernel at 480p + `jax.image.resize` to 720p + composite.
At 4.67 ms it sits below the 1.0 bar (<= 4.16 ms). This probe scan-times
each component in isolation at the production config (512^2 particles,
720p view, 480p feed) so the fix targets the measured cost:

  a. full device body (control — must reproduce ~4.67)
  b. step + draw + force only (no OF chain)
  c. OF kernel only (480p)
  d. resize only (4ch 480p -> 720p bilinear)
  e. matmul resize only (A @ img @ B, the blur-stack trick)
  f. composite only

Run on TPU: `timeout 2400 python scripts/perf_c4_device.py`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from tendrils_tpu import media  # noqa: E402


def bar_grid(i):
    img = np.zeros((480, 640, 3), np.uint8)
    img[:, (i * 8) % 600:(i * 8) % 600 + 40] = 255
    return media.image_to_grid(img, keep_u8=True)


def timed(fn, sim, stack, label, steps):
    import dataclasses
    # Each variant donates its sim — hand it a fresh copy so the engine's
    # original survives for the next variant.
    sim = jax.tree.map(jnp.copy, sim)
    if sim.force is not None:
        sim = dataclasses.replace(sim, force=None)
    sim = fn(sim, stack)  # compile
    float(sim.particles[0, 0])
    if sim.force is not None:
        sim = dataclasses.replace(sim, force=None)
    t0 = time.time()
    sim = fn(sim, stack)
    float(sim.particles[0, 0])
    ms = (time.time() - t0) / steps * 1000
    print(f"  {label}: {ms:.2f} ms/step", flush=True)
    return ms


def lin_interp_matrix(dst, src):
    """[dst, src] bilinear sampling matrix (align_corners=False, the
    jax.image.resize 'linear' convention: pixel centres at (i+0.5)/n)."""
    x = (np.arange(dst) + 0.5) * (src / dst) - 0.5
    i0 = np.clip(np.floor(x).astype(int), 0, src - 1)
    i1 = np.clip(i0 + 1, 0, src - 1)
    t = np.clip(x - np.floor(x), 0.0, 1.0)
    m = np.zeros((dst, src), np.float32)
    m[np.arange(dst), i0] += 1.0 - t
    m[np.arange(dst), i1] += t
    return jnp.asarray(m)


def main():
    eng = bench._engine(512, (720, 1280), True)
    params = eng.params()
    cfg, view_size = eng.config, eng._view_size
    steps = 30
    stack = jnp.asarray(np.stack([bar_grid(i) for i in range(steps + 1)]))
    float(stack[0, 0, 0, 0].astype(jnp.float32))

    t0 = time.time()
    x = jnp.ones((256, 256))
    print(f"sanity: {float((x @ x).sum()):.0f} in {time.time() - t0:.1f}s",
          flush=True)

    # a. full control — bench's own scan.
    def full(sim, stack):
        return bench._bench4_device_scan(sim, stack, params, cfg, view_size)
    a = timed(full, eng.sim, stack, "a. full device body", steps)

    # b. step + draw + force only (no OF write at all).
    import dataclasses
    from functools import partial
    from tendrils_tpu.engine import (carry_enabled, draw_sim, force_from_aux,
                                     initial_force, resident_enabled,
                                     step_sim)
    from tendrils_tpu.ops.optical_flow import composite_flow, optical_flow

    dt = jnp.float32(1000.0 / 60.0)
    resident = resident_enabled(cfg)

    @partial(jax.jit, donate_argnums=(0,))
    def no_of(sim, stack):
        if sim.force is None:
            sim = dataclasses.replace(
                sim, force=initial_force(sim, params, cfg, view_size, dt))

        def body(sim, xt):
            cur, last, i = xt
            t = dt * (i + 1.0)
            sim = step_sim(sim, params, t, dt, cfg, view_size)
            out = draw_sim(sim, params, t, cfg, view_size, want_aux=True,
                           resident=resident, targets_live=False,
                           stepped=True, read_time=t + dt,
                           want_force=resident)
            if resident:
                return out[0], ()
            sim, aux = out[:2]
            force = force_from_aux(sim.flow, aux, params, t + dt, cfg,
                                   unsort=not resident,
                                   n=sim.particles.shape[1])
            return dataclasses.replace(sim, force=force), ()

        xs = (stack[1:], stack[:-1],
              jnp.arange(stack.shape[0] - 1, dtype=jnp.float32))
        sim, _ = jax.lax.scan(body, sim, xs)
        return sim
    b = timed(no_of, eng.sim, stack, "b. step+draw+force only", steps)

    # c-f: OF-chain pieces alone, scanned over the same stack, carrying the
    # flow grid so nothing is DCE'd.
    def of_scan(piece):
        @partial(jax.jit, donate_argnums=(0,))
        def run(sim, stack):
            def body(flow, xt):
                cur, last, i = xt
                t = dt * (i + 1.0)
                return piece(flow, cur, last, t), ()
            xs = (stack[1:], stack[:-1],
                  jnp.arange(stack.shape[0] - 1, dtype=jnp.float32))
            flow, _ = jax.lax.scan(body, sim.flow, xs)
            return dataclasses.replace(sim, flow=flow)
        return run

    def of_only(flow, cur, last, t):
        p = optical_flow(cur, last, t, offset=jnp.float32(0.05),
                         lambda_=jnp.float32(0.001), speed=jnp.float32(0.08),
                         speed_limit=params["speedLimit"])
        # fold into the carry cheaply so the kernel isn't DCE'd
        return flow + 1e-6 * jnp.pad(p, ((0, 0), (0, 240), (0, 640)))
    timed(of_scan(of_only), eng.sim, stack, "c. OF kernel only (480p)",
          steps)

    def resize_only(flow, cur, last, t):
        p = cur.astype(jnp.float32)[:3]  # grids are 4ch; emulate 4ch payload
        p = jnp.concatenate([p, p[:1]], 0)
        up = jax.image.resize(p, (4, 720, 1280), "bilinear")
        return flow + 1e-6 * up
    timed(of_scan(resize_only), eng.sim, stack,
          "d. jax.image.resize only (4ch 480->720p)", steps)

    A = lin_interp_matrix(720, 480)
    B = lin_interp_matrix(1280, 640).T

    def mat_resize_only(flow, cur, last, t):
        p = cur.astype(jnp.float32)[:3]
        p = jnp.concatenate([p, p[:1]], 0)
        up = jnp.einsum("hs,csw,wd->chd", A, p, B)
        return flow + 1e-6 * up
    timed(of_scan(mat_resize_only), eng.sim, stack,
          "e. matmul resize only (A@img@B)", steps)

    def composite_only(flow, cur, last, t):
        p = jnp.broadcast_to(cur.astype(jnp.float32)[:1], (4, 480, 640))
        p = jnp.pad(p, ((0, 0), (0, 240), (0, 640)))
        return composite_flow(flow, p)
    timed(of_scan(composite_only), eng.sim, stack, "f. composite only",
          steps)

    print(f"OF-chain total (a-b): {a - b:.2f} ms", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
