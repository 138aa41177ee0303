"""A/B the resident-stream frame (positions-only ride + q15 velocity
reconstruction) against the classic carried-force frame on the real TPU.

Headline config (BASELINE config 2): 1M particles, 1080p, flow feedback.
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def make_engine(resident):
    from tendrils_tpu import EngineConfig, Tendrils
    from tendrils_tpu.ops import spawn

    cfg = EngineConfig(
        root_num=1024, view_res=(1080, 1920),
        splat_backend="pallas", gather_backend="pallas",
        flow_samples=2, flow_rows=1, view_samples=2,
        resident_stream=resident)
    eng = Tendrils(cfg)
    eng.setup()
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
    return eng


import functools


@functools.partial(jax.jit, static_argnames=("cfg", "steps"),
                   donate_argnums=(0,))
def _run_scan(sim, params, cfg, view_size, t0, dt, steps):
    from tendrils_tpu.engine import run_headless
    return run_headless(sim, params, cfg, view_size, t0, dt, steps,
                        targets_live=False)


def scan_once(eng, steps, t0=0.0):
    params = eng.params()
    if eng.sim.force is not None:
        eng.sim = dataclasses.replace(eng.sim, force=None)
    eng.sim = _run_scan(eng.sim, params, eng.config, eng._view_size,
                        jnp.float32(t0), 1000.0 / 60.0, steps)
    float(eng.sim.particles[0, 0])


def time_mode(resident, steps=30, reps=3):
    eng = make_engine(resident)
    scan_once(eng, steps)  # warm (both force structures)
    best = 1e9
    for r in range(reps):
        t = time.time()
        scan_once(eng, steps, t0=steps * 1000.0 / 60.0 * (r + 1))
        best = min(best, (time.time() - t) / steps)
    return best


if __name__ == "__main__":
    # Tunnel sanity check first.
    t = time.time()
    float(jnp.sum(jnp.ones((128, 128))))
    print(f"tunnel roundtrip: {(time.time() - t) * 1000:.1f} ms", flush=True)

    for mode, label in ((True, "resident (pos-ride + q15 vel)"),
                        (False, "classic carried force")):
        sec = time_mode(mode)
        n = 1024 * 1024
        print(f"{label}: {sec * 1000:.2f} ms/step, "
              f"{n / sec / 1e6:.1f}M psteps/s, vs_baseline "
              f"{n / sec / (n * 60):.4f}", flush=True)
