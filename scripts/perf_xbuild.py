"""Splat A/X window-matrix build cost (VERDICT r4 #6).

CLAUDE.md names "splat X-matrix build dominates window-visits" as a known
lever but no probe result exists. `draw_pallas.SPLAT_NOBUILD` (timing-only
diagnostic — deposits garbage) replaces the per-visit cover/channel-stack
builds with loop-invariant constants:

  ""   production control
  "x"  X-matrix build removed (the [samples*win, REGION_W] cover concat)
  "a"  A-matrix build removed (cover * live * 11-channel stack)
  "ax" both — the visit is just gate + DMA + one bf16 dot

The per-variant delta vs control is each build's VPU cost. If a build is
>25% of splat time, the candidate fixes are per-parity incremental build
or precomputed cover vectors (VERDICT r4 #6). Measured at config-2
(1M/1080p) and config-5 (16.7M/4K) scales via bench's production scan.

Run on TPU: `nohup timeout 3600 python scripts/perf_xbuild.py`.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from tendrils_tpu.ops import draw_pallas  # noqa: E402


def scan_ms(eng, steps, label):
    params = eng.params()
    if eng.sim.force is not None:
        eng.sim = dataclasses.replace(eng.sim, force=None)
    eng.sim = bench._run_scan(eng.sim, params, eng.config, eng._view_size,
                              jnp.float32(0.0), 1000.0 / 60.0, steps)
    float(eng.sim.particles[0, 0])
    if eng.sim.force is not None:
        eng.sim = dataclasses.replace(eng.sim, force=None)
    t0 = time.time()
    eng.sim = bench._run_scan(eng.sim, params, eng.config, eng._view_size,
                              jnp.float32(steps * 1000.0 / 60.0),
                              1000.0 / 60.0, steps)
    float(eng.sim.particles[0, 0])
    ms = (time.time() - t0) / steps * 1000
    print(f"  {label}: {ms:.2f} ms/step", flush=True)
    return ms


def main():
    t0 = time.time()
    x = jnp.ones((256, 256))
    print(f"sanity matmul: {float((x @ x).sum()):.0f} "
          f"in {time.time() - t0:.1f}s", flush=True)

    step_bump = [10]

    def battery(root, h, w, name):
        print(f"{name}: n={root * root}, {h}x{w}", flush=True)
        res = {}
        for mode in ("", "x", "a", "ax", ""):
            draw_pallas.SPLAT_NOBUILD = mode
            step_bump[0] += 1  # fresh trace per variant
            eng = bench._engine(root, (h, w), True)
            label = f"mode={mode or 'control'}"
            res.setdefault(mode, []).append(
                scan_ms(eng, step_bump[0], label))
        ctl = min(res[""])
        for mode in ("x", "a", "ax"):
            d = res[mode][0] - ctl
            print(f"  -> {mode} build cost: {d:+.2f} ms "
                  f"({d / ctl * 100:+.0f}% of frame)", flush=True)

    battery(1024, 1080, 1920, "config-2 scale")
    battery(4096, 2160, 3840, "config-5 scale")
    print("xbuild battery done", flush=True)


if __name__ == "__main__":
    main()
