"""TT_SORT_PAIRS flip-or-delete battery (VERDICT r4 #1).

Measures the odd-even pair-merge segment sort END-TO-END at the config-5
scale (16.7M particles, 4K trail): flat control, pairs in {4, 16, 64},
plus a 40-frame drift arm for the best pair count (does near-global order
decay over frames the 10-step window can't see?). A config-2 (1M/1080p)
control closes the battery so the shared path is known-untouched.

Mechanism: `draw_pallas.SORT_PAIRS` is a module global read at trace time;
each variant bumps the static scan step count to force a fresh trace
(`perf_c5_bands.py` pattern). Timing uses bench's own `_run_scan` so the
sort_phase threading matches production (`run_headless`).

Run on TPU: `nohup timeout 5400 python scripts/perf_pair_sort_c5.py`.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from tendrils_tpu.ops import draw_pallas  # noqa: E402


def scan_ms(eng, steps, label):
    params = eng.params()
    if eng.sim.force is not None:
        eng.sim = dataclasses.replace(eng.sim, force=None)
    # warm (compiles this variant)
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
    print(f"  {label}: {ms:.1f} ms/step", flush=True)
    return ms


def sanity():
    t0 = time.time()
    x = jnp.ones((256, 256))
    v = float((x @ x).sum())
    print(f"sanity matmul: {v:.0f} in {time.time() - t0:.1f}s", flush=True)


def main():
    root = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    h, w = 2160, 3840
    step_bump = [10]

    def run(pairs, label, steps=None):
        draw_pallas.SORT_PAIRS = pairs
        if steps is None:
            step_bump[0] += 1
            steps = step_bump[0]
        eng = bench._engine(root, (h, w), True)
        return scan_ms(eng, steps, label)

    sanity()
    print(f"pair-merge battery: n={root * root}, {h}x{w}", flush=True)

    flat = [run(0, "flat control (run 1)"), run(0, "flat control (run 2)")]
    res = {}
    for c in (4, 16, 64):
        res[c] = run(c, f"pairs={c}")
    best = min(res, key=res.get)
    print(f"best pairs={best} at {res[best]:.1f} "
          f"(flat {min(flat):.1f})", flush=True)
    # Drift arm: 40 frames in one scan — phases cycle aligned/offset with
    # one flat repair at phase 0; compare per-step cost vs the short scan.
    run(best, f"pairs={best} drift arm (40 steps)", steps=40)
    run(0, "flat drift control (40 steps)", steps=41)

    # Config-2 control (shared path untouched).
    draw_pallas.SORT_PAIRS = 0
    step_bump[0] += 1
    eng2 = bench._engine(1024, (1080, 1920), True)
    scan_ms(eng2, step_bump[0], "config-2 control flat")
    draw_pallas.SORT_PAIRS = best
    step_bump[0] += 1
    eng2 = bench._engine(1024, (1080, 1920), True)
    scan_ms(eng2, step_bump[0], f"config-2 pairs={best}")
    print("battery done", flush=True)


if __name__ == "__main__":
    main()
