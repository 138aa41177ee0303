"""Banded-chunk hypothesis probe (config-5 sort frontier, VERDICT r4 #1).

Today's chunked segment sort at 16M uses FIXED row ranges as chunks; at
spawn those are random subsets, so every chunk spans the whole grid and
deep chunking explodes the splat's region-DMA count. But in RESIDENT mode
chunks persist: if the stream were once globally sorted, each chunk would
hold a contiguous band of tiles — and stay that way under bounded drift
(repairable with alternating pairwise chunk sorts, odd-even style).

This probe measures the upside: for each chunk count C, time the steady
-state frame (a) from the default random-chunk state and (b) after ONE
flat global sort establishes bands. If banded deep chunks (C=64..256) beat
the auto policy (C=8), the pairwise band-maintenance design is worth
landing; the band decay over the 10 measured frames bounds the repair
cadence needed.

Mechanism: `draw_pallas.SORT_CHUNKS` is a module global read at trace
time — each variant bumps the (static) scan step count to force a fresh
trace.

Run on TPU: `timeout 3000 python scripts/perf_c5_bands.py [root] [H] [W]`.
"""

import dataclasses
import sys
import time

import os
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


def main():
    root = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 2160
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 3840

    step_bump = [10]  # distinct static step counts force fresh traces

    def fresh():
        return bench._engine(root, (h, w), True)

    def run(eng, label):
        step_bump[0] += 1
        return scan_ms(eng, step_bump[0], label)

    print(f"banded-chunk probe: n={root * root}, {h}x{w}", flush=True)

    # Control: auto policy from the default random-chunk state.
    draw_pallas.SORT_CHUNKS = 0
    eng = fresh()
    run(eng, "auto(random-chunks)")

    for c in (8, 64, 256):
        # (a) random chunks: fresh engine straight into C chunks.
        draw_pallas.SORT_CHUNKS = c
        eng_r = fresh()
        run(eng_r, f"C={c} random-chunks")

        # (b) banded: one flat-sorted frame first, then C chunks.
        draw_pallas.SORT_CHUNKS = 1
        eng_b = fresh()
        run(eng_b, f"C={c} pre-sort(flat)")  # establishes global order
        draw_pallas.SORT_CHUNKS = c
        run(eng_b, f"C={c} banded")
        # Band decay check: run again (20 more frames of drift).
        run(eng_b, f"C={c} banded+drift")


if __name__ == "__main__":
    main()
