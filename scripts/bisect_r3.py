"""One timed scan of the bench config; variant picked by env vars (read
at import time): TT_RESIDENT=1 (resident-stream engine), TT_FR=0/1 (fused
Pallas resolve). Used for the round-3 regression bisect and default
decisions — see BENCHMARKS.md. (TT_DERIVE was measured 2026-08-19 —
classic derive 14.94 ms vs resident 13.63 ms — and deleted.)"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402


def main():
    fr = os.environ.get("TT_FR", "0") == "1"
    kw = {}
    res = os.environ.get("TT_RESIDENT", "")
    if res:  # "1" opts in, "0" forces the classic carry path
        kw["resident_stream"] = res == "1"
    root = int(os.environ.get("TT_ROOT", 1024))
    h, w = (int(v) for v in
            os.environ.get("TT_RES", "1080x1920").split("x"))
    eng = bench._engine(root, (h, w), True, **kw)
    params = eng.params()
    dt = jnp.float32(1000.0 / 60.0)
    steps = int(os.environ.get("TT_STEPS", 30))
    for i in range(3):
        if eng.sim.force is not None:
            eng.sim = dataclasses.replace(eng.sim, force=None)
        t0 = time.time()
        eng.sim = bench._run_scan(eng.sim, params, eng.config,
                                  eng._view_size, jnp.float32(0.0), dt,
                                  steps, fast_resolve=fr)
        float(eng.sim.particles[0, 0])
        sec = time.time() - t0
        if i:  # first is warm-up/compile
            print(f"  run {i}: {sec / steps * 1e3:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
