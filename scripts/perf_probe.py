"""Perf probe: scanned frame time at 1M/1080p across binning strategies.

Run on TPU: `timeout 550 python scripts/perf_probe.py [K ...]`
where each K is a resident_sort period (0 = per-frame sample sort).
"""

import sys
import time

import jax.numpy as jnp

sys.path.insert(0, ".")
from tendrils_tpu import EngineConfig, Tendrils  # noqa: E402
from tendrils_tpu.ops import spawn  # noqa: E402
from bench import _run_scan  # noqa: E402


def probe(resident, steps=30, root=1024):
    import dataclasses
    cfg = EngineConfig(
        root_num=root, view_res=(1080, 1920),
        splat_backend="pallas", gather_backend="pallas",
        flow_samples=2, flow_rows=1, view_samples=2,
        resident_sort=resident)
    eng = Tendrils(cfg)
    eng.setup()
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
    params = eng.params()
    dt = 1000.0 / 60.0
    sim = _run_scan(eng.sim, params, cfg, eng._view_size, jnp.float32(0.0),
                    dt, steps)
    float(sim.particles[0, 0])
    # Strip the carried force so the timed call keeps the SAME pytree
    # structure as the warm-up (None-vs-array retraces + recompiles).
    if sim.force is not None:
        sim = dataclasses.replace(sim, force=None)
    t0 = time.time()
    sim = _run_scan(sim, params, cfg, eng._view_size,
                    jnp.float32(steps * dt), dt, steps)
    float(sim.particles[0, 0])
    ms = (time.time() - t0) / steps * 1000
    print(f"resident_sort={resident}: {ms:.2f} ms/step "
          f"({root * root / ms * 1000 / 1e6:.1f}M psteps/s)", flush=True)


if __name__ == "__main__":
    ks = [int(a) for a in sys.argv[1:]] or [0, 4, 8]
    for k in ks:
        probe(k)
