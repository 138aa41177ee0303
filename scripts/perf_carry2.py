"""Carry slowdown: interactive _frame_jit vs scan; pieces inside one frame.

`timeout 550 python scripts/perf_carry2.py` on TPU."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tendrils_tpu import EngineConfig, Tendrils  # noqa: E402
from tendrils_tpu.ops import spawn  # noqa: E402


def engine(carry):
    cfg = EngineConfig(root_num=1024, view_res=(1080, 1920),
                       splat_backend="pallas", gather_backend="pallas",
                       flow_samples=2, flow_rows=1, view_samples=2,
                       carry_force=carry)
    eng = Tendrils(cfg)
    eng.setup()
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
    return eng


def time_frames(eng, n=20, warm=3):
    for _ in range(warm):
        eng.frame()
    float(eng.sim.particles[0, 0])
    t0 = time.time()
    for _ in range(n):
        eng.frame()
    float(eng.sim.particles[0, 0])
    return (time.time() - t0) / n * 1000


def main():
    print(f"interactive carry=False: {time_frames(engine(False)):.2f} "
          "ms/frame", flush=True)
    print(f"interactive carry=True: {time_frames(engine(True)):.2f} "
          "ms/frame", flush=True)


if __name__ == "__main__":
    main()
