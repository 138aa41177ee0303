"""Verify the flow_off gate end-to-end on the real TPU.

Drives the public `Tendrils` surface twice — flowWeight=0 (gate ACTIVE:
no flow gather, no carried force) and flowWeight=1.5 (gate off, carried
force) — and checks evidence of life on both: alive particles, weighted
flow texels, non-trivial view image. Then times the interactive frame at
config-1 scale (65k, 720p) with the gate on vs off.
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import tendrils_tpu as tt
from tendrils_tpu import engine as eng_mod
from tendrils_tpu.ops import spawn


def drive(flow_weight, frames=20):
    eng = tt.Tendrils(tt.EngineConfig(root_num=256, view_res=(720, 1280)))
    eng.setup()
    eng.state["fadeColor"] = [0, 0, 0, 0.05]
    eng.state["flowWeight"] = flow_weight
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
    gate = eng_mod.flow_force_unused(eng.state)
    for _ in range(frames):
        eng.frame()
    parts = np.asarray(eng.sim.particles)
    alive = int((parts[0] > -9e5).sum())
    floww = float(np.asarray(eng.sim.flow[3]).max())
    img = np.asarray(eng.view_image)
    lit = float(img[..., :3].max())
    # timed steady-state frames (host readback each to beat the tunnel lie)
    t0 = time.perf_counter()
    m = 30
    for _ in range(m):
        eng.frame()
        float(eng.sim.particles[0, 0])
    ms = (time.perf_counter() - t0) / m * 1e3
    print(f"flowWeight={flow_weight}: gate={gate} alive={alive} "
          f"flow_max_w={floww:.4f} view_max={lit:.4f} "
          f"frame={ms:.2f} ms (incl ~24ms tunnel)")
    assert alive > 1000, "particles died"
    assert floww > 1e-3, "flow never written"
    assert lit > 1e-3, "view image black"
    assert gate == (flow_weight == 0.0)
    return eng


if __name__ == "__main__":
    drive(0.0)
    drive(1.5)
    print("verify_flow_off: ALL OK")
