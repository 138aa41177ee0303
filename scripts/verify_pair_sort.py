"""Drive the pair-merge segment sort end-to-end on the real TPU.

Public-surface drive (Tendrils.frame) with TT_SORT_PAIRS engaged — 30
frames through flat/aligned/offset phases, compiled kernels — with
evidence-of-life checks, plus a flat-sort control whose trajectories must
match per identity to the pair-merge run within accumulation tolerance.
Run as `TT_SORT_PAIRS=32 python scripts/verify_pair_sort.py`.
"""
import os
import sys

sys.path.insert(0, ".")

import numpy as np

import tendrils_tpu as tt
from tendrils_tpu import engine as eng_mod
from tendrils_tpu.ops import spawn


def drive(pairs, frames=30):
    from tendrils_tpu.ops import draw_pallas as dp
    dp.SORT_PAIRS = pairs
    eng = tt.Tendrils(tt.EngineConfig(
        root_num=512, view_res=(720, 1280), flow_samples=2, flow_rows=1,
        view_samples=2, splat_backend="pallas", gather_backend="pallas"))
    eng.setup()
    eng.state["fadeColor"] = [0, 0, 0, 0.05]
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
    assert eng_mod.pair_sort_enabled(eng.config) == (pairs >= 4)
    for _ in range(frames):
        eng.frame()
    parts = np.asarray(eng.sim.particles)
    alive = int((parts[0] > -9e5).sum())
    floww = float(np.asarray(eng.sim.flow[3]).max())
    lit = float(np.asarray(eng.view_image)[..., :3].max())
    print(f"pairs={pairs}: alive={alive} flow_max_w={floww:.4f} "
          f"view_max={lit:.4f} frames_fed={eng._frame_no}")
    assert alive > 1000 and floww > 1e-3 and lit > 1e-3
    order = np.argsort(np.asarray(eng.sim.idx))
    return parts[:, order]


if __name__ == "__main__":
    pairs = int(os.environ.get("TT_SORT_PAIRS", "32"))
    pp = drive(pairs)
    pf = drive(0)
    err = np.abs(pp - pf).max()
    print(f"pair-vs-flat identity-aligned max err: {err:.2e}")
    assert err < 1e-3, err
    print("verify_pair_sort: ALL OK")
