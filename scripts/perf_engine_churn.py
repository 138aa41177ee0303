"""In-engine merge-reorder diagnostics at config-5 geometry: per-frame
key churn (by particle identity, from the carried sort_key + idx) and
whether each frame merged or fell back (a flat-sort fallback leaves the
carry FULLY key-sorted; a successful merge is only tile-sorted, with
within-tile U-before-C inversions).

Run: timeout 1800 python scripts/perf_engine_churn.py [root=4096] [frames=6]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from tendrils_tpu import EngineConfig, Tendrils
from tendrils_tpu.engine import merge_reorder_enabled
from tendrils_tpu.ops import spawn
from tendrils_tpu.ops.draw_pallas import PACK_IDX_BITS, seg_tile_count


def main():
    root = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    view = (2160, 3840) if root >= 1024 else (270, 480)
    cfg = EngineConfig(root_num=root, view_res=view,
                       splat_backend="pallas", gather_backend="pallas",
                       flow_samples=2, flow_rows=1, view_samples=2,
                       merge_reorder=True)
    eng = Tendrils(cfg)
    eng.setup()
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
    assert merge_reorder_enabled(cfg)
    bits = 20 if (cfg.n <= (1 << 20)
                  and seg_tile_count(view) <= (1 << 11)) else PACK_IDX_BITS

    prev = None
    n = cfg.n
    for f in range(frames):
        eng.state["noiseScale"] = 2.0 + 0.5 * (f % 3)
        eng.timer.tick()
        eng.frame()
        ks = np.asarray(eng.sim.sort_key)
        idx = np.asarray(eng.sim.idx)
        fully = bool(np.all(np.diff(ks) >= 0))
        tile_ok = bool(np.all(np.diff(ks >> bits) >= 0))
        line = (f"frame {f}: fully_sorted={fully} (fallback likely) "
                f"tile_sorted={tile_ok}")
        if prev is not None:
            by_id_prev = np.empty(n, ks.dtype)
            by_id_prev[prev[1]] = prev[0]
            by_id = np.empty(n, ks.dtype)
            by_id[idx] = ks
            churn = float((by_id != by_id_prev).mean())
            line += f" churn_vs_prev={churn:.4f} (cap {1 / 8:.4f})"
        print(line, flush=True)
        prev = (ks, idx)


if __name__ == "__main__":
    main()
