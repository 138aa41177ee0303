"""Measure frame-over-frame sort coherence (temporal-repair feasibility).

The segment sort is the frame's floor (~6 ms at 1M). In resident-stream
frames the input is the PREVIOUS frame's sorted order, so the per-frame
disorder is bounded by particle motion. Measured here on a real trajectory
(256k particles, 544x960, ball spawn, 30 warm frames):

  - only ~5.9% of rows change tile key per frame (mean speed ~1.3 px);
  - rank displacement (incl. cascade shifts from insertions): p50 161,
    p99 11.5k, max ~20k — bounded by ~0.08n, NOT by a constant: cascade
    shifts scale linearly with n, so a fixed-window compare-exchange
    repair does not scale to 16M rows.

Surviving design (pending scripts/perf_batched_sort.py TPU data): sort
only the ~6% key-changers (a 16x smaller sort) and bitonic-MERGE them with
the still-sorted 94% (log n stages vs log^2 n) — the blocker is compacting
the changers without an XLA scatter. Run to reproduce the stats.
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main(root=512, res=(544, 960), warm=30):
    import tendrils_tpu as tt
    from tendrils_tpu.ops import spawn
    from tendrils_tpu.ops import tile_geom as tg

    cfg = tt.EngineConfig(root_num=root, view_res=res,
                          splat_backend="xla", gather_backend="xla",
                          flow_samples=2, flow_rows=1, view_samples=2)
    eng = tt.Tendrils(cfg)
    eng.setup()
    eng.state["fadeColor"] = [0, 0, 0, 0.05]
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))

    h, w = cfg.flow_shape
    hp, wp = tg.pad_dims(h, w)
    tiles_x = wp // tg.TILE_W
    vs = eng._view_size

    def keys_of(sim):
        pos = np.asarray(sim.particles[:2])
        x = np.clip((pos[0] * float(vs[0]) * 0.5 + 0.5) * w + tg.PAD_LO_W,
                    1.0, tg.PAD_LO_W + w + 1.0)
        y = np.clip((pos[1] * float(vs[1]) * 0.5 + 0.5) * h + tg.PAD_LO_H,
                    1.0, tg.PAD_LO_H + h + 1.0)
        return ((np.maximum(np.floor(y - 0.5), 0).astype(np.int64)
                 // tg.TILE_H) * tiles_x
                + (np.maximum(np.floor(x - 0.5), 0).astype(np.int64)
                   // tg.TILE_W))

    for _ in range(warm):
        eng.frame()
    k_prev = keys_of(eng.sim)
    order_prev = np.argsort(k_prev, kind="stable")
    eng.frame()
    k_new = keys_of(eng.sim)

    seq = k_new[order_prev]
    rank_new = np.empty_like(order_prev)
    rank_new[np.argsort(seq, kind="stable")] = np.arange(len(seq))
    disp = np.abs(rank_new - np.arange(len(seq)))
    n = len(seq)
    print(f"n={n}; keys changed: {(seq != k_prev[order_prev]).mean():.3%}")
    for wnd in (0, 64, 512, 2048, 8192, 32768, 131072):
        print(f"  rank displacement > {wnd:6d}: {(disp > wnd).mean():.4%}")
    print("p50/p99/p999/max:",
          np.percentile(disp, [50, 99, 99.9]).astype(int), disp.max())


if __name__ == "__main__":
    main(*([int(sys.argv[1])] if len(sys.argv) > 1 else []))
