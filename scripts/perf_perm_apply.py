"""North-star sort probe: is the resident permutation SELF-LOCATING?

VERDICT r4 #9 / BENCHMARKS ladder: the only alive attack on the ~123 ms
16.7M-row segment sort is temporal reuse. Bounded-RANK repair is dead
(cascade rank shifts scale with n — `perf_sort_coherence.py`), and
skip-K cadence is dead (r5e: churn compounds into stray keys). The
surviving shape is:

    sort 2 operands only (key, source-row)          ~2/5 of sort cost
    apply the permutation to the payload streams    windowed Pallas gather

The apply is affordable ONLY if the permutation is locally banded in a
SELF-LOCATING sense: for each destination block of B sorted rows, the
non-stray source indices span O(B) — the window is centred on the
block's own source-run median (known from the sorted operand itself),
NOT on the block's rank, so global cascade shifts cancel out.

This probe measures exactly that statistic on a real resident stream,
on CPU (no TPU time): evolve the classic XLA engine, maintain the
resident row order offline (stable argsort by the production segment-key
formula, `draw_pallas._pack_core` transcription), and per dest block
report the fraction of sources OUTSIDE a window of W*B around the
block's source median, for W in {2, 3, 4, 6}, plus the robust span.

Decision rule: if outside-window fraction at W=3 is ~churn-level (<10%)
and scale-stable from 65k to 262k, the windowed apply is worth a TPU
prototype; if spans grow with n, the idea dies here (recorded either
way, per repo convention).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/perf_perm_apply.py
"""

import numpy as np

TILE_H, TILE_W = 16, 256
B = 4096


def seg_keys(particles, view_size, view_res, tiles_x):
    """Production sort-key formula (numpy twin of `_pack_core`'s
    seg_key): bbox-top tile of the (prev -> pos) segment in window px.
    hwm fixed at 1 (a constant inset; doesn't move spans)."""
    pos, vel = particles[:2], particles[2:]
    prev = pos - vel  # resident reconstruct (`reconstruct_resident`)
    w, h = view_res[1], view_res[0]
    live = pos[0] > -9e5
    xs = []
    for p in (prev, pos):
        cx = p[0] * view_size[0]
        cy = p[1] * view_size[1]
        xs.append(((cx * 0.5 + 0.5) * w, (cy * 0.5 + 0.5) * h))
    top_x = np.maximum(np.minimum(xs[0][0], xs[1][0]) - 1.0, 0.0)
    top_y = np.maximum(np.minimum(xs[0][1], xs[1][1]) - 1.0, 0.0)
    key = ((np.floor(top_y).astype(np.int64) // TILE_H) * tiles_x
           + np.floor(top_x).astype(np.int64) // TILE_W)
    # Dead rows: far corner (pack kernel sends them last).
    return np.where(live, key, np.int64(1) << 40)


def run(root, frames=14, view_res=(1080, 1920)):
    from tendrils_tpu import EngineConfig, Tendrils
    from tendrils_tpu.ops import spawn

    cfg = EngineConfig(root_num=root, view_res=view_res,
                       splat_backend="xla", gather_backend="xla")
    eng = Tendrils(cfg)
    eng.setup()
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
    n = cfg.n
    tiles_x = (view_res[1] + 2 * TILE_W) // TILE_W + 1
    vs = np.asarray(eng._view_size, np.float32)

    order = np.arange(n)
    print(f"\n== root {root} ({n} rows, {view_res[0]}p view) ==")
    for f in range(frames):
        eng.frame()
        p = np.asarray(eng.sim.particles)[:, order]
        key = seg_keys(p, vs, view_res, tiles_x)
        perm = np.argsort(key, kind="stable")  # dest j <- current row perm[j]
        if f >= 4:  # warmed: structure has broken into filaments
            src = perm.astype(np.int64)
            nb = n // B
            sb = src[: nb * B].reshape(nb, B)
            med = np.median(sb, axis=1, keepdims=True)
            churn = None
            if f > 4:
                churn = float((key[: len(prev_key)] != prev_key).mean())
            outs = []
            for W in (2, 3, 4, 6):
                out = float((np.abs(sb - med) > W * B / 2).mean())
                outs.append(f"W={W}: {out:6.4f}")
            span = np.percentile(sb, 98, axis=1) - np.percentile(sb, 2,
                                                                 axis=1)
            print(f"f{f:02d} outside-window {' '.join(outs)} | "
                  f"span/B p50 {np.median(span) / B:5.1f} "
                  f"p95 {np.percentile(span, 95) / B:6.1f}"
                  + (f" | key churn {churn:5.3f}" if churn is not None
                     else ""))
        prev_key = key[perm]  # next frame's stored order = sorted
        order = order[perm]


if __name__ == "__main__":
    for root in (256, 512):
        run(root)
