"""Compiled-kernel TPU smoke test (VERDICT r1 item 9).

CI runs the Pallas kernels in interpret mode only, which cannot catch
Mosaic layout/alignment regressions — this script runs each kernel
COMPILED on the real TPU at tiny shapes and asserts against the XLA
oracle. `timeout 550 python scripts/tpu_smoke.py` (exit 0 = pass).
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() != "cpu", (
        "tpu_smoke must run on the TPU (got cpu backend)")

    from tendrils_tpu.ops import sample, splat
    from tendrils_tpu.ops.draw_pallas import fused_draw_accumulate
    from tendrils_tpu.ops.gather_pallas import (bilinear_gather,
                                                bilinear_gather_keyed)
    from tendrils_tpu.ops.splat_pallas import splat_accumulate
    from tendrils_tpu.ops.tile_geom import PAD_LO_H, PAD_LO_W, TILE_H, TILE_W

    rng = np.random.RandomState(0)
    h, w = 64, 512
    n = 256

    # --- generic splat backend vs XLA scatter oracle ---
    x = jnp.asarray(rng.uniform(2, w - 2, n), jnp.float32)
    y = jnp.asarray(rng.uniform(2, h - 2, n), jnp.float32)
    vals = jnp.asarray(rng.rand(3, n), jnp.float32)
    alpha = jnp.asarray(rng.uniform(0.1, 0.9, n), jnp.float32)
    num_p, ws_p, lt_p = [np.asarray(v) for v in
                         splat_accumulate((h, w), x, y, vals, alpha,
                                          interpret=False)]
    num_o, ws_o, lt_o = [np.asarray(v) for v in
                         splat.splat_accumulate_xla((h, w), x, y, vals,
                                                    alpha)]
    # The kernel's f32 jnp.dot lowers to the MXU's DEFAULT precision on TPU
    # (bf16 passes) — ~0.5% relative on deposits, far below the splat's own
    # sampling granularity.
    np.testing.assert_allclose(num_p, num_o, rtol=2e-2, atol=5e-3)
    np.testing.assert_allclose(ws_p, ws_o, rtol=2e-2, atol=5e-3)
    np.testing.assert_allclose(lt_p, lt_o, rtol=2e-2, atol=5e-3)
    print("splat_pallas compiled: ok", flush=True)

    # --- gather vs XLA bilinear oracle ---
    grid = jnp.asarray(rng.rand(2, h, w), jnp.float32)
    gx = jnp.asarray(rng.uniform(1, w - 1, n), jnp.float32)
    gy = jnp.asarray(rng.uniform(1, h - 1, n), jnp.float32)
    got = np.asarray(bilinear_gather(grid, gx, gy, interpret=False))
    want = np.asarray(sample.bilinear_sample(grid, gx, gy))
    # Same MXU default-precision story for the gather's one-hot matmuls.
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=2e-3)
    print("bilinear_gather compiled: ok", flush=True)

    # --- keyed gather (draw-convention keys) ---
    xs = jnp.clip(gx, 0.5, w - 0.5) + PAD_LO_W
    ys = jnp.clip(gy, 0.5, h - 0.5) + PAD_LO_H
    from tendrils_tpu.ops.tile_geom import pad_dims
    tiles_x = pad_dims(h, w)[1] // TILE_W
    keys = ((jnp.floor(ys - 0.5).astype(jnp.int32) // TILE_H) * tiles_x
            + (jnp.floor(xs - 0.5).astype(jnp.int32) // TILE_W))
    order = jnp.argsort(keys)
    got = np.asarray(bilinear_gather_keyed(
        grid, xs[order], ys[order], keys[order], interpret=False))
    np.testing.assert_allclose(got, np.asarray(want)[:, np.asarray(order)],
                               rtol=1e-2, atol=2e-3)
    print("bilinear_gather_keyed compiled: ok", flush=True)

    # --- packed-p1 keyed gather variants (q15-pack and exact f32) ---
    from tendrils_tpu.ops.draw_pallas import pos_scale_for
    from tendrils_tpu.ops.gather_pallas import (bilinear_gather_keyed_p1,
                                                bilinear_gather_keyed_q15)
    from tendrils_tpu.ops.tile_geom import HALF
    pscale = pos_scale_for((h, w))
    p1pk = (jnp.round(ys * pscale).astype(jnp.int32) * (HALF + 1)
            + jnp.round(xs * pscale).astype(jnp.int32))[order]
    # Oracle at the kernel's quantised coords.
    xq = (p1pk & HALF).astype(jnp.float32) / pscale
    yq = (p1pk >> 15).astype(jnp.float32) / pscale
    want_q = np.asarray(sample.bilinear_sample(
        grid, xq - PAD_LO_W, yq - PAD_LO_H))
    got_f = np.asarray(bilinear_gather_keyed_p1(
        grid, p1pk, keys[order], inv_p=1.0 / pscale, interpret=False))
    np.testing.assert_allclose(got_f, want_q, rtol=1e-2, atol=2e-3)
    sl = 0.013
    got_q = np.asarray(bilinear_gather_keyed_q15(
        grid, p1pk, keys[order], jnp.float32(1.0 / sl),
        inv_p=1.0 / pscale, interpret=False)).astype(np.int64)

    def q15_h(v):
        t = np.clip(v / sl, -1.0, 1.0) * 0.5 + 0.5
        return np.round(t * HALF).astype(np.int64)

    # Gathered values exceed ±sl here — both fields saturate identically;
    # tolerance in q15 steps covers the compiled matmul precision.
    ref_q = q15_h(want_q[1]) * (HALF + 1) + q15_h(want_q[0])
    assert np.abs((got_q & HALF) - (ref_q & HALF)).max() <= 2
    assert np.abs((got_q >> 15) - (ref_q >> 15)).max() <= 2
    print("bilinear_gather_keyed_p1/q15 compiled: ok", flush=True)

    # --- resident reconstruct kernel ---
    from tendrils_tpu.const import INERT
    from tendrils_tpu.ops.draw_pallas import reconstruct_resident
    m = 4096
    npx = jnp.asarray(rng.uniform(-1, 1, m), jnp.float32)
    npx = npx.at[7].set(INERT)
    npy = jnp.asarray(rng.uniform(-1, 1, m), jnp.float32)
    npy = npy.at[7].set(INERT)
    vl = jnp.asarray(rng.randint(0, 2 ** 30, m), jnp.int32) \
        + jnp.asarray(rng.randint(0, 2, m), jnp.int32) * (2 ** 30)
    slr = jnp.float32(0.02)
    part, prev = [np.asarray(v) for v in
                  reconstruct_resident(npx, npy, vl, slr,
                                       interpret=False)]
    vel_u = np.asarray(vl) & (2 ** 30 - 1)
    nvx = ((vel_u & HALF).astype(np.float32) * (2.0 / HALF) - 1.0) * 0.02
    alive = (np.asarray(npx) != INERT) | (np.asarray(npy) != INERT)
    np.testing.assert_allclose(part[0], np.asarray(npx), atol=1e-6)
    np.testing.assert_allclose(part[2], nvx, atol=1e-6)
    np.testing.assert_allclose(
        prev[0], np.where(alive, np.asarray(npx) - nvx, np.asarray(npx)),
        atol=1e-6)
    print("reconstruct_resident compiled: ok", flush=True)

    # --- fused draw (pack + segment-direct splat) vs XLA accumulate ---
    p0 = jnp.stack([x, y], -1)
    p1 = p0 + jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    vel = jnp.asarray(rng.uniform(-0.008, 0.008, (2, n)), jnp.float32)
    pos_ndc = jnp.zeros((2, n), jnp.float32)
    mapped = jnp.zeros((4, n), jnp.float32)
    live = jnp.ones((n,), jnp.float32)
    flow_parts, view_parts = fused_draw_accumulate(
        (h, w), p0, p1, vel, pos_ndc, mapped, live, jnp.float32(0.01),
        jnp.float32(16.0), samples=2, interpret=False,
        base_color=jnp.asarray([1.0, 1.0, 1.0, 0.5]),
        speed_alpha=jnp.float32(1e-6))
    # Oracle: the flow pass via the XLA segment splat.
    from tendrils_tpu.ops import flow as flow_ops
    payload = flow_ops.flow_payload(vel, jnp.float32(16.0),
                                    jnp.float32(0.01))
    onum, ows, olt = splat.splat_segments_accumulate(
        p0, p1, payload, payload[3] * live, grid_hw=(h, w),
        width=jnp.float32(1.0), samples=2, rows=1, backend="xla")
    fnum, fws, flt = [np.asarray(v) for v in flow_parts]
    # Totals match to the kernel's 15-bit fixed-point + bf16 granularity.
    np.testing.assert_allclose(fws.sum(), np.asarray(ows).sum(), rtol=5e-3)
    np.testing.assert_allclose(flt.sum(), np.asarray(olt).sum(), rtol=5e-3)
    # Velocity channels' sums nearly cancel (signed) — absolute tolerance
    # scaled to the gross deposit mass, not relative.
    np.testing.assert_allclose(fnum.sum(axis=(1, 2)),
                               np.asarray(onum).sum(axis=(1, 2)),
                               rtol=5e-3, atol=5e-3 * float(fws.sum()))
    assert np.asarray(view_parts[1]).sum() > 0  # view deposited too
    print("fused_draw_accumulate compiled: ok", flush=True)

    # --- fused resolve vs the XLA tail ---
    from tendrils_tpu.ops import render
    from tendrils_tpu.ops.draw_pallas import (N_CHAN, _widen_excess,
                                              resolve_fused)
    from tendrils_tpu.ops.splat import composite_over
    hp, wp = pad_dims(h, w)
    touched = (rng.uniform(0, 1, (hp, wp)) < 0.3).astype(np.float32)
    accum = np.zeros((N_CHAN, hp, wp), np.float32)
    accum[3] = rng.uniform(0, 3, (hp, wp)) * touched
    accum[9] = rng.uniform(0, 3, (hp, wp)) * touched
    for c in (0, 1, 2):
        accum[c] = rng.uniform(-1, 1, (hp, wp)) * accum[3]
    for c in range(5, 9):
        accum[c] = rng.uniform(0, 1, (hp, wp)) * accum[9]
    accum[4] = -rng.uniform(0, 2, (hp, wp)) * touched
    accum[10] = -rng.uniform(0, 2, (hp, wp)) * touched
    accum = jnp.asarray(accum)
    flow0 = jnp.asarray(rng.uniform(-1, 1, (4, h, w)), jnp.float32)
    view0 = jnp.asarray(rng.uniform(0, 1, (4, h, w)), jnp.float32)
    fade = jnp.asarray([0.1, 0.2, 0.0, 0.5], jnp.float32)
    args = (fade, jnp.float32(0.0), jnp.float32(16.0), jnp.float32(16.1),
            jnp.float32(1.0), jnp.float32(2.0), jnp.float32(1.0))
    got_f, got_v, got_e = [np.asarray(v) for v in resolve_fused(
        accum, flow0, view0, *args, want_eff=True, interpret=False)]
    out_c = accum[:, PAD_LO_H:PAD_LO_H + h, PAD_LO_W:PAD_LO_W + w]
    fnum = jnp.concatenate([out_c[0:2], (16.0 * out_c[3])[None],
                            out_c[2:3]])
    ref_f = composite_over(flow0, *_widen_excess(
        (fnum, out_c[3], out_c[4]), jnp.float32(2.0)))
    v_in = render.fade_fill(view0, fade)
    ref_v = composite_over(v_in, *_widen_excess(
        (out_c[5:9], out_c[9], out_c[10]), jnp.float32(1.0)))
    ref_e = ref_f[:2] * jnp.maximum(0.0,
                                    1.0 - (16.1 - ref_f[2]) * 1.0)[None]
    np.testing.assert_allclose(got_f, np.asarray(ref_f), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(got_v, np.asarray(ref_v), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(got_e, np.asarray(ref_e), rtol=1e-4,
                               atol=1e-4)
    print("resolve_fused compiled: ok", flush=True)

    # --- resident-stream engine frame COMPILED vs the classic carried
    # path at tiny shapes (n=256 < seg_block exercises the padded tail of
    # the post-sort p1 recompute, `_bin_and_splat(p1_from_ride=...)`) ---
    import tendrils_tpu as tt
    from tendrils_tpu.ops import spawn as spawn_ops

    def mk_engine(resident):
        cfg = tt.EngineConfig(root_num=16, view_res=(32, 128),
                              flow_samples=2, flow_rows=1, view_samples=2,
                              splat_backend="pallas",
                              gather_backend="pallas", fused_draw=True,
                              resident_stream=resident)
        eng = tt.Tendrils(cfg)
        eng.setup()
        eng.spawn_shader(
            lambda p, e: spawn_ops.ball(p, e._frag_xy, 0.6, 0.01))
        return eng

    ea = mk_engine(True)
    eb = mk_engine(False)
    for _ in range(3):
        ea.frame()
        eb.frame()

    def by_identity(sim):
        order = np.argsort(np.asarray(sim.idx))
        return np.asarray(sim.particles)[:, order]

    # Resident reconstructs vel from the q15 stream; the classic carried
    # force crossed the same quantisation — trajectories agree closely.
    np.testing.assert_allclose(by_identity(ea.sim), by_identity(eb.sim),
                               atol=1e-3)
    assert float(np.asarray(ea.sim.flow)[3].sum()) > 1e-3
    print("resident vs classic engine compiled: ok", flush=True)
    print("tpu_smoke: ALL OK", flush=True)


if __name__ == "__main__":
    main()
