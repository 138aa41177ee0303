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
    print("tpu_smoke: ALL OK", flush=True)


if __name__ == "__main__":
    main()
