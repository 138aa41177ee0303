"""Pallas gather backend vs the XLA bilinear oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from tendrils_tpu.ops import sample
from tendrils_tpu.ops.gather_pallas import bilinear_gather

import pytest

pytestmark = pytest.mark.kernel  # Pallas-kernel set (see pytest.ini)


def test_matches_bilinear_oracle():
    rng = np.random.default_rng(0)
    h, w, m = 96, 384, 5000
    grid = jnp.asarray(rng.uniform(-1, 1, (4, h, w)), jnp.float32)
    x = jnp.asarray(rng.uniform(-3, w + 3, m), jnp.float32)
    y = jnp.asarray(rng.uniform(-3, h + 3, m), jnp.float32)
    ref = sample.bilinear_sample(grid, x, y)
    out = bilinear_gather(grid, x, y, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_slot_order_preserved():
    # Output must be in input order despite internal sorting.
    h, w = 32, 128
    grid = jnp.arange(h * w, dtype=jnp.float32).reshape(1, h, w)
    x = jnp.asarray([100.5, 3.5, 50.5], jnp.float32)
    y = jnp.asarray([20.5, 1.5, 10.5], jnp.float32)
    out = bilinear_gather(grid, x, y, interpret=True)
    exp = [20 * w + 100, 1 * w + 3, 10 * w + 50]
    np.testing.assert_allclose(np.asarray(out[0]), exp, atol=1e-4)


def test_clamp_to_edge():
    grid = jnp.ones((2, 16, 128)) * jnp.arange(128)[None, None, :]
    out = bilinear_gather(grid, jnp.asarray([-10.0, 500.0]),
                          jnp.asarray([8.0, 8.0]), interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]), [0.0, 127.0], atol=1e-4)


def test_keyed_gather_content_layout():
    # Content-layout path (h % 8 == 0, w % 128 == 0, >= region): clamped
    # region DMAs replace the XLA pad pass. Keys = each sample's own tile
    # in the PADDED convention (both bilinear corners lie inside that
    # tile's region by construction).
    import jax

    from tendrils_tpu.ops.gather_pallas import bilinear_gather_keyed
    from tendrils_tpu.ops.tile_geom import (PAD_LO_H, PAD_LO_W, TILE_H,
                                            TILE_W, pad_dims)

    rng = np.random.default_rng(7)
    h, w, m = 96, 384, 4096
    _, wp = pad_dims(h, w)
    tiles_x = wp // TILE_W
    grid = jnp.asarray(rng.uniform(-2, 2, (2, h, w)), jnp.float32)
    x = jnp.asarray(rng.uniform(0.6, w - 0.6, m), jnp.float32)
    y = jnp.asarray(rng.uniform(0.6, h - 0.6, m), jnp.float32)
    xs = x + PAD_LO_W
    ys = y + PAD_LO_H
    key = ((jnp.floor(ys - 0.5).astype(jnp.int32) // TILE_H) * tiles_x
           + (jnp.floor(xs - 0.5).astype(jnp.int32) // TILE_W))
    # Clustered order, as the fused draw's aux stream guarantees.
    key, xs, ys, xo, yo = jax.lax.sort([key, xs, ys, x, y], num_keys=1)
    ref = sample.bilinear_sample(grid, xo, yo)
    out = bilinear_gather_keyed(grid, xs, ys, key, interpret=True)
    # Padded-coordinate offsets cost ~1 f32 ulp of weight precision vs the
    # oracle's content coords.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)


def test_keyed_gather_q15_pack():
    # The q15 variant takes the draw's packed p1 stream and emits the
    # un-sort's packed operand: in-kernel unpack + clamp + gather + q15
    # must match the unfused reference (gather then host-side pack).
    import jax

    from tendrils_tpu.ops.draw_pallas import pos_scale_for
    from tendrils_tpu.ops.gather_pallas import (bilinear_gather_keyed,
                                                bilinear_gather_keyed_q15)
    from tendrils_tpu.ops.tile_geom import (HALF, PAD_LO_H, PAD_LO_W,
                                            TILE_H, TILE_W, pad_dims)

    rng = np.random.default_rng(13)
    h, w, m = 64, 256, 4096
    _, wp = pad_dims(h, w)
    tiles_x = wp // TILE_W
    pscale = pos_scale_for((h, w))
    grid = jnp.asarray(rng.uniform(-2, 2, (2, h, w)), jnp.float32)
    xs = jnp.asarray(rng.uniform(0.6, w - 0.6, m) + PAD_LO_W, jnp.float32)
    ys = jnp.asarray(rng.uniform(0.6, h - 0.6, m) + PAD_LO_H, jnp.float32)
    p1 = (jnp.round(ys * pscale).astype(jnp.int32) * (HALF + 1)
          + jnp.round(xs * pscale).astype(jnp.int32))
    # Re-derive the quantised coords the kernel will see, for the oracle.
    xq = (p1 & HALF).astype(jnp.float32) / pscale
    yq = (p1 >> 15).astype(jnp.float32) / pscale
    key = ((jnp.floor(yq - 0.5).astype(jnp.int32) // TILE_H) * tiles_x
           + (jnp.floor(xq - 0.5).astype(jnp.int32) // TILE_W))
    key, p1, xq, yq = jax.lax.sort([key, p1, xq, yq], num_keys=1)

    sl = 1.7
    f = bilinear_gather_keyed(grid, xq, yq, key, interpret=True)

    def q15(v):
        t = np.clip(np.asarray(v) / sl, -1.0, 1.0) * 0.5 + 0.5
        return np.round(t * HALF).astype(np.int64)

    ref = q15(f[1]) * (HALF + 1) + q15(f[0])
    out = bilinear_gather_keyed_q15(grid, p1, key, jnp.float32(1.0 / sl),
                                    inv_p=1.0 / pscale, interpret=True)
    # f32 rounding at the q15 boundary can flip the last bit of a field.
    d0 = np.abs((np.asarray(out).astype(np.int64) & HALF) - (ref & HALF))
    d1 = np.abs((np.asarray(out).astype(np.int64) >> 15) - (ref >> 15))
    assert d0.max() <= 1 and d1.max() <= 1


def _recon_streams(m, h, w, seed=29):
    """Draw-convention sorted streams for the resident recon tests: packed
    p1 + tile keys + exact position rides + the q15 velocity/live word."""
    import jax

    from tendrils_tpu.ops.draw_pallas import pos_scale_for
    from tendrils_tpu.ops.tile_geom import (HALF, PAD_LO_H, PAD_LO_W,
                                            TILE_H, TILE_W, pad_dims)

    rng = np.random.default_rng(seed)
    _, wp = pad_dims(h, w)
    tiles_x = wp // TILE_W
    pscale = pos_scale_for((h, w))
    grid = jnp.asarray(rng.uniform(-2, 2, (2, h, w)), jnp.float32)
    xs = jnp.asarray(rng.uniform(0.6, w - 0.6, m) + PAD_LO_W, jnp.float32)
    ys = jnp.asarray(rng.uniform(0.6, h - 0.6, m) + PAD_LO_H, jnp.float32)
    p1 = (jnp.round(ys * pscale).astype(jnp.int32) * (HALF + 1)
          + jnp.round(xs * pscale).astype(jnp.int32))
    xq = (p1 & HALF).astype(jnp.float32) / pscale
    yq = (p1 >> 15).astype(jnp.float32) / pscale
    key = ((jnp.floor(yq - 0.5).astype(jnp.int32) // TILE_H) * tiles_x
           + (jnp.floor(xq - 0.5).astype(jnp.int32) // TILE_W))
    npx = jnp.asarray(rng.uniform(-1, 1, m), jnp.float32)
    npy = jnp.asarray(rng.uniform(-1, 1, m), jnp.float32)
    # Some inert rows exercise the alive test; live bit 30 + q15 fields.
    from tendrils_tpu.const import INERT
    inert = rng.uniform(size=m) < 0.1
    npx = jnp.where(jnp.asarray(inert), jnp.float32(INERT), npx)
    npy = jnp.where(jnp.asarray(inert), jnp.float32(INERT), npy)
    vl = jnp.asarray(
        rng.integers(0, 2, m) * (2 ** 30)
        + rng.integers(0, HALF + 1, m) * (HALF + 1)
        + rng.integers(0, HALF + 1, m), jnp.int32)
    tx = jnp.asarray(rng.uniform(-1, 1, m), jnp.float32)
    ty = jnp.asarray(rng.uniform(-1, 1, m), jnp.float32)
    key, p1, npx, npy, vl, tx, ty = jax.lax.sort(
        [key, p1] + [jax.lax.bitcast_convert_type(v, jnp.int32)
                     for v in (npx, npy)] + [vl]
        + [jax.lax.bitcast_convert_type(v, jnp.int32) for v in (tx, ty)],
        num_keys=1)
    npx, npy, tx, ty = (jax.lax.bitcast_convert_type(v, jnp.float32)
                        for v in (npx, npy, tx, ty))
    return grid, p1, key, npx, npy, vl, tx, ty, pscale


def test_gather_reconstruct_p1_matches_composition():
    """`gather_reconstruct_p1` (fused keyed gather + state reassembly) must
    match the two-kernel composition `bilinear_gather_keyed_p1` +
    `reconstruct_resident` bitwise — targets and no-targets, including a
    non-BLOCK-multiple length whose padded tail must slice away
    (ADVICE r3)."""
    from tendrils_tpu.ops.draw_pallas import reconstruct_resident
    from tendrils_tpu.ops.gather_pallas import (bilinear_gather_keyed_p1,
                                                gather_reconstruct_p1)

    h, w = 64, 256
    sl = 1.3
    for m, targets in ((4096, True), (3000, False), (3000, True)):
        grid, p1, key, npx, npy, vl, tx, ty, pscale = _recon_streams(m, h, w)
        targs = (tx, ty) if targets else (None, None)

        fused = gather_reconstruct_p1(grid, p1, key, npx, npy, vl,
                                      jnp.float32(sl), *targs,
                                      inv_p=1.0 / pscale, interpret=True)
        force_ref = bilinear_gather_keyed_p1(grid, p1, key,
                                             inv_p=1.0 / pscale,
                                             interpret=True)
        rec_ref = reconstruct_resident(npx, npy, vl, jnp.float32(sl),
                                       *targs, interpret=True)

        np.testing.assert_array_equal(np.asarray(fused[0])[:, :m],
                                      np.asarray(force_ref)[:, :m])
        names = ["particles", "previous"] + (["targets"] if targets else [])
        for i, name in enumerate(names):
            np.testing.assert_array_equal(
                np.asarray(fused[1 + i])[:, :m],
                np.asarray(rec_ref[i])[:, :m], err_msg=f"{name} m={m}")
