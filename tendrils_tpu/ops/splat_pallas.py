"""Pallas TPU splat backend: sort-binned tile matmul scatter.

The reference gets line rasterisation for free from the GPU rasteriser
(`src/index.js:300-303`); XLA's generic scatter on TPU runs effectively
serially (~µs per element), so this backend re-derives the scatter as MXU
work:

  1. Bin each (bilinear point) sample to an 8×128-pixel tile of the target
     grid and sort samples by tile id (XLA multi-operand sort, ~5 ms/M).
  2. A Pallas kernel walks fixed-size blocks of the sorted samples
     sequentially. For each tile a block touches, it read-modify-writes the
     tile's 16×256 padded region in HBM, accumulating every channel with ONE
     MXU matmul: contrib[n_chan·16, 256] = A[n_chan·16, BK] @ X[BK, 256],
     where A carries the bilinear row weights × per-channel sample values and
     X the bilinear column weights. The sequential grid makes the RMW
     race-free, and region overlap (the bilinear halo) simply adds — no merge
     pass needed.

Accumulated channels (matching `splat.splat_accumulate_xla`): C payload
channels × alpha, the alpha sum, and the bilinear-weighted log-transmittance.

Cost: 2·16·256 ≈ 8.2K MXU FLOPs per sample per channel — ~66 KFLOP/sample for
the usual 8 channels — versus ~1 µs per element for XLA scatter.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile geometry: content tiles of 8 rows × 128 cols (the f32 register tile);
# each RMW region is 16×256 so the +1 bilinear halo never crosses out.
TILE_H = 8
TILE_W = 128
REGION_H = 16
REGION_W = 256
# Leading pad so corner indices as low as -1 stay in range; trailing pad so
# the region of the lowest/rightmost reachable tile fits.
PAD_LO_H, PAD_LO_W = TILE_H, TILE_W
PAD_HI_H, PAD_HI_W = REGION_H, REGION_W

BLOCK = 2048  # samples per kernel step


def _pad_dims(h, w):
    hp = PAD_LO_H + h + PAD_HI_H
    wp = PAD_LO_W + w + PAD_HI_W
    hp = (hp + TILE_H - 1) // TILE_H * TILE_H
    wp = (wp + TILE_W - 1) // TILE_W * TILE_W
    return hp, wp


def _kernel(key_ref, r0_ref, c0_ref, av_ref, wx0_ref, accum_ref,
            out_ref, region, sem_in, sem_out, *, tiles_x, n_chan):
    """One block of sorted samples (see module docstring).

    key:  i32[BLOCK]      tile id (sorted ascending)
    r0:   i32[BLOCK]      bilinear corner base row (padded-grid coords)
    c0:   i32[BLOCK]      corner base col
    av:   f32[n_chan, 2, BLOCK]  per-channel values × bilinear row weights
    wx0:  f32[BLOCK]      bilinear column weight of c0 (c0+1 gets 1-wx0)
    out:  f32[n_chan, HP, WP] in HBM, aliased with the zero-initialised
          `accum` input; RMW'd tile-region by tile-region.
    """
    del accum_ref  # aliased with out_ref; all access goes through out_ref
    t_hi = key_ref[BLOCK - 1]

    key = key_ref[:]
    r0 = r0_ref[:]
    c0 = c0_ref[:]
    wx0 = wx0_ref[:]

    def tile_step(t):
        ty = t // tiles_x
        tx = t - ty * tiles_x
        row0 = ty * TILE_H
        col0 = tx * TILE_W

        load = pltpu.make_async_copy(
            out_ref.at[:, pl.ds(row0, REGION_H), pl.ds(col0, REGION_W)],
            region, sem_in)
        load.start()

        mask = (key == t)
        lr = r0 - row0  # local region coords, [0, REGION_H-2] when in tile
        lc = c0 - col0

        # A[n_chan*16, BLOCK]: bilinear row one-hot × channel value.
        rows = jax.lax.broadcasted_iota(jnp.int32, (REGION_H, BLOCK), 0)
        a_r0 = (rows == lr[None, :]).astype(jnp.float32)
        a_r1 = (rows == (lr + 1)[None, :]).astype(jnp.float32)
        live = mask.astype(jnp.float32)[None, :]
        a = jnp.concatenate(
            [(a_r0 * av_ref[ch, 0][None, :] + a_r1 * av_ref[ch, 1][None, :])
             * live for ch in range(n_chan)], axis=0)

        # X[BLOCK, REGION_W]: bilinear column weights.
        cols = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, REGION_W), 1)
        x = ((cols == lc[:, None]).astype(jnp.float32) * wx0[:, None]
             + (cols == (lc + 1)[:, None]).astype(jnp.float32)
             * (1.0 - wx0)[:, None])

        contrib = jnp.dot(a, x, preferred_element_type=jnp.float32)
        contrib = contrib.reshape(n_chan, REGION_H, REGION_W)

        load.wait()
        region[:] = region[:] + contrib

        store = pltpu.make_async_copy(
            region,
            out_ref.at[:, pl.ds(row0, REGION_H), pl.ds(col0, REGION_W)],
            sem_out)
        store.start()
        store.wait()

        # Jump to the next occupied tile (skip empty gaps).
        return jnp.min(jnp.where(key > t, key, jnp.int32(2 ** 30)))

    jax.lax.while_loop(lambda t: t <= t_hi, tile_step, key_ref[0])


@functools.partial(jax.jit, static_argnames=("grid_hw", "interpret"))
def splat_accumulate(grid_hw, x, y, values, alpha, interpret=None):
    """Drop-in replacement for `splat.splat_accumulate_xla` (same contract).

    `interpret=None` auto-selects interpreter mode off-TPU (CPU tests)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = grid_hw
    hp, wp = _pad_dims(h, w)
    tiles_x = wp // TILE_W

    c = values.shape[0]
    n_chan = c + 2
    m = x.shape[0]

    # Pad sample count to a block multiple. Pad samples sit at the far clamp
    # corner with zero alpha.
    m_pad = (m + BLOCK - 1) // BLOCK * BLOCK
    pad = m_pad - m
    if pad:
        x = jnp.pad(x, (0, pad), constant_values=w + 64.0)
        y = jnp.pad(y, (0, pad), constant_values=h + 8.0)
        alpha = jnp.pad(alpha, (0, pad))
        values = jnp.pad(values, ((0, 0), (0, pad)))

    # Padded-grid coords. Clamp keeps every reachable tile's region inside
    # the padded grid: yp <= PAD_LO_H + h + 1 ⇒ r0 <= PAD_LO_H + h ⇒ region
    # end <= PAD_LO_H + h + 16 <= hp (same for columns). Samples pushed by
    # the clamp are >1px off-grid and get zero alpha — they'd contribute
    # nothing on-grid in the XLA backend either.
    xp = jnp.clip(x + PAD_LO_W, 1.0, PAD_LO_W + w + 1.0)
    yp = jnp.clip(y + PAD_LO_H, 1.0, PAD_LO_H + h + 1.0)
    moved = ((x + PAD_LO_W != xp) | (y + PAD_LO_H != yp))
    alpha = jnp.where(moved, 0.0, alpha)

    gx = xp - 0.5
    gy = yp - 0.5
    c0 = jnp.floor(gx)
    r0 = jnp.floor(gy)
    wx0 = 1.0 - (gx - c0)
    wy0 = 1.0 - (gy - r0)
    r0i = r0.astype(jnp.int32)
    c0i = c0.astype(jnp.int32)

    key = (r0i // TILE_H) * tiles_x + (c0i // TILE_W)

    # Channel values: payload×alpha, alpha, log transmittance.
    log1a = jnp.log1p(-jnp.minimum(alpha, 1.0 - 1e-4))
    chan = jnp.concatenate([values * alpha[None, :], alpha[None, :],
                            log1a[None, :]])  # [n_chan, M]

    # Bin by tile.
    key, r0i, c0i, wx0, wy0, *chan_rows = jax.lax.sort(
        [key, r0i, c0i, wx0, wy0] + [chan[i] for i in range(n_chan)],
        num_keys=1)
    chan = jnp.stack(chan_rows)

    # Pre-fold bilinear row weights into channel values: av[ch, 0/1, M].
    av = jnp.stack([chan * wy0[None, :], chan * (1.0 - wy0)[None, :]],
                   axis=1)

    accum0 = jnp.zeros((n_chan, hp, wp), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, tiles_x=tiles_x, n_chan=n_chan),
        grid=(m_pad // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda b: (b,),
                         memory_space=pltpu.VMEM),  # key
            pl.BlockSpec((BLOCK,), lambda b: (b,),
                         memory_space=pltpu.VMEM),  # r0
            pl.BlockSpec((BLOCK,), lambda b: (b,),
                         memory_space=pltpu.VMEM),  # c0
            pl.BlockSpec((n_chan, 2, BLOCK), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),  # av
            pl.BlockSpec((BLOCK,), lambda b: (b,),
                         memory_space=pltpu.VMEM),  # wx0
            pl.BlockSpec(memory_space=pl.ANY),  # accum (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n_chan, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_chan, REGION_H, REGION_W), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(key, r0i, c0i, av, wx0, accum0)

    out = out[:, PAD_LO_H:PAD_LO_H + h, PAD_LO_W:PAD_LO_W + w]
    return out[:c], out[c], out[c + 1]
