"""Pallas TPU gather backend: sort-binned tile matmul bilinear sampling.

The logic step samples the flow grid at every particle's position
(`src/logic.frag:75` via `texture2D` — free on GPU). XLA's generic gather on
TPU runs effectively serially, so this backend mirrors the splat's binning:
sort particles by the 8×128-pixel tile their sample falls in, then a Pallas
kernel walks sorted blocks, DMAs each touched tile's 16×256 region of the
source grid into VMEM once, and evaluates all samples in that tile with one
MXU matmul:

    G[BK, C·16] = X[BK, 256] @ R[256, C·16]        (X: bilinear col weights,
                                                    R: region, col-major)
    out[c, k]   = Σ_r A[k, r] · G[k, 16c + r]      (A: bilinear row weights)

The source grid is pre-transposed once on the XLA side to `[WP, C·HP]` so
the kernel needs no in-kernel transposes — each tile region is C plain 2D
DMA slices.

Results come back in sorted order with their originating slot; a second
(slot-keyed) sort un-sorts them — still ~10× cheaper than an XLA
gather/scatter of the same size.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .splat_pallas import (PAD_LO_H, PAD_LO_W, REGION_H, REGION_W, TILE_H,
                           TILE_W, _pad_dims)

BLOCK = 2048


def _kernel(key_ref, r0_ref, c0_ref, wx0_ref, wy0_ref, grid_ref, out_ref,
            region, sems, *, tiles_x, n_chan, hp):
    """One block of sorted sample points.

    grid: f32[n_chan*HP, WP] in HBM (padded source, channels stacked on
    rows so every DMA slice is tile-aligned: 16-row sublane slices, 256-col
    lane slices).
    region scratch: f32[n_chan*REGION_H, REGION_W].
    out:  f32[n_chan, BLOCK] gathered values (sorted order).
    """
    t_hi = key_ref[BLOCK - 1]

    key = key_ref[:]
    r0 = r0_ref[:]
    c0 = c0_ref[:]
    wx0 = wx0_ref[:]
    wy0 = wy0_ref[:]

    out_ref[:] = jnp.zeros_like(out_ref)

    def tile_step(t):
        ty = t // tiles_x
        tx = t - ty * tiles_x
        row0 = ty * TILE_H
        col0 = tx * TILE_W

        copies = []
        for ch in range(n_chan):
            dma = pltpu.make_async_copy(
                grid_ref.at[pl.ds(ch * hp + row0, REGION_H),
                            pl.ds(col0, REGION_W)],
                region.at[pl.ds(ch * REGION_H, REGION_H), :],
                sems.at[ch])
            dma.start()
            copies.append(dma)

        mask = (key == t)
        lr = r0 - row0
        lc = c0 - col0

        # X^T[REGION_W, BLOCK]: bilinear column weights, built transposed so
        # the matmul below is in natural (un-transposed) MXU orientation.
        cols = jax.lax.broadcasted_iota(jnp.int32, (REGION_W, BLOCK), 0)
        xt = ((cols == lc[None, :]).astype(jnp.float32) * wx0[None, :]
              + (cols == (lc + 1)[None, :]).astype(jnp.float32)
              * (1.0 - wx0)[None, :])

        # A^T[REGION_H, BLOCK]: bilinear row weights (masked to this tile).
        rows = jax.lax.broadcasted_iota(jnp.int32, (REGION_H, BLOCK), 0)
        at = ((rows == lr[None, :]).astype(jnp.float32) * wy0[None, :]
              + (rows == (lr + 1)[None, :]).astype(jnp.float32)
              * (1.0 - wy0)[None, :])
        at = at * mask.astype(jnp.float32)[None, :]

        for dma in copies:
            dma.wait()

        # G^T[n_chan*16, BLOCK] = R[n_chan*16, 256] @ X^T[256, BLOCK].
        gt = jnp.dot(region[:], xt, preferred_element_type=jnp.float32)
        # out[c, k] = sum_r at[r, k] * gt[c*16 + r, k]
        for ch in range(n_chan):
            val = jnp.sum(at * gt[ch * REGION_H:(ch + 1) * REGION_H, :],
                          axis=0)
            out_ref[ch, :] = out_ref[ch, :] + val

        return jnp.min(jnp.where(key > t, key, jnp.int32(2 ** 30)))

    jax.lax.while_loop(lambda t: t <= t_hi, tile_step, key_ref[0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def bilinear_gather(grid, x, y, interpret=False):
    """Bilinearly sample `grid: f32[C, H, W]` at pixel coords `x`,`y: f32[M]`.

    Same contract as `sample.bilinear_sample` (CLAMP_TO_EDGE), returns
    `f32[C, M]`.
    """
    c, h, w = grid.shape
    hp, wp = _pad_dims(h, w)
    tiles_x = wp // TILE_W

    m = x.shape[0]
    m_pad = (m + BLOCK - 1) // BLOCK * BLOCK
    pad = m_pad - m
    if pad:
        x = jnp.pad(x, (0, pad), constant_values=w + 64.0)
        y = jnp.pad(y, (0, pad), constant_values=h + 8.0)

    # CLAMP_TO_EDGE: clamp the sample position into the texel-centre span.
    xs = jnp.clip(x, 0.5, w - 0.5)
    ys = jnp.clip(y, 0.5, h - 0.5)

    # Padded source with channels stacked along rows: [C*HP, WP] — a free
    # reshape, and every kernel DMA slice is tile-aligned.
    gpad = jnp.pad(grid, ((0, 0), (PAD_LO_H, hp - h - PAD_LO_H),
                          (PAD_LO_W, wp - w - PAD_LO_W)))
    gpad_t = gpad.reshape(c * hp, wp)

    gx = xs + PAD_LO_W - 0.5
    gy = ys + PAD_LO_H - 0.5
    c0 = jnp.floor(gx)
    r0 = jnp.floor(gy)
    wx0 = 1.0 - (gx - c0)
    wy0 = 1.0 - (gy - r0)
    r0i = r0.astype(jnp.int32)
    c0i = c0.astype(jnp.int32)
    key = (r0i // TILE_H) * tiles_x + (c0i // TILE_W)

    slot = jax.lax.iota(jnp.int32, m_pad)
    key, r0i, c0i, wx0, wy0, slot = jax.lax.sort(
        [key, r0i, c0i, wx0, wy0, slot], num_keys=1)

    out = pl.pallas_call(
        functools.partial(_kernel, tiles_x=tiles_x, n_chan=c, hp=hp),
        grid=(m_pad // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda b: (b,),
                         memory_space=pltpu.VMEM),  # key
            pl.BlockSpec((BLOCK,), lambda b: (b,),
                         memory_space=pltpu.VMEM),  # r0
            pl.BlockSpec((BLOCK,), lambda b: (b,),
                         memory_space=pltpu.VMEM),  # c0
            pl.BlockSpec((BLOCK,), lambda b: (b,),
                         memory_space=pltpu.VMEM),  # wx0
            pl.BlockSpec((BLOCK,), lambda b: (b,),
                         memory_space=pltpu.VMEM),  # wy0
            pl.BlockSpec(memory_space=pl.ANY),  # grid (HBM)
        ],
        out_specs=pl.BlockSpec((c, BLOCK), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, m_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c * REGION_H, REGION_W), jnp.float32),
            pltpu.SemaphoreType.DMA((c,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(key, r0i, c0i, wx0, wy0, gpad_t)

    # Un-sort back to slot order (sort is far cheaper than TPU scatter).
    _, *vals = jax.lax.sort([slot] + [out[i] for i in range(c)], num_keys=1)
    return jnp.stack(vals)[:, :m]
