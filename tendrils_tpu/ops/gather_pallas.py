"""Pallas TPU gather backend: sort-binned tile matmul bilinear sampling.

The logic step samples the flow grid at every particle's position
(`src/logic.frag:75` via `texture2D` — free on GPU). XLA's generic gather on
TPU runs effectively serially, so this backend mirrors the splat's binning:
sort particles by the 8×128-pixel tile their sample falls in, then a Pallas
kernel walks sorted blocks, DMAs each touched tile's 16×256 region of the
source grid into VMEM once, and evaluates all samples in that tile with one
MXU matmul:

    G^T[C·16, BK] = R[C·16, 256] @ X^T[256, BK]    (X: bilinear col weights)
    out[c, k]     = Σ_r A[r, k] · G^T[16c + r, k]  (A: bilinear row weights)

Sort bandwidth dominates, so only (key, x, y, slot) are sorted — corners and
bilinear weights are derived in-kernel. The source grid is laid out
`[C·HP, WP]` so every DMA slice is tile-aligned, and both matmul operands are
built directly in natural MXU orientation (a transposed-rhs contraction costs
~6× in per-visit relayouts).

Results come back in sorted order with their originating slot; a second
(slot-keyed) sort un-sorts them — still ~10× cheaper than an XLA
gather/scatter of the same size.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tile_geom import (HALF, PAD_LO_H, PAD_LO_W, REGION_H, REGION_W,
                        TILE_H, TILE_W, pad_dims as _pad_dims)

BLOCK = 4096
# Windowed matmuls (see draw_pallas): per tile visit, only the 512-sample
# windows whose key range covers the tile are multiplied (pl.when-gated), so
# clustered-not-sorted blocks don't pay a full-block matmul per stray tile.
WIN = 512
N_WIN = BLOCK // WIN


def _content_ok(h, w):
    """Whether the kernel can read the grid in content layout (clamped
    region DMAs, no XLA pad pass): region must fit and clamped starts must
    stay 8/128-aligned."""
    return (h >= REGION_H and w >= REGION_W
            and h % 8 == 0 and w % 128 == 0)


def _kernel(key_ref, x_ref, y_ref, grid_ref, out_ref, *rest, tiles_x,
            n_chan, hp, content_hw=None, from_p1=None, pack=False,
            recon=0):
    """One block of sorted sample points (padded-grid pixel coords).

    grid: f32[n_chan*HP, WP] in HBM (channels stacked on rows — every DMA
    slice is tile-aligned). region scratch: f32[n_chan*REGION_H, REGION_W].
    out: f32[n_chan, BLOCK] gathered values (sorted order).

    `content_hw=(h, w)`: the grid is the UNPADDED `[n_chan*h, w]` content
    (h % 8 == 0, w % 128 == 0, h >= REGION_H, w >= REGION_W) — each tile's
    region DMA start is clamped into the content so no XLA pad pass runs
    before the kernel. Sample coords/keys stay in padded convention; the
    fits contract guarantees every bilinear corner lies inside the clamped
    region (corners are >= the unclamped region start and < content end).

    `from_p1=(inv_p, xlo, xhi, ylo, yhi)` (static floats — the carried
    -force fast paths): `x_ref` is the draw's packed fixed-point p1 stream
    `i32[BLOCK]` (x in the low 15 bits, y in the high — unpacked and
    clamped in-kernel); `y_ref` is an SMEM `f32[1, 1]` scalar (only read
    when `pack`).

    `pack=True` (requires from_p1, n_chan == 2): `y_ref` holds
    `1/speedLimit` and `out_ref` is `i32[1, BLOCK]`: the gathered force
    packed as two q15 fields over ±speedLimit — exactly the one value
    operand the engine's force un-sort rides (`engine.force_from_aux`).

    `recon=1|2` (requires from_p1, resident-stream frames): the call also
    carries the sorted ride streams `npx, npy, vl[, tx, ty]` as extra
    inputs and reassembles the next frame's `particles`/`previous`
    [/`targets`] `f32[4, BLOCK]` outputs in the same pass (the
    `draw_pallas._reconstruct_kernel` math), with `y_ref` holding
    `speedLimit` — one kernel instead of gather + reconstruct, and the
    streams cross HBM once."""
    if recon:
        n_s = 3 + (2 if recon == 2 else 0)  # npx, npy, vl[, tx, ty]
        streams = (out_ref,) + rest[:n_s - 1]
        out_ref = rest[n_s - 1]
        part_ref, prev_ref = rest[n_s:n_s + 2]
        targ_ref = rest[n_s + 2] if recon == 2 else None
        facc = None
        region, sems = rest[-2:]
    elif pack:
        facc, region, sems = rest
    else:
        facc = None
        region, sems = rest

    key = key_ref[:]
    t_hi = jnp.max(key)  # works sorted or merely clustered

    # Hoisted corner/weight derivation.
    if from_p1 is None:
        gx = x_ref[:] - 0.5
        gy = y_ref[:] - 0.5
    else:
        inv_p, xlo, xhi, ylo, yhi = from_p1
        p1 = x_ref[:]
        gx = jnp.clip((p1 & HALF).astype(jnp.float32) * inv_p,
                      xlo, xhi) - 0.5
        gy = jnp.clip((p1 >> 15).astype(jnp.float32) * inv_p,
                      ylo, yhi) - 0.5
    c0f = jnp.floor(gx)
    r0f = jnp.floor(gy)
    wx0 = 1.0 - (gx - c0f)
    wy0 = 1.0 - (gy - r0f)
    r0 = r0f.astype(jnp.int32)
    c0 = c0f.astype(jnp.int32)

    acc = out_ref if facc is None else facc
    acc[:] = jnp.zeros_like(acc)

    # Hoisted per-window key ranges for the pl.when gates (per-visit
    # membership reductions are scalar-unit-bound; ranges are tight on
    # sorted input).
    wlo = [jnp.min(key[w * WIN:(w + 1) * WIN]) for w in range(N_WIN)]
    whi = [jnp.max(key[w * WIN:(w + 1) * WIN]) for w in range(N_WIN)]

    def tile_step(t):
        ty = t // tiles_x
        tx = t - ty * tiles_x
        row0 = ty * TILE_H
        col0 = tx * TILE_W
        if content_hw is None:
            src_row = row0
            src_col = col0
            src_h = hp
        else:
            # Clamp the region into the unpadded content. Clamp in TILE
            # units and multiply by the tiling constant LAST so Mosaic can
            # prove the dynamic slice start divisible by (8, 128)
            # (h % 8 == 0 and w % 128 == 0 make the bounds exact).
            ch_, cw_ = content_hw
            src_row = jnp.clip((row0 - PAD_LO_H) // 8, 0,
                               (ch_ - REGION_H) // 8) * 8
            src_col = jnp.clip((col0 - PAD_LO_W) // 128, 0,
                               (cw_ - REGION_W) // 128) * 128
            src_h = ch_

        copies = []
        for ch in range(n_chan):
            dma = pltpu.make_async_copy(
                grid_ref.at[pl.ds(ch * src_h + src_row, REGION_H),
                            pl.ds(src_col, REGION_W)],
                region.at[pl.ds(ch * REGION_H, REGION_H), :],
                sems.at[ch])
            dma.start()
            copies.append(dma)
        for dma in copies:
            dma.wait()

        # Region start in PADDED sample coords (content grids shift by the
        # clamped region origin; r0/c0 stay in the padded convention).
        if content_hw is None:
            reg_row = row0
            reg_col = col0
        else:
            reg_row = src_row + PAD_LO_H
            reg_col = src_col + PAD_LO_W

        for w in range(N_WIN):
            sl = slice(w * WIN, (w + 1) * WIN)

            @pl.when((wlo[w] <= t) & (whi[w] >= t))
            def _(w=w, sl=sl):
                mask = (key[sl] == t)
                lr = r0[sl] - reg_row
                lc = c0[sl] - reg_col

                # X^T[REGION_W, WIN] / A^T[REGION_H, WIN], natural
                # orientation.
                cols = jax.lax.broadcasted_iota(jnp.int32, (REGION_W, WIN),
                                                0)
                xt = ((cols == lc[None, :]).astype(jnp.float32)
                      * wx0[sl][None, :]
                      + (cols == (lc + 1)[None, :]).astype(jnp.float32)
                      * (1.0 - wx0[sl])[None, :])

                rows = jax.lax.broadcasted_iota(jnp.int32, (REGION_H, WIN),
                                                0)
                at = ((rows == lr[None, :]).astype(jnp.float32)
                      * wy0[sl][None, :]
                      + (rows == (lr + 1)[None, :]).astype(jnp.float32)
                      * (1.0 - wy0[sl])[None, :])
                at = at * mask.astype(jnp.float32)[None, :]

                gt = jnp.dot(region[:], xt,
                             preferred_element_type=jnp.float32)
                for ch in range(n_chan):
                    val = jnp.sum(
                        at * gt[ch * REGION_H:(ch + 1) * REGION_H, :],
                        axis=0)
                    acc[ch, sl] = acc[ch, sl] + val

        return jnp.min(jnp.where(key > t, key, jnp.int32(2 ** 30)))

    jax.lax.while_loop(lambda t: t <= t_hi, tile_step, jnp.min(key))

    if recon:
        # Resident-stream state reassembly — the SAME body
        # `draw_pallas._reconstruct_kernel` runs (shared helper, ADVICE
        # r3: the q15/live-bit semantics live in one place).
        from .draw_pallas import reconstruct_rows
        npx_ref, npy_ref, vl_ref = streams[:3]
        reconstruct_rows(
            y_ref[0, 0], npx_ref[:], npy_ref[:], vl_ref[:],
            part_ref, prev_ref,
            targ_ref if recon == 2 else None,
            streams[3][:] if recon == 2 else None,
            streams[4][:] if recon == 2 else None)

    if pack:
        # Pack the gathered force as the un-sort's single value operand
        # (mirrors `engine.force_from_aux`'s q15; quantisation ~3e-5 of
        # the force scale).
        inv_sl = y_ref[0, 0]

        def q(v):
            t = jnp.clip(v * inv_sl, -1.0, 1.0) * 0.5 + 0.5
            return jnp.round(t * HALF).astype(jnp.int32)

        out_ref[0, :] = q(facc[1]) * (HALF + 1) + q(facc[0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def bilinear_gather(grid, x, y, interpret=None):
    """Bilinearly sample `grid: f32[C, H, W]` at pixel coords `x`,`y: f32[M]`.

    Same contract as `sample.bilinear_sample` (CLAMP_TO_EDGE), returns
    `f32[C, M]`. `interpret=None` auto-selects interpreter mode off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c, h, w = grid.shape
    hp, wp = _pad_dims(h, w)
    tiles_x = wp // TILE_W

    m = x.shape[0]
    m_pad = (m + BLOCK - 1) // BLOCK * BLOCK
    pad = m_pad - m
    if pad:
        x = jnp.pad(x, (0, pad), constant_values=w - 0.5)
        y = jnp.pad(y, (0, pad), constant_values=h - 0.5)

    # CLAMP_TO_EDGE, then padded-grid coords.
    xs = jnp.clip(x, 0.5, w - 0.5) + PAD_LO_W
    ys = jnp.clip(y, 0.5, h - 0.5) + PAD_LO_H

    # Content-layout source when the grid is big + aligned enough: the
    # kernel clamps each region DMA into the content, so the XLA pad pass
    # (a full-grid copy + launch every frame) disappears. Small/odd grids
    # keep the padded layout.
    content = _content_ok(h, w)
    if content:
        gsrc = grid.reshape(c * h, w)
    else:
        gpad = jnp.pad(grid, ((0, 0), (PAD_LO_H, hp - h - PAD_LO_H),
                              (PAD_LO_W, wp - w - PAD_LO_W)))
        gsrc = gpad.reshape(c * hp, wp)

    key = ((jnp.floor(ys - 0.5).astype(jnp.int32) // TILE_H) * tiles_x
           + (jnp.floor(xs - 0.5).astype(jnp.int32) // TILE_W))

    slot = jax.lax.iota(jnp.int32, m_pad)
    # Unstable: ties only reorder whole (key, x, y, slot) rows within a
    # tile run, and the kernel bins by key runs (a stable sort would add a
    # hidden iota tiebreaker operand).
    key, xs, ys, slot = jax.lax.sort([key, xs, ys, slot], num_keys=1,
                                     is_stable=False)

    blocked = pl.BlockSpec((BLOCK,), lambda b: (b,),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, tiles_x=tiles_x, n_chan=c, hp=hp,
                          content_hw=((h, w) if content else None)),
        grid=(m_pad // BLOCK,),
        in_specs=[blocked, blocked, blocked,
                  pl.BlockSpec(memory_space=pl.ANY)],
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
    )(key, xs, ys, gsrc)

    # Un-sort back to slot order (sort is far cheaper than TPU scatter);
    # slots are unique — no stability needed.
    _, *vals = jax.lax.sort([slot] + [out[i] for i in range(c)],
                            num_keys=1, is_stable=False)
    return jnp.stack(vals)[:, :m]


@functools.partial(jax.jit, static_argnames=("interpret",))
def bilinear_gather_keyed(grid, xs, ys, keys, interpret=None):
    """Pre-binned bilinear gather: the caller supplies PADDED-grid pixel
    coords (already clamped so both bilinear corners lie inside the key
    tile's region) and per-sample tile `keys` in an already-clustered order
    — typically the fused draw's segment-sorted stream, so no sort or
    un-sort runs here at all. Returns `f32[C, M]` in input order.

    Keys must follow the draw's convention (any tile whose
    [REGION_H, REGION_W] region contains the sample's corners — usually the
    segment's bbox-top tile, see `draw_pallas._pack_kernel`)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c, h, w = grid.shape
    hp, wp = _pad_dims(h, w)
    tiles_x = wp // TILE_W

    m = xs.shape[0]
    m_pad = (m + BLOCK - 1) // BLOCK * BLOCK
    pad = m_pad - m
    if pad:
        xs = jnp.pad(xs, (0, pad), constant_values=PAD_LO_W + 0.5)
        ys = jnp.pad(ys, (0, pad), constant_values=PAD_LO_H + 0.5)
        keys = jnp.pad(keys, (0, pad))

    content = _content_ok(h, w)
    if content:
        gsrc = grid.reshape(c * h, w)
    else:
        gpad = jnp.pad(grid, ((0, 0), (PAD_LO_H, hp - h - PAD_LO_H),
                              (PAD_LO_W, wp - w - PAD_LO_W)))
        gsrc = gpad.reshape(c * hp, wp)

    blocked = pl.BlockSpec((BLOCK,), lambda b: (b,),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, tiles_x=tiles_x, n_chan=c, hp=hp,
                          content_hw=((h, w) if content else None)),
        grid=(m_pad // BLOCK,),
        in_specs=[blocked, blocked, blocked,
                  pl.BlockSpec(memory_space=pl.ANY)],
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
    )(keys, xs, ys, gsrc)
    return out[:, :m]


@functools.partial(jax.jit, static_argnames=("inv_p", "interpret"))
def bilinear_gather_keyed_q15(grid, p1_packed, keys, inv_sl, *, inv_p,
                              interpret=None):
    """Carried-force fast path: keyed gather of the 2-channel decayed flow
    straight from the fused draw's packed streams. Takes the draw's packed
    fixed-point `p1` (`i32[M]`, subpixel scale `1/inv_p`) and tile `keys`
    in segment-sorted order, unpacks + CLAMP_TO_EDGEs the coords in-kernel,
    and returns the gathered force q15-packed over `±1/inv_sl` as
    `i32[M]` — exactly the one value operand `engine.force_from_aux` rides
    through the row-order un-sort (no XLA unpack/clip/pack passes, no
    f32[2, M] round trip)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c, h, w = grid.shape
    assert c == 2
    hp, wp = _pad_dims(h, w)
    tiles_x = wp // TILE_W

    m = p1_packed.shape[0]
    m_pad = (m + BLOCK - 1) // BLOCK * BLOCK
    pad = m_pad - m
    if pad:
        p1_packed = jnp.pad(p1_packed, (0, pad))
        keys = jnp.pad(keys, (0, pad))

    content = _content_ok(h, w)
    if content:
        gsrc = grid.reshape(c * h, w)
    else:
        gpad = jnp.pad(grid, ((0, 0), (PAD_LO_H, hp - h - PAD_LO_H),
                              (PAD_LO_W, wp - w - PAD_LO_W)))
        gsrc = gpad.reshape(c * hp, wp)

    fp1 = (inv_p, PAD_LO_W + 0.5, PAD_LO_W + w - 0.5,
           PAD_LO_H + 0.5, PAD_LO_H + h - 0.5)
    blocked = pl.BlockSpec((BLOCK,), lambda b: (b,),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, tiles_x=tiles_x, n_chan=c, hp=hp,
                          content_hw=((h, w) if content else None),
                          from_p1=fp1, pack=True),
        grid=(m_pad // BLOCK,),
        in_specs=[blocked, blocked,
                  pl.BlockSpec((1, 1), lambda b: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, BLOCK), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((c, BLOCK), jnp.float32),
            pltpu.VMEM((c * REGION_H, REGION_W), jnp.float32),
            pltpu.SemaphoreType.DMA((c,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(keys, p1_packed, jnp.reshape(inv_sl, (1, 1)), gsrc)
    return out[0, :m]


@functools.partial(jax.jit, static_argnames=("inv_p", "interpret"))
def bilinear_gather_keyed_p1(grid, p1_packed, keys, *, inv_p,
                             interpret=None):
    """Resident-stream carried force: keyed gather straight from the
    draw's packed fixed-point `p1` stream (unpack + CLAMP_TO_EDGE
    in-kernel, like `bilinear_gather_keyed_q15`) returning the EXACT
    `f32[C, M]` values in input (sorted) order — the sorted order IS the
    new row order, so no quantisation and no un-sort."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c, h, w = grid.shape
    hp, wp = _pad_dims(h, w)
    tiles_x = wp // TILE_W

    m = p1_packed.shape[0]
    m_pad = (m + BLOCK - 1) // BLOCK * BLOCK
    pad = m_pad - m
    if pad:
        p1_packed = jnp.pad(p1_packed, (0, pad))
        keys = jnp.pad(keys, (0, pad))

    content = _content_ok(h, w)
    if content:
        gsrc = grid.reshape(c * h, w)
    else:
        gpad = jnp.pad(grid, ((0, 0), (PAD_LO_H, hp - h - PAD_LO_H),
                              (PAD_LO_W, wp - w - PAD_LO_W)))
        gsrc = gpad.reshape(c * hp, wp)

    fp1 = (inv_p, PAD_LO_W + 0.5, PAD_LO_W + w - 0.5,
           PAD_LO_H + 0.5, PAD_LO_H + h - 0.5)
    blocked = pl.BlockSpec((BLOCK,), lambda b: (b,),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, tiles_x=tiles_x, n_chan=c, hp=hp,
                          content_hw=((h, w) if content else None),
                          from_p1=fp1),
        grid=(m_pad // BLOCK,),
        in_specs=[blocked, blocked,
                  pl.BlockSpec((1, 1), lambda b: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
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
    )(keys, p1_packed, jnp.zeros((1, 1), jnp.float32), gsrc)
    return out[:, :m]


@functools.partial(jax.jit, static_argnames=("inv_p", "interpret"))
def gather_reconstruct_p1(grid, p1_packed, keys, npx, npy, vl, speed_limit,
                          tx=None, ty=None, *, inv_p, interpret=None):
    """Resident-stream frame tail in ONE Pallas pass: the keyed carried
    -force gather of `bilinear_gather_keyed_p1` PLUS the state reassembly
    of `draw_pallas.reconstruct_resident` — both walk the same sorted draw
    streams, so fusing them drops a kernel launch and reads the streams
    from HBM once per frame. Returns `(force f32[2, M], particles f32[4, M],
    previous f32[4, M][, targets f32[4, M]])` in sorted (= new row) order;
    the caller slices `[:, :n]`."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c, h, w = grid.shape
    assert c == 2
    hp, wp = _pad_dims(h, w)
    tiles_x = wp // TILE_W

    m = p1_packed.shape[0]
    m_pad = (m + BLOCK - 1) // BLOCK * BLOCK
    pad = m_pad - m
    targets = tx is not None
    if pad:
        p1_packed, keys, vl = (jnp.pad(v, (0, pad))
                               for v in (p1_packed, keys, vl))
        npx, npy = jnp.pad(npx, (0, pad)), jnp.pad(npy, (0, pad))
        if targets:
            tx, ty = jnp.pad(tx, (0, pad)), jnp.pad(ty, (0, pad))

    content = _content_ok(h, w)
    if content:
        gsrc = grid.reshape(c * h, w)
    else:
        gpad = jnp.pad(grid, ((0, 0), (PAD_LO_H, hp - h - PAD_LO_H),
                              (PAD_LO_W, wp - w - PAD_LO_W)))
        gsrc = gpad.reshape(c * hp, wp)

    fp1 = (inv_p, PAD_LO_W + 0.5, PAD_LO_W + w - 0.5,
           PAD_LO_H + 0.5, PAD_LO_H + h - 0.5)
    blocked = pl.BlockSpec((BLOCK,), lambda b: (b,),
                           memory_space=pltpu.VMEM)
    out4 = pl.BlockSpec((4, BLOCK), lambda b: (0, b),
                        memory_space=pltpu.VMEM)
    recon = 2 if targets else 1
    ins = [keys, p1_packed,
           jnp.reshape(jnp.asarray(speed_limit, jnp.float32), (1, 1)),
           gsrc, npx, npy, vl] + ([tx, ty] if targets else [])
    n_out = 4 if targets else 3
    outs = pl.pallas_call(
        functools.partial(_kernel, tiles_x=tiles_x, n_chan=c, hp=hp,
                          content_hw=((h, w) if content else None),
                          from_p1=fp1, recon=recon),
        grid=(m_pad // BLOCK,),
        in_specs=[blocked, blocked,
                  pl.BlockSpec((1, 1), lambda b: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)]
        + [blocked] * (5 if targets else 3),
        out_specs=[pl.BlockSpec((c, BLOCK), lambda b: (0, b),
                                memory_space=pltpu.VMEM)]
        + [out4] * (n_out - 1),
        out_shape=[jax.ShapeDtypeStruct((c, m_pad), jnp.float32)]
        + [jax.ShapeDtypeStruct((4, m_pad), jnp.float32)] * (n_out - 1),
        scratch_shapes=[
            pltpu.VMEM((c * REGION_H, REGION_W), jnp.float32),
            pltpu.SemaphoreType.DMA((c,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*ins)
    return outs
