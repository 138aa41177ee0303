"""Fused draw: both render passes (flow payload + view colour) in ONE
segment sort + ONE Pallas splat kernel.

The reference draws particles twice per frame — GL_LINES into the flow FBO,
then into the view buffer (`src/index.js:296-337`). Both passes splat the
same segment samples, so on TPU they share one tile binning: 11 accumulation
channels (flow: vel×α, weight×α, α, log-transmittance — the constant stamp is
derived at resolve; view: colour×α, α, log-transmittance) land in bf16
MXU matmuls per tile visit, A[ch·REGION_H, WIN] @ X[WIN, REGION_W].

Sort bandwidth is the hot cost (`lax.sort` ≈ 4.5 ms + 0.45 ms/operand per
1M rows), so the sort runs at SEGMENT granularity (half the sample rows)
over 5 packed int32 operands: a combined key (`tile << 20 | row id` — sort
key, un-sort id and flow-gather key in one word), endpoint pairs at 1/8 px
fixed point, velocity over ±speedLimit + live bit, rgba8 colours (computed
in the pack kernel — the whole render colour model runs there). The splat
kernel expands each segment's deposit samples in-kernel and derives
everything else (box coverage, flow alpha, log-transmittances) on the VPU.

Line width: the reference sets `gl.lineWidth` per pass (`flowWidth` for the
flow pass, `lineWidth` for the view pass — `src/index.js:302,336`). Here each
sample deposits a separable box footprint of the pass's width instead of a
bilinear tent: the tile-visit matmul's row/col weight matrices hold
box-overlap coverage (a width-1 box IS the bilinear tent), so widening is
free — no post-blur pass. Isotropic rather than strictly perpendicular
spread (documented deviation; the flow field is sampled smoothly anyway,
ref's own mipmap intent `src/index.js:305-312`). Widths beyond
`KMAX_WIDTH` (the region margin budget) fall back to a variance-matched
post box-blur of the excess.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..const import INERT
from .splat import composite_over
from .tile_geom import (HALF, PAD_LO_H, PAD_LO_W, REGION_H, REGION_W,
                        TILE_H, TILE_W, pad_dims as _pad_dims)

# 16x256-px content tiles (tile_geom): 4x fewer tile visits than the generic
# backend's 8x128, and the bf16 MXU eats the 2.25x-bigger matmul. Block of
# 4096 samples halves block-boundary revisits.
BLOCK = 4096
# Pack/expand are elementwise passes — their per-grid-step overhead (~5 µs)
# dominates at small blocks, so they run on much larger blocks than the
# splat's VMEM-bound BLOCK.
PACK_SEG = 16384
# Windowed matmuls: each tile visit only multiplies the 512-sample windows
# whose [min, max] key range covers the tile (pl.when-gated). Sorted blocks
# do ~2-5 window matmuls per visit instead of one full-block matmul (~4x
# less MXU+build work); merely *clustered* blocks (resident-sorted particles
# that have drifted for a few frames) stop paying a full-block matmul per
# extra tile their strays touch.
WIN = 512
N_WIN = BLOCK // WIN
# Accumulated channels: flow (vx·α, vy·α, wf·α, α, log(1-α)) + view
# (r·α, g·α, b·α, a·α, α, log(1-α)). The flow stamp channel is derived at
# resolve time (stamp ≡ current time for every sample ⇒ num_stamp =
# time · wsum), saving a channel.
N_CHAN = 11
N_FLOW = 5  # flow channels (vx·α, vy·α, wf·α, α, log(1-α)) lead the stack
N_VIEW = N_CHAN - N_FLOW  # view channels (r·α, g·α, b·α, a·α, α, log(1-α))
# Sort-operand packing thresholds (module-level so tests can force modes).
# gather=1: combined 20-bit key|id single operand (small N).
G1_MAX_ROWS = 1 << 20
G1_MAX_TILES = 1 << 11
# gather=3 (big-N resident): key and id share ONE operand
# (keym << PACK_IDX_BITS | idx_lo); the remaining idx high bits (<= 5)
# hide in the riding positions' f32 mantissa LSBs (x: 2 bits, y: 3 —
# <= ~5e-7 px of position noise/frame), dropping the whole id operand
# from the segment sort (~15 ms/operand at 16.7M rows,
# scripts/perf_sort_i64.py).
PACK_IDX_BITS = 19
PACK_MAX_TILES = 1 << 12
PACK_MAX_IDS = 1 << 24
COLOR_MAX = 4.0  # colour channels clamp range for fixed-point
# Max in-kernel line width: a sample keyed by its segment's bbox-top tile
# deposits inside that tile's region; REGION_H=32 splits its 16-row margin
# between line width (<=8) and segment extent (~8 px of travel).
KMAX_WIDTH = 8.0


def _pos_scale(hp, wp):
    """Subpixel steps per pixel (power of two) so coords fit 15 bits.

    1080p grids get 1/8 px, 4K 1/4 px — splat placement jitter ≤ half that,
    far below the reference rasteriser's own sampling granularity."""
    p = 64
    while p > 1 and max(hp, wp) * p > HALF:
        p //= 2
    return p


def _pack2(hi, lo):
    return hi * (HALF + 1) + lo


def _q15(v, lo, hi):
    """Quantise [lo, hi] -> [0, HALF]."""
    t = jnp.clip((v - lo) / (hi - lo), 0.0, 1.0)
    return jnp.round(t * HALF).astype(jnp.int32)


_BIG = 2 ** 30  # sentinel key (plain int: jnp constants can't be captured
# by pallas kernel closures)

# Chunked segment sort: `lax.sort` is a bitonic network (depth ~log²n), so
# at big N sorting C independent chunks as ONE batched [C, n/C] call cuts
# the comparator depth. The splat kernel only needs PER-BLOCK sortedness,
# and chunk sizes are BLOCK multiples, so blocks never span a chunk
# boundary — correctness is unchanged; the cost is that every chunk spans
# the whole grid, so distinct-region DMA visits rise toward C× at high
# density. The crossover is a hardware measurement (BENCHMARKS.md round-3
# ledger). TT_SORT_CHUNKS: 0 = auto policy, else an explicit chunk count.
SORT_CHUNKS = int(os.environ.get("TT_SORT_CHUNKS", "0"))

# An odd-even PAIR-MERGE segment sort (alternating-phase chunk-pair sorts
# exploiting the resident stream's frame-coherent order) was built and
# measured end-to-end at 16M/4K (battery r5a, BENCHMARKS.md round 5): the
# extra region-DMA visits from pads/strays spread across every chunk pair
# cost ~1.7x the flat sort's frame (353.6 vs 208.1 ms/step) — DELETED, the
# flat global sort stays the policy at every scale.

# Splat A/X build-cost DIAGNOSTIC (VERDICT r4 #6): "x" replaces the
# per-visit X-matrix cover build with a loop-invariant constant, "a" the
# A-matrix cover/channel stack, "ax" both. TIMING PROBE ONLY — deposited
# output is wrong when set; never enable in production. Isolates the VPU
# build cost of a window visit from its MXU dot + region DMA
# (`scripts/perf_xbuild.py` records the measurement in BENCHMARKS.md).
SPLAT_NOBUILD = os.environ.get("TT_SPLAT_NOBUILD", "")

# Splat window matmul shape: 1 = merge the samples into the contraction
# axis (ONE [chs·H, samples·win]×[samples·win, W] dot per window — fewer,
# bigger MXU ops; gate/build overhead independent of `samples`), 0 = one
# dot per sample (K = win). Read at trace time, like SORT_CHUNKS; exists
# because config 5 (16M/4K) regressed ~70 ms across the commit window that
# introduced the merge (BENCHMARKS.md round-4 battery B) — the A/B decides.
SPLAT_MERGE_K = os.environ.get("TT_SPLAT_MERGE", "1") == "1"


def _sort_chunks(n_pad, seg_block):
    """Resolve the segment-sort chunk count: the largest divisor of the
    block count <= the request, so chunks tile the stream exactly and every
    splat block stays inside one chunk."""
    want = SORT_CHUNKS
    if want == 0:
        # Auto: FLAT sort at every N. Chunking cuts the sort itself 2.5x
        # at 8M+ rows (BENCHMARKS.md round-4 battery B) but each chunk
        # spans the whole grid, so splat region-DMA visits rise toward C×
        # and eat the saving: scan-timed 16.7M/4K engine frames measure a
        # WASH (288-291 ms for flat through C=256, battery C) and banded
        # pre-sorting loses ~10 ms — keep the simplest policy.
        want = 1
    blocks = n_pad // seg_block
    c = max(1, min(want, blocks))
    while blocks % c:
        c -= 1
    return c


def _win_split(seg):
    """Split a block of `seg` segments into equal windows of ~WIN: the
    smallest window count that divides `seg` evenly (windows must tile the
    block exactly — a floored count would silently drop the tail's
    deposits, and Mosaic needs static window shapes). For power-of-two
    blocks this is exactly `seg / WIN`; odd sample counts (seg = BLOCK //
    samples not a WIN multiple) get the nearest exact divisor."""
    n_win = max(1, -(-seg // WIN))  # ceil
    while seg % n_win:
        n_win += 1
    return n_win, seg // n_win


def _kernel(scal_ref, keym_ref, *rest, tiles_x, pscale, samples, h, w,
            derive_p0=False, scalar_color=False, flow_off=False):
    """Segment-direct fused splat: expands each packed segment to its
    `samples` deposit points IN-KERNEL (no per-sample HBM stream at all)
    and accumulates both passes' box footprints via tile-visit matmuls.

    scal: f32[1, 32] SMEM (speedLimit, time, flowWidth, lineWidth, + render
    colour params — colours were already packed by the pack kernel; slots
    16+ are the fused-step params, unused here).

    Tiles are visited in FOUR passes by (row, col) parity: within a pass,
    visited regions are disjoint (regions span 1.5 tiles; same-parity tiles
    are 2 apart), so the next tile's region load is prefetched into the
    other scratch slot while the current tile computes — the serial
    load→compute→store chain only pays the store. Samples inherit their
    segment's bbox-top tile key (the pack kernel's sort key) whenever the
    deposit fits that region — exactly-sorted runs — so per-window
    [min, max] gates stay tight; long segments' overflow samples fall back
    to their own footprint-top tile (rare strays).

    `derive_p0=True` (hot resident frame: a step immediately preceded the
    draw, so p1 = p0 + vel exactly): the p0 stream doesn't exist — p0 is
    reconstructed as p1 - vel·viewScale (scal slots 30/31), saving a whole
    sort operand. The 15-bit vel quantisation shifts the reconstruction
    ≤ ~1e-3 px; a segment whose re-derived key tile differs from the pack's
    sort key just becomes a rare stray (correctness is key-self-consistent
    — deposits follow the kernel's own keys)."""
    rest = list(rest)
    p0_ref = None if derive_p0 else rest.pop(0)
    p1_ref = rest.pop(0)
    vl_ref = rest.pop(0)
    rgba_ref = None if scalar_color else rest.pop(0)
    _accum, out_ref, regions, sem_in, sem_out = rest
    del _accum
    # NOTE: first-visit region-load elision (zero the scratch instead of
    # DMA-ing the not-yet-written accumulator) was tried and is UNSOUND
    # here: regions overlap 1.5x1.5 tiles, so a neighbouring tile's earlier
    # store may have deposited into this region's footprint — skipping the
    # load would zero it away. A 9-neighbourhood visited check would make
    # it safe but only elides ~25% of loads (~0.1 ms at 1M/1080p).
    speed_limit = scal_ref[0, 0]
    width_f = jnp.clip(scal_ref[0, 2], 1.0, KMAX_WIDTH)
    width_v = jnp.clip(scal_ref[0, 3], 1.0, KMAX_WIDTH)
    hw_f = width_f * 0.5
    hw_v = width_v * 0.5
    inv_wf = 1.0 / width_f  # row-axis normalisation: total mass ∝ width
    inv_wv = 1.0 / width_v
    hwm = jnp.maximum(jnp.clip(scal_ref[0, 2], 1.0, KMAX_WIDTH),
                      jnp.clip(scal_ref[0, 3], 1.0, KMAX_WIDTH)) * 0.5
    inv_p = 1.0 / pscale

    # --- hoisted per-block unpack + in-kernel expand (VPU, once) ---
    def unq(q, lo, hi):
        return q.astype(jnp.float32) * ((hi - lo) / HALF) + lo

    p1 = p1_ref[:]
    p1x = (p1 & HALF).astype(jnp.float32) * inv_p
    p1y = (p1 >> 15).astype(jnp.float32) * inv_p
    vl = vl_ref[:]
    live = (vl >> 30).astype(jnp.float32)
    vel_u = vl & (2 ** 30 - 1)
    vx = unq(vel_u & HALF, -1.0, 1.0) * speed_limit
    vy = unq(vel_u >> 15, -1.0, 1.0) * speed_limit
    if derive_p0:
        # Euler inverse in pixel space (vel is the NDC step displacement).
        p0x = jnp.clip(p1x - vx * (scal_ref[0, 30] * 0.5 * w),
                       1.0, PAD_LO_W + w + 1.0)
        p0y = jnp.clip(p1y - vy * (scal_ref[0, 31] * 0.5 * h),
                       1.0, PAD_LO_H + h + 1.0)
    else:
        p0 = p0_ref[:]
        p0x = (p0 & HALF).astype(jnp.float32) * inv_p
        p0y = (p0 >> 15).astype(jnp.float32) * inv_p
    dx = p1x - p0x
    dy = p1y - p0y

    # Segment key tile (the sort key, reproduced bit-exactly) + region
    # extents for the per-sample fits test.
    seg_top_x = jnp.maximum(jnp.minimum(p0x, p1x) - hwm, 0.0)
    seg_top_y = jnp.maximum(jnp.minimum(p0y, p1y) - hwm, 0.0)
    seg_row = jnp.floor(seg_top_y).astype(jnp.int32) // TILE_H
    seg_col = jnp.floor(seg_top_x).astype(jnp.int32) // TILE_W
    seg_key = seg_row * tiles_x + seg_col
    reg_y_hi = (seg_row * TILE_H).astype(jnp.float32) + REGION_H
    reg_x_hi = (seg_col * TILE_W).astype(jnp.float32) + REGION_W

    # GL's DDA lights one fragment per MAJOR-AXIS pixel, so deposit mass
    # scales with the major extent (matches ops/splat.segment_samples;
    # measured vs the GL-pen oracle in tests/test_splat_oracle.py).
    ascale_seg = live * jnp.maximum(jnp.maximum(jnp.abs(dx), jnp.abs(dy)),
                                    1.0) / samples
    if scalar_color:
        # 1x1 colour map: the whole render colour model
        # (`src/render/index.vert:57-94`) runs HERE at f32 (no rgba8
        # quantisation, no rgba sort operand) — the map contributes four
        # scalars (scal slots 16-19, pre-scaled by colorMapAlpha) and the
        # vignette position derives from p1.
        inv_sl = 1.0 / jnp.maximum(speed_limit, 1e-12)
        vnx = vx * inv_sl
        vny = vy * inv_sl
        mr, mg, mb, ma = (scal_ref[0, 16 + i] for i in range(4))
        speed_alpha = scal_ref[0, 4]
        sin_decay = scal_ref[0, 5]
        flow_decay = scal_ref[0, 6]
        base = [scal_ref[0, 7 + i] for i in range(4)]
        flow_c = [scal_ref[0, 11 + i] for i in range(4)]
        speed_rate = jnp.minimum(
            (vnx * vnx + vny * vny) / jnp.maximum(speed_alpha, 1e-12), 1.0)
        al0 = vnx
        al1 = vnx * -0.5 + vny * -0.8660254037844385
        al2 = vnx * -0.5 + vny * 0.8660254037844387
        k1 = 1.0 - flow_decay

        def falign(a_, a_gbr):
            return (a_ + (a_gbr * k1 - a_) * sin_decay) * 0.5 + 0.5

        fa = (falign(al0, al1), falign(al1, al2), falign(al2, al0))

        def clip01(v):
            return jnp.clip(v, 0.0, 1.0)

        ones = jnp.ones_like(vnx)
        cr = (clip01(base[0] * base[3] * ones) + clip01(mr * ma * ones)
              + clip01(flow_c[0] * fa[0] * flow_c[3]))
        cg = (clip01(base[1] * base[3] * ones) + clip01(mg * ma * ones)
              + clip01(flow_c[1] * fa[1] * flow_c[3]))
        cb = (clip01(base[2] * base[3] * ones) + clip01(mb * ma * ones)
              + clip01(flow_c[2] * fa[2] * flow_c[3]))
        ca = (clip01(base[3] * ones) + clip01(ma * ones)
              + clip01(flow_c[3] * ones))
        posx = ((p1x - PAD_LO_W) * (2.0 / w) - 1.0) \
            / jnp.maximum(scal_ref[0, 30], 1e-12)
        posy = ((p1y - PAD_LO_H) * (2.0 / h) - 1.0) \
            / jnp.maximum(scal_ref[0, 31], 1e-12)
        d2 = jnp.sqrt(posx * posx + posy * posy)
        amt = jnp.minimum(1.0 - d2, 1.0)
        ut = 1.0 - amt
        bz = (0.2 * ut + amt) * ut + amt
        vig = jnp.clip(jnp.maximum(bz, 0.0), 0.2, 1.0)
        ca = ca * speed_rate * vig
        cr = jnp.clip(cr, 0.0, COLOR_MAX)
        cg = jnp.clip(cg, 0.0, COLOR_MAX)
        cb = jnp.clip(cb, 0.0, COLOR_MAX)
        ca = jnp.clip(ca, 0.0, COLOR_MAX)
    else:
        rgba = rgba_ref[:]
        c8 = COLOR_MAX / 255.0
        cr = (rgba & 255).astype(jnp.float32) * c8
        cg = ((rgba >> 8) & 255).astype(jnp.float32) * c8
        cb = ((rgba >> 16) & 255).astype(jnp.float32) * c8
        ca = ((rgba >> 24) & 127).astype(jnp.float32) * (COLOR_MAX / 127.0)
    # flow_off (`flowWeight == 0`, static): the flow grid is never read —
    # the five flow channels are dropped from the accumulator entirely
    # (config-1's frame is dominated by the 11-channel accumulator's HBM
    # round-trip; see BENCHMARKS.md round-5 config-1 ledger).
    if not flow_off:
        wf = jnp.minimum(jnp.sqrt(vx * vx + vy * vy) / speed_limit, 1.0)

    keys = []    # per-sample tile keys, [samples][SEG]
    gxs = []     # continuous pixel-centre coords
    gys = []
    chans = []   # accumulation channels per sample (11, or 6 w/ flow_off)
    for s in range(samples):
        ts = (s + 0.5) / samples
        xp = jnp.clip(p0x + dx * ts, 1.0, PAD_LO_W + w + 1.0)
        yp = jnp.clip(p0y + dy * ts, 1.0, PAD_LO_H + h + 1.0)
        moved = ((p0x + dx * ts != xp) | (p0y + dy * ts != yp))
        a = jnp.where(moved, 0.0, ascale_seg)

        xq = jnp.round(xp * pscale).astype(jnp.int32)
        yq = jnp.round(yp * pscale).astype(jnp.int32)
        gxq = xq.astype(jnp.float32) * inv_p - 0.5
        gyq = yq.astype(jnp.float32) * inv_p - 0.5
        fits = ((gyq + 0.5 + hwm <= reg_y_hi)
                & (gxq + 0.5 + hwm <= reg_x_hi))
        top_x = jnp.maximum(gxq + 0.5 - hwm, 0.0)
        top_y = jnp.maximum(gyq + 0.5 - hwm, 0.0)
        own_key = ((jnp.floor(top_y).astype(jnp.int32) // TILE_H) * tiles_x
                   + (jnp.floor(top_x).astype(jnp.int32) // TILE_W))
        keys.append(jnp.where(fits, seg_key, own_key))
        gxs.append(gxq)
        gys.append(gyq)

        av = jnp.clip(ca * a, 0.0, 1.0 - 1e-4)
        view_ch = [cr * av, cg * av, cb * av, ca * av, av,
                   jnp.log1p(-av)]
        if flow_off:
            chans.append(view_ch)
        else:
            af = jnp.minimum(wf * a, 1.0 - 1e-4)
            chans.append([vx * af, vy * af, wf * af, af, jnp.log1p(-af)]
                         + view_ch)

    seg = p1.shape[0]
    n_win, win = _win_split(seg)
    # Per-(sample, window) key ranges for the gates + per-sample tile-parity
    # colours (hoisted).
    wlo = [[jnp.min(k[wi * win:(wi + 1) * win]) for wi in range(n_win)]
           for k in keys]
    whi = [[jnp.max(k[wi * win:(wi + 1) * win]) for wi in range(n_win)]
           for k in keys]
    colors_of = []
    for k in keys:
        ty = k // tiles_x
        tx = k - ty * tiles_x
        colors_of.append((ty % 2) * 2 + tx % 2)

    def masked_min(pred, vals):
        return jnp.min(jnp.where(pred, vals, _BIG))

    def region_copy(t, slot, sem):
        ty = t // tiles_x
        tx = t - ty * tiles_x
        return pltpu.make_async_copy(
            out_ref.at[:, pl.ds(ty * TILE_H, REGION_H),
                       pl.ds(tx * TILE_W, REGION_W)],
            regions.at[slot], sem.at[slot])

    def store_copy(t, slot):
        ty = t // tiles_x
        tx = t - ty * tiles_x
        return pltpu.make_async_copy(
            regions.at[slot],
            out_ref.at[:, pl.ds(ty * TILE_H, REGION_H),
                       pl.ds(tx * TILE_W, REGION_W)],
            sem_out.at[slot])

    def visit_compute(t, slot):
        reg = regions.at[slot]
        ty = t // tiles_x
        row0 = ty * TILE_H
        col0 = (t - ty * tiles_x) * TILE_W
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (REGION_H, win), 0).astype(jnp.float32)
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (win, REGION_W), 1).astype(jnp.float32)

        def cover(idx, centre, hw):
            lo = centre + (0.5 - hw)
            hi = centre + (0.5 + hw)
            return jnp.clip(jnp.minimum(idx + 1.0, hi)
                            - jnp.maximum(idx, lo), 0.0, 1.0)

        # Box-overlap weight builds. A/X in bf16: channel magnitudes are
        # O(1), so the ~0.4% rounding is far below the splat's own
        # quantisation; the MXU runs bf16 x bf16 -> f32 at full rate.
        for wi in range(n_win):
            sl = slice(wi * win, (wi + 1) * win)
            if SPLAT_MERGE_K:
                # One gate + ONE matmul per window with the samples MERGED
                # into the contraction axis (K = samples·win): the additive
                # accumulation sums over samples inside the dot, so fewer,
                # bigger MXU ops replace per-sample ones, and the
                # gate/build overhead stops scaling with `samples`. Samples
                # inherit their segment's key, so their window ranges are
                # near-identical — the merged (min, max) gate stays tight.
                lo_any = wlo[0][wi]
                hi_any = whi[0][wi]
                for s in range(1, samples):
                    lo_any = jnp.minimum(lo_any, wlo[s][wi])
                    hi_any = jnp.maximum(hi_any, whi[s][wi])

                @pl.when((lo_any <= t) & (hi_any >= t))
                def _(wi=wi, sl=sl):
                    livews = [(keys[s][sl] == t).astype(jnp.float32)
                              for s in range(samples)]
                    gyls = [gys[s][sl] - row0 for s in range(samples)]
                    gxls = [gxs[s][sl] - col0 for s in range(samples)]

                    def group(ch_lo, ch_hi, hw, inv_w, reg_lo, reg_hi):
                        if "a" in SPLAT_NOBUILD:  # diagnostic, see flag
                            a_mat = jnp.full(
                                ((ch_hi - ch_lo) * REGION_H,
                                 samples * win), 0.001, jnp.bfloat16)
                        else:
                            a_rows = [cover(rows, gyls[s][None, :], hw)
                                      * (livews[s] * inv_w)[None, :]
                                      for s in range(samples)]
                            # [chs·H, samples·win]: channels stack on rows,
                            # samples concatenate along K.
                            a_mat = jnp.concatenate(
                                [jnp.concatenate(
                                    [a_rows[s] * chans[s][ch][sl][None, :]
                                     for s in range(samples)], axis=1)
                                 for ch in range(ch_lo, ch_hi)],
                                axis=0).astype(jnp.bfloat16)
                        if "x" in SPLAT_NOBUILD:  # diagnostic, see flag
                            x_mat = jnp.full(
                                (samples * win, REGION_W), 0.001,
                                jnp.bfloat16)
                        else:
                            x_mat = jnp.concatenate(
                                [cover(cols, gxls[s][:, None], hw)
                                 for s in range(samples)],
                                axis=0).astype(jnp.bfloat16)
                        contrib = jnp.dot(
                            a_mat, x_mat,
                            preferred_element_type=jnp.float32)
                        reg[reg_lo:reg_hi] = reg[reg_lo:reg_hi] \
                            + contrib.reshape(ch_hi - ch_lo, REGION_H,
                                              REGION_W)

                    if flow_off:
                        group(0, N_VIEW, hw_v, inv_wv, 0, N_VIEW)
                    else:
                        group(0, N_FLOW, hw_f, inv_wf, 0, N_FLOW)
                        group(N_FLOW, N_CHAN, hw_v, inv_wv, N_FLOW, N_CHAN)
                continue
            # Per-sample variant (K = win): one gate + dot per (sample,
            # window).
            for s in range(samples):
                @pl.when((wlo[s][wi] <= t) & (whi[s][wi] >= t))
                def _(s=s, wi=wi, sl=sl):
                    livew = (keys[s][sl] == t).astype(jnp.float32)
                    gyl = gys[s][sl] - row0
                    gxl = gxs[s][sl] - col0

                    def group(ch_lo, ch_hi, hw, inv_w, reg_lo, reg_hi):
                        a_rows = cover(rows, gyl[None, :], hw) \
                            * (livew * inv_w)[None, :]
                        a_mat = jnp.concatenate(
                            [a_rows * chans[s][ch][sl][None, :]
                             for ch in range(ch_lo, ch_hi)],
                            axis=0).astype(jnp.bfloat16)
                        x_mat = cover(cols, gxl[:, None],
                                      hw).astype(jnp.bfloat16)
                        contrib = jnp.dot(
                            a_mat, x_mat,
                            preferred_element_type=jnp.float32)
                        reg[reg_lo:reg_hi] = reg[reg_lo:reg_hi] \
                            + contrib.reshape(ch_hi - ch_lo, REGION_H,
                                              REGION_W)

                    if flow_off:
                        group(0, N_VIEW, hw_v, inv_wv, 0, N_VIEW)
                    else:
                        group(0, N_FLOW, hw_f, inv_wf, 0, N_FLOW)
                        group(N_FLOW, N_CHAN, hw_v, inv_wv, N_FLOW,
                              N_CHAN)

    # Four parity passes; within each, prefetch the next region while the
    # current one computes (disjoint by construction).
    for p in range(4):
        def next_key(t, p=p):
            nxt = _BIG
            for s in range(samples):
                nxt = jnp.minimum(nxt, masked_min(
                    (keys[s] > t) & (colors_of[s] == p), keys[s]))
            return nxt

        t0 = next_key(jnp.int32(-1))

        @pl.when(t0 < _BIG)
        def _(t0=t0, p=p, next_key=next_key):
            region_copy(t0, 0, sem_in).start()

            def body(carry):
                t, t_prev, slot, it = carry
                t_next = next_key(t)

                # Prefetch the next region into the other slot — first
                # draining that slot's in-flight store (started two visits
                # ago; same-parity regions are disjoint, so the only hazard
                # is the scratch slot itself). DMA waits are
                # semaphore-count based, so the descriptor only needs the
                # matching shape.
                @pl.when(t_next < _BIG)
                def _():
                    @pl.when(it >= 1)
                    def _():
                        store_copy(t_prev, 1 - slot).wait()

                    region_copy(t_next, 1 - slot, sem_in).start()

                region_copy(t, slot, sem_in).wait()
                visit_compute(t, slot)
                store_copy(t, slot).start()
                return t_next, t, 1 - slot, it + 1

            t_end, t_last, slot_out, it_f = jax.lax.while_loop(
                lambda c: c[0] < _BIG, body,
                (t0, t0, jnp.int32(0), jnp.int32(0)))
            del t_end

            # Drain the last (up to two) in-flight stores before the next
            # parity pass, whose regions may overlap these.
            @pl.when(it_f >= 1)
            def _():
                store_copy(t_last, 1 - slot_out).wait()

            @pl.when(it_f >= 2)
            def _():
                store_copy(t_last, slot_out).wait()


MAX_BLUR = 32  # static bound for the traced-radius blur


def _box_blur_traced(img, radius):
    """Separable box blur with a *traced* integer radius (clamped to
    MAX_BLUR), via edge-padded cumsum + dynamic slices — few XLA kernels."""
    r = jnp.clip(jnp.round(radius).astype(jnp.int32), 0, MAX_BLUR)
    inv = 1.0 / (2 * r + 1).astype(jnp.float32)

    def blur_axis(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (MAX_BLUR + 1, MAX_BLUR)
        csum = jnp.cumsum(jnp.pad(x, pad, mode="edge"), axis=axis)
        n = x.shape[axis]
        starts_hi = [0] * x.ndim
        starts_lo = [0] * x.ndim
        starts_hi[axis] = MAX_BLUR + 1 + r
        starts_lo[axis] = MAX_BLUR - r
        size = list(x.shape)
        hi = jax.lax.dynamic_slice(csum, starts_hi, size)
        lo = jax.lax.dynamic_slice(csum, starts_lo, size)
        return (hi - lo) * inv

    return blur_axis(blur_axis(img, 1), 2)


def _emit_render_rgba(scal_ref, vnx, vny, posx, posy, mr, mg, mb, ma,
                      rgba_ref):
    """Render colour model (ref src/render/index.vert:57-94), packed to
    rgba8 for the sort stream. scalar_color splat kernels compute the same
    model in-kernel instead (no quantisation, no operand)."""
    speed_alpha = scal_ref[0, 4]
    sin_decay = scal_ref[0, 5]  # sin(time * flowDecay), precomputed scalar
    flow_decay = scal_ref[0, 6]
    base = [scal_ref[0, 7 + i] for i in range(4)]
    flow_c = [scal_ref[0, 11 + i] for i in range(4)]

    speed_rate = jnp.minimum(
        (vnx * vnx + vny * vny) / jnp.maximum(speed_alpha, 1e-12), 1.0)

    # 3-axis alignment at 120° (render/index.vert:33-36, 76-83).
    al0 = vnx  # axis (1, 0)
    al1 = vnx * -0.5 + vny * -0.8660254037844385
    al2 = vnx * -0.5 + vny * 0.8660254037844387
    k = 1.0 - flow_decay

    def falign(a, a_gbr):
        mixed = a + (a_gbr * k - a) * sin_decay
        return mixed * 0.5 + 0.5

    fa = (falign(al0, al1), falign(al1, al2), falign(al2, al0))

    def clip01(v):
        return jnp.clip(v, 0.0, 1.0)

    ones = jnp.ones_like(vnx)
    cr = (clip01(base[0] * base[3] * ones) + clip01(mr * ma)
          + clip01(flow_c[0] * fa[0] * flow_c[3]))
    cg = (clip01(base[1] * base[3] * ones) + clip01(mg * ma)
          + clip01(flow_c[1] * fa[1] * flow_c[3]))
    cb = (clip01(base[2] * base[3] * ones) + clip01(mb * ma)
          + clip01(flow_c[2] * fa[2] * flow_c[3]))
    ca = (clip01(base[3] * ones) + clip01(ma)
          + clip01(flow_c[3] * ones))

    # Alpha: speed rate × clamped radial bezier vignette
    # (index.vert:92-94; curve (0.2, 1, 1), range [0.2, 1]).
    d = jnp.sqrt(posx ** 2 + posy ** 2)
    amt = jnp.minimum(1.0 - d, 1.0)
    ut = 1.0 - amt
    bz = (0.2 * ut + amt) * ut + amt
    vig = jnp.clip(jnp.maximum(bz, 0.0), 0.2, 1.0)
    ca = ca * speed_rate * vig

    def q8(v, levels=255):
        t = jnp.clip(v / COLOR_MAX, 0.0, 1.0)
        return jnp.round(t * levels).astype(jnp.int32)

    rgba_ref[:] = (q8(cr) + q8(cg) * 256 + q8(cb) * 65536
                   + q8(ca, 127) * 16777216)


def _pack_core(scal_ref, p0x, p0y, p1x, p1y, vx, vy, posx, posy,
               mr, mg, mb, ma, live_in, idx,
               keym_ref, p0_ref, p1_ref, vl_ref, rgba_ref, grefs, *,
               tiles_x, pscale, h, w, gather, emit_rgba=True,
               key_recon=False):
    """Shared packing math over VALUE arrays (see _pack_kernel docstring);
    also the tail of the fused step+pack kernel.

    `key_recon=True` (derive_p0 splat): the segment sort key is computed
    from the RECONSTRUCTED p0 (quantised p1 − q15-roundtripped vel — the
    exact arithmetic the splat kernel will redo, `_kernel` derive_p0)
    instead of the exact p0. The two must agree BIT-EXACTLY: a key that
    differs from the splat's re-derivation becomes a stray tile visit, and
    ~0.1% strays measurably multiply the region-DMA count (+3 ms/step at
    1M/1080p when keys came from exact p0 — round-3 ledger)."""
    sl = jnp.maximum(scal_ref[0, 0], 1e-12)

    def qpos(x, y):
        xp = jnp.clip(x + PAD_LO_W, 1.0, PAD_LO_W + w + 1.0)
        yp = jnp.clip(y + PAD_LO_H, 1.0, PAD_LO_H + h + 1.0)
        return (jnp.round(xp * pscale).astype(jnp.int32),
                jnp.round(yp * pscale).astype(jnp.int32))

    x0q, y0q = qpos(p0x, p0y)
    x1q, y1q = qpos(p1x, p1y)
    if p0_ref is not None:
        p0_ref[:] = y0q * (HALF + 1) + x0q
    p1_ref[:] = y1q * (HALF + 1) + x1q

    def q15(v, lo, hi):
        t = jnp.clip((v - lo) / (hi - lo), 0.0, 1.0)
        return jnp.round(t * HALF).astype(jnp.int32)

    vnx = vx / sl
    vny = vy / sl
    live_bit = (live_in > 0.5).astype(jnp.int32) * (2 ** 30)
    vl_ref[:] = (live_bit + q15(vny, -1.0, 1.0) * (HALF + 1)
                 + q15(vnx, -1.0, 1.0))

    # --- render colour model: packed rgba8 operand (skipped when the
    # splat kernel computes colours in-kernel, see `_kernel` scalar_color).
    if emit_rgba:
        _emit_render_rgba(scal_ref, vnx, vny, posx, posy, mr, mg, mb, ma,
                          rgba_ref)

    # Segment key: footprint top-left tile of the segment's BOUNDING BOX
    # (min endpoint − half-width). The expand pass keys every sample of a
    # segment by this same tile whenever the whole deposit fits the key
    # tile's region (the common case — segments are a few px), so expanded
    # blocks are EXACTLY sorted runs and the splat kernel's distinct-tile
    # DMA count stays at the sorted minimum.
    hwm = jnp.maximum(jnp.clip(scal_ref[0, 2], 1.0, KMAX_WIDTH),
                      jnp.clip(scal_ref[0, 3], 1.0, KMAX_WIDTH)) * 0.5
    inv_p = 1.0 / pscale
    if key_recon:
        # Mirror `_kernel` derive_p0 bit for bit: decode the quantised p1,
        # roundtrip the velocity through its q15 word, Euler-invert.
        sl_raw = scal_ref[0, 0]
        vxr = (q15(vnx, -1.0, 1.0).astype(jnp.float32) * (2.0 / HALF)
               - 1.0) * sl_raw
        vyr = (q15(vny, -1.0, 1.0).astype(jnp.float32) * (2.0 / HALF)
               - 1.0) * sl_raw
        p1xd = x1q.astype(jnp.float32) * inv_p
        p1yd = y1q.astype(jnp.float32) * inv_p
        p0xd = jnp.clip(p1xd - vxr * (scal_ref[0, 30] * 0.5 * w),
                        1.0, PAD_LO_W + w + 1.0)
        p0yd = jnp.clip(p1yd - vyr * (scal_ref[0, 31] * 0.5 * h),
                        1.0, PAD_LO_H + h + 1.0)
        top_x = jnp.maximum(jnp.minimum(p0xd, p1xd) - hwm, 0.0)
        top_y = jnp.maximum(jnp.minimum(p0yd, p1yd) - hwm, 0.0)
    else:
        top_x = jnp.maximum(jnp.minimum(x0q, x1q).astype(jnp.float32)
                            * inv_p - hwm, 0.0)
        top_y = jnp.maximum(jnp.minimum(y0q, y1q).astype(jnp.float32)
                            * inv_p - hwm, 0.0)
    krow = jnp.floor(top_y).astype(jnp.int32) // TILE_H
    kcol = jnp.floor(top_x).astype(jnp.int32) // TILE_W
    keym = krow * tiles_x + kcol

    if gather == 1:
        # COMBINED sort key: keym in the high bits, the row id in the low
        # 20 — one operand serves as the sort key, the un-sort id, and
        # (with rare strays re-derived post-sort from p1) the flow-gather
        # key. Saves a whole sort operand; ordering within a tile becomes
        # stable by row, a free determinism bonus. The splat kernel never
        # reads this stream (it re-derives segment keys from geometry).
        keym_ref[:] = keym * (2 ** 20) + idx
    elif gather == 3:
        # Big-N resident packing: low PACK_IDX_BITS of the id share the
        # key operand; the high bits ride the positions' mantissa LSBs
        # (doctored in `fused_draw`) and are reassembled post-sort.
        keym_ref[:] = keym * (2 ** PACK_IDX_BITS) \
            + (idx & (2 ** PACK_IDX_BITS - 1))
    else:
        keym_ref[:] = keym
        if gather == 2:
            # Big-N/grid fallback: the id rides as ONE extra operand; the
            # gather key is re-derived post-sort from the sorted keym + p1
            # (`_bin_and_splat`), saving a whole 16M-row sort operand.
            grefs[0][:] = idx


def _pack_kernel(scal_ref, p0x_ref, p0y_ref, p1x_ref, p1y_ref, vx_ref,
                 vy_ref, posx_ref, posy_ref, mr_ref, mg_ref, mb_ref,
                 ma_ref, live_ref, *refs,
                 tiles_x, pscale, h, w, gather=0, emit_p0=True,
                 emit_rgba=True):
    """Pack per-segment attributes into 15-bit pairs + the segment's
    footprint-top midpoint tile key (the sort then moves 5 int32 streams of
    SEGMENTS — half the rows of a sample-level sort — and the expand pass
    runs after the sort, emitting per-sample operands already clustered).

    The render colour model (`src/render/index.vert:57-94`) runs HERE on the
    VPU — base colour + colour-map value (`mr..ma`, pre-scaled by
    colorMapAlpha) + velocity-direction→RGB alignment, alpha by speed rate ×
    radial vignette — saving the separate XLA colour chain.

    Endpoints are clamped into the padded margin before quantisation — a
    particle >1px off-grid has its segment geometry clamped (its samples
    would not deposit on-grid anyway); the live flag rides bit 30 of the
    velocity word.

    `gather`: 0 = draw stream only; 1 = also emit the NEXT-step flow-gather
    key packed with the particle index (`gkey * 2^20 + idx`, one extra sort
    operand); 2 = emit gkey and idx as two outputs (big-N/grid fallback).
    The gather key is the segment key whenever p1's bilinear corners
    (clamped to the content edge, GL CLAMP_TO_EDGE) lie inside the key
    tile's region, else p1's own tile."""
    refs = list(refs)
    if gather:
        idx_ref = refs.pop(0)
    keym_ref = refs.pop(0)
    p0_ref = refs.pop(0) if emit_p0 else None
    p1_ref = refs.pop(0)
    vl_ref = refs.pop(0)
    rgba_ref = refs.pop(0) if emit_rgba else None
    grefs = refs
    _pack_core(scal_ref, p0x_ref[:], p0y_ref[:], p1x_ref[:], p1y_ref[:],
               vx_ref[:], vy_ref[:], posx_ref[:], posy_ref[:],
               mr_ref[:], mg_ref[:], mb_ref[:], ma_ref[:], live_ref[:],
               (idx_ref[:] if gather else None),
               keym_ref, p0_ref, p1_ref, vl_ref, rgba_ref, grefs,
               tiles_x=tiles_x, pscale=pscale, h=h, w=w, gather=gather,
               emit_rgba=emit_rgba, key_recon=not emit_p0)


def _bin_and_splat(scal, outs, gather, time, *, tiles_x, pscale,
                   samples, h, w, hp, wp, n_pad, interpret, ride=None,
                   derive_p0=False, scalar_color=False, raw_accum=False,
                   stable=True, p1_from_ride=None, flow_off=False,
                   reorder=None):
    """Shared pipeline tail: segment sort (with the optional gather
    stream), segment-direct splat kernel, payload reassembly. Returns
    (flow_parts, view_parts, aux, ride_sorted, carry).

    `reorder=(prev_key, prev_hist)` (resident frames, caller-gated to
    n_pad == n, gather in (1, 3), n_pad >= 8192): restore sortedness by
    the MERGE reorder (`ops/reorder_pallas.py` — compact the ~6-9 %/frame
    churned rows, sort only those, merge-apply) instead of the flat
    `lax.sort`, falling back to the flat sort under `lax.cond` whenever
    the merge's capacity/window guards trip (frame 0's MAXKEY seed, mass
    respawns). The 5th return `carry = (sorted_key, hist)` is the next
    frame's `reorder` input (None when `reorder` is None).

    `ride`: optional extra per-segment value streams (`[n_pad]` arrays)
    that join the segment sort and come back tile-sorted — the resident
    -stream mode rides the exact f32 particle state here, so the sorted
    order becomes the NEXT frame's row order and the force un-sort
    disappears entirely (see `engine.draw_sim`).

    `p1_from_ride` (resident mode; the REAL row count `n`): the quantised
    p1 word is a pure function of the exact new position — and the exact
    positions already ride the sort as `ride[0:2]`. Dropping p1 from the
    sort operands saves a whole 16.7M-row stream through the bitonic
    network (~25 ms/operand at 16M, BENCHMARKS.md battery C) and it is
    recomputed BIT-EXACTLY post-sort: the same `(x·vsx·0.5+0.5)·w` pixel
    transform (scal slots 30/31) and the same `_pack_core.qpos`
    clip/round/pack in f32 — identical IEEE ops in a different order of
    rows. Pad rows (sorted ids >= n) re-apply the far-corner override the
    pack applied pre-sort."""
    smem_scal = pl.BlockSpec((1, 32), lambda b: (0, 0),
                             memory_space=pltpu.SMEM)
    n_seg_ops = (4 if derive_p0 else 5) - (1 if scalar_color else 0)
    rem = list(outs[:n_seg_ops])
    keym = rem.pop(0)
    p0u = None if derive_p0 else rem.pop(0)
    p1u = rem.pop(0)
    vlu = rem.pop(0)
    rgbau = None if scalar_color else rem.pop(0)
    gouts = list(outs[n_seg_ops:])
    ride = list(ride) if ride is not None else []

    # Bin SEGMENTS by tile (packed int32 operands at half the sample
    # count, + the gather stream when carried); the expand pass then emits
    # per-sample operands that are already exactly-sorted runs (samples
    # inherit their segment's key).
    sort_p1 = p1_from_ride is None
    assert sort_p1 or (derive_p0 and ride and len(ride) >= 2), \
        "p1_from_ride needs the resident ride's exact positions"
    seg_ops = [x for x in (keym, p0u, p1u if sort_p1 else None, vlu,
                           rgbau) if x is not None]
    # f32 value operands cost ~2.6x an int32 operand in lax.sort on
    # TPU (measured) — ride them as bitcast int32 and restore after.
    ride_dtypes = [r.dtype for r in ride]
    ride = [jax.lax.bitcast_convert_type(r, jnp.int32)
            if r.dtype == jnp.float32 else r for r in ride]
    # A stable XLA sort appends a hidden iota tiebreaker operand — a whole
    # extra N-row stream through the bitonic network (~0.45 ms/M). The
    # caller requests stability ONLY when pad rows exist whose corner-tile
    # key could tie a real row (pads must sort strictly last); everywhere
    # else ties are additive deposits / id-tracked rows, where any
    # deterministic order is equally valid.
    ops_all = seg_ops + gouts + ride
    chunks = _sort_chunks(n_pad, BLOCK // samples)
    new_carry = None
    idx_bits_r = PACK_IDX_BITS if gather == 3 else (20 if gather == 1
                                                    else 0)
    num_tiles_r = (hp // TILE_H) * tiles_x
    if reorder is not None and chunks == 1:
        from .reorder_pallas import merge_reorder
        prev_key, prev_hist = reorder
        ok, key_s, pays_s, _ = merge_reorder(
            ops_all[0], prev_key, list(ops_all[1:]), prev_hist,
            n_tiles=num_tiles_r, idx_bits=idx_bits_r, interpret=interpret)

        def _flat(_):
            return tuple(jax.lax.sort(ops_all, num_keys=1,
                                      is_stable=stable))

        sorted_ops = list(jax.lax.cond(
            ok, lambda _: tuple([key_s] + list(pays_s)), _flat, None))
    elif chunks > 1:
        # Batched chunk sort (see SORT_CHUNKS): per-block sortedness is all
        # the splat kernel needs, and blocks never span a chunk boundary.
        # Pad rows live in the last chunk and still sort to its end.
        sorted_ops = jax.lax.sort(
            [o.reshape(chunks, -1) for o in ops_all], num_keys=1,
            is_stable=stable)
        sorted_ops = [o.reshape(-1) for o in sorted_ops]
    else:
        sorted_ops = jax.lax.sort(ops_all, num_keys=1, is_stable=stable)
    if reorder is not None:
        # Next frame's merge inputs: the key stream the new row order is
        # sorted by + its tile histogram (order-independent, so computed
        # from the unsorted keys on the MXU).
        from .reorder_pallas import hist_outer
        t32 = -(-num_tiles_r // 32) * 32
        new_hist = hist_outer(
            jax.lax.shift_right_logical(ops_all[0], idx_bits_r),
            t32)[:num_tiles_r]
        new_carry = (sorted_ops[0], new_hist)
    n_sorted = len(seg_ops)
    rem = list(sorted_ops[:n_sorted])
    keym = rem.pop(0)
    if p0u is not None:
        p0u = rem.pop(0)
    if sort_p1:
        p1u = rem.pop(0)
    vlu = rem.pop(0)
    if rgbau is not None:
        rgbau = rem.pop(0)
    gouts = list(sorted_ops[n_sorted:n_sorted + len(gouts)])
    ride = [jax.lax.bitcast_convert_type(r, dt)
            if dt == jnp.float32 else r
            for r, dt in zip(sorted_ops[n_sorted + len(gouts):],
                             ride_dtypes)]
    hi_x = hi_y = None
    if gather == 3:
        # Reassemble the id high bits from the positions' LSB channel and
        # CLEAR it (zeroed LSBs, <= ~5e-7 px — the cleaned values are what
        # the p1 recompute, the reconstruction and the next frame's state
        # all see, so every consumer stays self-consistent).
        xi = jax.lax.bitcast_convert_type(ride[0], jnp.int32)
        yi = jax.lax.bitcast_convert_type(ride[1], jnp.int32)
        hi_x = xi & 3
        hi_y = yi & 7
        ride[0] = jax.lax.bitcast_convert_type(xi & ~3, jnp.float32)
        ride[1] = jax.lax.bitcast_convert_type(yi & ~7, jnp.float32)
    if not sort_p1:
        # Recompute the quantised p1 word from the SORTED exact positions
        # (bit-identical to `_pack_core`: same f32 pixel transform, clip,
        # round and pack — see the docstring).
        n_real = p1_from_ride
        xpix = (ride[0] * scal[0, 30] * 0.5 + 0.5) * w
        ypix = (ride[1] * scal[0, 31] * 0.5 + 0.5) * h
        if n_real < n_pad:
            # Pads are exactly the LAST rows post-sort (corner-tile key +
            # the `stable` guarantee) — detect by POSITION, not id: in a
            # sharded frame the gather ids are GLOBAL while n_real is the
            # shard-local count, so an id test would misflag real rows.
            is_pad = jnp.arange(n_pad, dtype=jnp.int32) >= n_real
            far = jnp.float32(w + 64.0)
            xpix = jnp.where(is_pad, far, xpix)
            ypix = jnp.where(is_pad, far, ypix)
        xp = jnp.clip(xpix + PAD_LO_W, 1.0, PAD_LO_W + w + 1.0)
        yp = jnp.clip(ypix + PAD_LO_H, 1.0, PAD_LO_H + h + 1.0)
        p1u = (jnp.round(yp * pscale).astype(jnp.int32) * (HALF + 1)
               + jnp.round(xp * pscale).astype(jnp.int32))

    if gather:
        # The flow-gather key is keym except for the rare non-fitting
        # strays, re-derived here from the sorted p1 (the pack's former
        # fits test, moved post-sort — one fewer sort operand either way).
        if gather == 1:
            # The combined key IS (keym << 20 | row id).
            gidx_s = keym & ((1 << 20) - 1)
            keym_plain = keym >> 20
        elif gather == 3:
            gidx_s = (keym & (2 ** PACK_IDX_BITS - 1)) \
                | (hi_x << PACK_IDX_BITS) | (hi_y << (PACK_IDX_BITS + 2))
            keym_plain = keym >> PACK_IDX_BITS
        else:
            gidx_s = gouts[0]
            keym_plain = keym
        inv_p = 1.0 / pscale
        xcl = jnp.clip((p1u & HALF).astype(jnp.float32) * inv_p,
                       PAD_LO_W + 0.5, PAD_LO_W + w - 0.5)
        ycl = jnp.clip((p1u >> 15).astype(jnp.float32) * inv_p,
                       PAD_LO_H + 0.5, PAD_LO_H + h - 0.5)
        r0g = jnp.floor(ycl - 0.5).astype(jnp.int32)
        c0g = jnp.floor(xcl - 0.5).astype(jnp.int32)
        krow = keym_plain // tiles_x
        kcol = keym_plain - krow * tiles_x
        # Both bilinear corners must lie INSIDE the key tile's region —
        # including the low edge: an edge-clamped p1 can land one row/col
        # before the region start when PAD_LO+extent is a tile multiple
        # (ADVICE r2), silently dropping that corner's weight.
        fits = ((r0g >= krow * TILE_H) & (c0g >= kcol * TILE_W)
                & (r0g + 1 < krow * TILE_H + REGION_H)
                & (c0g + 1 < kcol * TILE_W + REGION_W))
        own = (r0g // TILE_H) * tiles_x + (c0g // TILE_W)
        gkey_s = jnp.where(fits, keym_plain, own)
        aux = (gidx_s, gkey_s, p1u)
    else:
        aux = None

    # Pass 2: segment-direct splat — the kernel expands each segment to its
    # deposit samples in-kernel (no per-sample HBM stream).
    assert not flow_off or raw_accum, \
        "flow channel pruning requires the Pallas resolve (raw_accum)"
    nch = N_VIEW if flow_off else N_CHAN
    accum0 = jnp.zeros((nch, hp, wp), jnp.float32)
    splat_seg = BLOCK // samples
    splat_spec = pl.BlockSpec((splat_seg,), lambda b: (b,),
                              memory_space=pltpu.VMEM)
    splat_in = [scal, keym] + ([] if derive_p0 else [p0u]) \
        + [p1u, vlu] + ([] if scalar_color else [rgbau]) + [accum0]
    out = pl.pallas_call(
        functools.partial(_kernel, tiles_x=tiles_x, pscale=pscale,
                          samples=samples, h=h, w=w, derive_p0=derive_p0,
                          scalar_color=scalar_color, flow_off=flow_off),
        grid=(n_pad // splat_seg,),
        in_specs=([smem_scal]
                  + [splat_spec] * n_seg_ops
                  + [pl.BlockSpec(memory_space=pl.ANY)]),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nch, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, nch, REGION_H, REGION_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={n_seg_ops + 1: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*splat_in)

    if raw_accum:
        # The Pallas resolve kernel consumes the PADDED accumulator
        # directly (slice/stamp/composite all fuse there).
        if ride:
            ride = ride + [vlu]
        return out, None, aux, ride, new_carry
    out = out[:, PAD_LO_H:PAD_LO_H + h, PAD_LO_W:PAD_LO_W + w]
    # Reassemble the flow payload: stamp num = time · wsum (constant stamp).
    stamp_num = time * out[3]
    fnum = jnp.concatenate([out[0:2], stamp_num[None], out[2:3]])
    flow_parts = (fnum, out[3], out[4])
    view_parts = (out[5:9], out[9], out[10])
    if ride:
        # The sorted velocity/live stream tags along (last element): the
        # resident engine reconstructs the new velocity from its q15 fields
        # instead of riding two more exact f32 operands through the sort.
        ride = ride + [vlu]
    return flow_parts, view_parts, aux, ride, new_carry


def pos_scale_for(grid_hw):
    """The fixed-point sub-pixel scale the fused draw uses for `grid_hw`."""
    hp, wp = _pad_dims(*grid_hw)
    return _pos_scale(hp, wp)


def seg_tile_count(grid_hw):
    """Tile count of the fused draw's segment keys for `grid_hw` — the
    merge-reorder carry histogram's length (`engine.seed_sort_carry`)."""
    hp, wp = _pad_dims(*grid_hw)
    return (hp // TILE_H) * (wp // TILE_W)


@functools.partial(jax.jit, static_argnames=("grid_hw", "samples",
                                             "interpret",
                                             "derive_p0", "raw_accum",
                                             "idx_bound", "flow_off"))
def fused_draw_accumulate(grid_hw, p0_pix, p1_pix, vel, pos_ndc, mapped,
                          live, speed_limit, time, *, idx=None, ride=None,
                          idx_bound=None,
                          samples=2,
                          interpret=None, flow_width=1.0,
                          line_width=1.0, speed_alpha=1.0, sin_decay=0.0,
                          flow_decay=0.0, base_color=None, flow_color=None,
                          derive_p0=False, view_size=None,
                          mapped_scalar=None, raw_accum=False,
                          reorder=None,
                          flow_off=False):
    """Accumulate both passes' splats.

    `p0_pix`/`p1_pix`: `f32[N, 2]` segment endpoints (window px of the shared
    flow/view grid); `vel`: `f32[2, N]`; `pos_ndc`: `f32[2, N]` current NDC
    positions (render vignette); `mapped`: `f32[4, N]` colour-map lookup
    pre-scaled by colorMapAlpha; `live`: `f32[N]` alive mask;
    `flow_width`/`line_width`: per-pass GL line widths, applied in-kernel up
    to KMAX_WIDTH (traced); `speed_alpha`/`sin_decay`/`flow_decay`/
    `base_color[4]`/`flow_color[4]`: render colour-model params (colours are
    derived in the pack kernel). Returns (flow_parts, view_parts) each
    `(num [4,H,W], wsum [H,W], logt [H,W])`. `interpret=None` auto-selects
    interpreter mode off-TPU. Segments are sorted by their bbox's
    footprint-top tile (5 int32 operands at SEGMENT count — half a
    sample-level sort) and expanded after.

    With `idx` (`i32[N]` particle row ids) the segment sort ALSO carries a
    flow-gather stream for the next step's force, and a third element
    `aux = (idx_s, gkey_s, p1_s)` is returned: particle ids, gather tile
    keys and packed p1 coords in segment-sorted order, ready for
    `gather_pallas.bilinear_gather_keyed` with no further sorting (pad rows
    carry ids >= N and sort to the tail of the un-sort).

    `ride`: optional sequence of `[N]` value streams joining the segment
    sort (resident-stream mode); returned tile-sorted as a fourth element.
    Pad rows sort strictly last (their keys clamp to the bottom-right
    corner tile and their ids exceed every real id; `lax.sort` is stable),
    so `ride_sorted[i][:N]` are exactly the real rows in sorted order.

    `derive_p0=True` (requires `view_size=(vsx, vsy)`): the caller
    guarantees `p1 = p0 + vel·viewScale` in pixels (a logic step
    immediately preceded this draw) — the p0 stream is dropped from the
    sort and reconstructed in the splat kernel, saving an operand.

    `mapped_scalar` (`f32[4]`, requires derive_p0): the colour map is a
    single texel — the whole render colour model runs in the SPLAT kernel
    (scalar map + scal params), dropping the rgba operand from the sort
    too; `mapped`/`pos_ndc` are ignored.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = grid_hw
    hp, wp = _pad_dims(h, w)
    tiles_x = wp // TILE_W
    pscale = _pos_scale(hp, wp)

    if base_color is None:
        base_color = jnp.zeros(4, jnp.float32)
    if flow_color is None:
        flow_color = jnp.zeros(4, jnp.float32)

    # Pad segments to a block multiple (no-op for root_num >= 64). Pack and
    # expand run on PACK_SEG-segment grid steps when the input is big enough
    # (grid-step overhead), which the splat's BLOCK divides evenly.
    n = p0_pix.shape[0]
    seg_block = BLOCK // samples
    if n >= PACK_SEG and PACK_SEG % seg_block == 0:
        seg_block = PACK_SEG
    n_pad = (n + seg_block - 1) // seg_block * seg_block
    if n_pad != n:
        pad = n_pad - n
        p0_pix = jnp.pad(p0_pix, ((0, pad), (0, 0)),
                         constant_values=w + 64.0)
        p1_pix = jnp.pad(p1_pix, ((0, pad), (0, 0)),
                         constant_values=w + 64.0)
        vel = jnp.pad(vel, ((0, 0), (0, pad)))
        if pos_ndc is not None:
            pos_ndc = jnp.pad(pos_ndc, ((0, 0), (0, pad)))
        if mapped is not None:
            mapped = jnp.pad(mapped, ((0, 0), (0, pad)))
        live = jnp.pad(live, (0, pad))
        if idx is not None:
            # Distinct tail ids so pad rows un-sort to the end and slice off.
            idx = jnp.concatenate([idx, jnp.arange(n, n_pad, dtype=jnp.int32)])
        if ride is not None:
            ride = [jnp.pad(r, (0, pad)) for r in ride]

    # Gather-stream mode: packed key+id in one operand when both fit 31
    # bits, else two operands. `idx_bound` (an exclusive upper bound on the
    # id VALUES — sharded resident frames carry GLOBAL ids on a local-sized
    # stream) must also fit: the combined key packs the id in 20 bits, and
    # the pads-sort-last guarantee needs pad ids (>= n_pad) to exceed every
    # real id.
    num_tiles = (hp // TILE_H) * tiles_x
    if idx is None:
        gather = 0
    elif n_pad <= G1_MAX_ROWS and num_tiles <= G1_MAX_TILES \
            and (idx_bound is None or idx_bound <= n):
        # Pad ids start at the LOCAL row count `n` — they only sort last if
        # every real id is below that, which `idx_bound <= n` guarantees
        # (single-chip streams are id-dense; sharded streams carry global
        # ids and fall through to gather=2, where stability orders pads).
        gather = 1
    elif derive_p0 and ride is not None and n_pad == n \
            and num_tiles <= PACK_MAX_TILES \
            and (idx_bound if idx_bound is not None else n) <= PACK_MAX_IDS:
        # Big-N resident: id low bits share the key operand, high bits
        # hide in the riding positions' LSBs — no separate id operand
        # (see the PACK_IDX_BITS comment). Requires no pad rows (the LSB
        # channel can't mark pads; resident row counts are pow2 BLOCK
        # multiples, so n_pad == n in practice).
        gather = 3
    else:
        gather = 2
    if gather == 3:
        hi = jax.lax.shift_right_logical(idx, PACK_IDX_BITS)
        xi = jax.lax.bitcast_convert_type(ride[0], jnp.int32)
        yi = jax.lax.bitcast_convert_type(ride[1], jnp.int32)
        ride = list(ride)
        ride[0] = jax.lax.bitcast_convert_type((xi & ~3) | (hi & 3),
                                               jnp.float32)
        ride[1] = jax.lax.bitcast_convert_type((yi & ~7) | (hi >> 2),
                                               jnp.float32)

    scalar_color = mapped_scalar is not None
    if scalar_color:
        assert derive_p0, "scalar_color requires the resident frame path"
    tail = jnp.zeros(17, jnp.float32)
    if derive_p0:
        mid = (jnp.asarray(mapped_scalar, jnp.float32) if scalar_color
               else jnp.zeros(4, jnp.float32))
        tail = jnp.concatenate([jnp.zeros(1, jnp.float32), mid,
                                jnp.zeros(10, jnp.float32),
                                jnp.asarray(view_size, jnp.float32)])
    scal = jnp.concatenate([
        jnp.stack([jnp.float32(speed_limit), jnp.float32(time),
                   jnp.float32(flow_width), jnp.float32(line_width),
                   jnp.float32(speed_alpha), jnp.float32(sin_decay),
                   jnp.float32(flow_decay)]),
        jnp.asarray(base_color, jnp.float32),
        jnp.asarray(flow_color, jnp.float32),
        tail])[None]  # [1, 32]
    i32 = jnp.int32

    # Pass 1: pack segment attributes + in-kernel render colours + the
    # footprint-top midpoint tile key.
    segspec = pl.BlockSpec((seg_block,), lambda b: (b,),
                           memory_space=pltpu.VMEM)
    smem_scal = pl.BlockSpec((1, 32), lambda b: (0, 0),
                             memory_space=pltpu.SMEM)
    n_out = (4 if derive_p0 else 5) - (1 if scalar_color else 0) \
        + (1 if gather == 2 else 0)
    if scalar_color:
        # The pack kernel never reads the map values or the vignette
        # pos (colours run in the splat kernel) — feed placeholders.
        pack_in = [scal, p0_pix[:, 0], p0_pix[:, 1], p1_pix[:, 0],
                   p1_pix[:, 1], vel[0], vel[1], live, live,
                   live, live, live, live, live]
    else:
        pack_in = [scal, p0_pix[:, 0], p0_pix[:, 1], p1_pix[:, 0],
                   p1_pix[:, 1], vel[0], vel[1], pos_ndc[0],
                   pos_ndc[1], mapped[0], mapped[1], mapped[2],
                   mapped[3], live]
    if gather:
        pack_in.append(idx)
    outs = pl.pallas_call(
        functools.partial(_pack_kernel, tiles_x=tiles_x, pscale=pscale,
                          h=h, w=w, gather=gather,
                          emit_p0=not derive_p0,
                          emit_rgba=not scalar_color),
        grid=(n_pad // seg_block,),
        in_specs=([smem_scal] + [segspec] * (13 + (1 if gather else 0))),
        out_specs=[segspec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((n_pad,), i32)] * n_out,
        interpret=interpret,
    )(*pack_in)
    # Combined keys (gather==1) are unique by construction; otherwise
    # stability is only needed when pad rows exist (they must sort after a
    # real row sharing their clamped corner tile).
    stable = gather != 1 and n_pad != n
    # Merge-reorder gate: pads may not exist (the merge's U-before-C tile
    # order would break pads-sort-last), the stream must tile into the
    # compaction blocks, and the key must carry a tile prefix.
    if reorder is not None and not (n_pad == n and n_pad % 4096 == 0
                                    and n_pad >= 8192
                                    and gather in (1, 3)):
        reorder = None
    flow_parts, view_parts, aux, ride_s, carry = _bin_and_splat(
        scal, outs, gather, time, tiles_x=tiles_x,
        pscale=pscale, samples=samples, h=h, w=w, hp=hp, wp=wp,
        n_pad=n_pad, interpret=interpret, ride=ride, derive_p0=derive_p0,
        scalar_color=scalar_color, raw_accum=raw_accum, stable=stable,
        flow_off=flow_off, reorder=reorder,
        # Resident rides lead with the exact positions — drop the p1
        # operand from the sort and recompute it post-sort (one fewer
        # 16M-row stream through the bitonic network).
        p1_from_ride=(n if derive_p0 and ride else None))
    if ride is not None:
        return flow_parts, view_parts, aux, ride_s, carry
    if idx is None:
        return flow_parts, view_parts
    return flow_parts, view_parts, aux


def _widen_excess(parts, width):
    """Widths <= KMAX_WIDTH are fully applied in-kernel (box footprints) —
    this is then the identity. Wider strokes get the excess as a
    variance-matched box blur of the accumulation (runtime-branched, so the
    common case pays nothing)."""
    num, wsum, logt = parts
    width = jnp.maximum(width, 1.0)
    w_in = jnp.minimum(width, KMAX_WIDTH)  # applied in-kernel
    rem = jnp.sqrt(jnp.maximum(width * width - w_in * w_in, 0.0))
    radius = jnp.maximum((rem - 1.0) * 0.5, 0.0)
    scale = width / w_in  # in-kernel mass was ∝ w_in; total must be ∝ width
    stack = jnp.concatenate([num, wsum[None], logt[None]])
    stack = jax.lax.cond(
        radius >= 0.5,
        lambda s: _box_blur_traced(s, radius),
        lambda s: s, stack) * scale
    return stack[:-2], stack[-2], stack[-1]


def _resolve_kernel(scal_ref, accum_ref, flow_ref, view_ref, *rest, w, rb,
                    want_eff, n_steps, flow_off=False):
    """Fused resolve of the splat accumulator: one Pallas pass replaces the
    whole XLA tail — pad slice, stamp reassembly, narrow-width scale,
    `composite_over` for both passes, `autoClearView` + fade fill, and
    (optionally) the next step's effective decayed flow for the carried
    -force gather. At ~0.4 ms per XLA kernel launch on this device the tail
    was ~8-10 launches of full-grid traffic; here it is one kernel that
    reads each pixel once.

    accum: f32[N_CHAN, hp, wp] in HBM (the splat kernel's padded output) —
    content rows are DMA'd per block, double-buffered across grid steps.
    flow/view: f32[4, rb, w] blocks of the previous grids.
    Outputs: new flow, new view (+ eff f32[2, rb, w] when `want_eff`).

    scal f32[1, 16] SMEM: [0] time, [1] read_time, [2] flowDecay,
    [3] autoClearView, [4..7] fadeColor·autoFade, [8] flow widen scale,
    [9] view widen scale, [10] eps."""
    if flow_off:
        # Flow-channel-pruned accumulator (`_bin_and_splat(flow_off=...)`):
        # view channels only, no flow input/output (the engine carries the
        # old flow grid through untouched). With three inputs the VIEW
        # input arrives in the `flow_ref` slot and the single output in
        # the `view_ref` slot.
        assert not want_eff
        nv_ref = view_ref
        view_ref = flow_ref
        nf_ref = eff_ref = None
        scratch, sems = rest
        nch = N_VIEW
    elif want_eff:
        nf_ref, nv_ref, eff_ref = rest[:3]
        scratch, sems = rest[3:]
        nch = N_CHAN
    else:
        nf_ref, nv_ref = rest[:2]
        eff_ref = None
        scratch, sems = rest[2:]
        nch = N_CHAN

    b = pl.program_id(0)
    slot = jax.lax.rem(b, 2)

    def copies(bi, sl):
        return [pltpu.make_async_copy(
            accum_ref.at[ch, pl.ds(PAD_LO_H + bi * rb, rb),
                         pl.ds(PAD_LO_W, w)],
            scratch.at[sl, ch], sems.at[sl, ch])
            for ch in range(nch)]

    @pl.when(b == 0)
    def _():
        for dma in copies(0, 0):
            dma.start()

    @pl.when(b + 1 < n_steps)
    def _():
        for dma in copies(b + 1, 1 - slot):
            dma.start()

    for dma in copies(b, slot):
        dma.wait()

    a = [scratch[slot, ch] for ch in range(nch)]
    time = scal_ref[0, 0]
    read_time = scal_ref[0, 1]
    fdecay = scal_ref[0, 2]
    ac = scal_ref[0, 3]
    fade = [scal_ref[0, 4 + i] for i in range(4)]
    sf = scal_ref[0, 8]
    sv = scal_ref[0, 9]
    eps = scal_ref[0, 10]

    if not flow_off:
        # Flow resolve (splat.composite_over semantics; stamp num =
        # time·wsum).
        wsum_f = a[3] * sf
        t_f = jnp.exp(a[4] * sf)
        gain_f = (1.0 - t_f) / jnp.maximum(wsum_f, eps)
        fnum = (a[0] * sf, a[1] * sf, time * wsum_f, a[2] * sf)
        nf = [flow_ref[k] * t_f + fnum[k] * gain_f for k in range(4)]
        for k in range(4):
            nf_ref[k] = nf[k]

    # View resolve over the cleared + faded previous view.
    v_lo = 0 if flow_off else N_FLOW
    fa = fade[3]
    wsum_v = a[v_lo + 4] * sv
    t_v = jnp.exp(a[v_lo + 5] * sv)
    gain_v = (1.0 - t_v) / jnp.maximum(wsum_v, eps)
    for k in range(4):
        v0 = view_ref[k] * (1.0 - ac)
        v0 = fade[k] * fa + v0 * (1.0 - fa)
        nv_ref[k] = v0 * t_v + (a[v_lo + k] * sv) * gain_v

    if want_eff:
        # Effective decayed flow at the NEXT step's read time — feeds the
        # carried-force keyed gather with no further full-grid pass.
        decay = jnp.maximum(0.0, 1.0 - (read_time - nf[2]) * fdecay)
        eff_ref[0] = nf[0] * decay
        eff_ref[1] = nf[1] * decay


def _resolve_rb(h, w, want_eff, flow_off=False):
    """Row-block height: largest divisor of `h` fitting the VMEM budget
    (scratch 2·11 rows + double-buffered in/out blocks)."""
    if flow_off:
        rows_equiv = 2 * N_VIEW + 8 + 8
    else:
        rows_equiv = 2 * N_CHAN + 16 + 16 + (4 if want_eff else 0)
    budget = 12 * 2 ** 20
    for rb in (40, 32, 24, 16, 8):
        if h % rb == 0 and rows_equiv * rb * w * 4 <= budget:
            return rb
    return None


def resolve_eligible(h, w):
    """Whether the Pallas resolve path supports this grid (alignment of the
    accumulator's content DMA + row blocking)."""
    return w % 128 == 0 and _resolve_rb(h, w, True) is not None


@functools.partial(jax.jit, static_argnames=("interpret", "want_eff",
                                             "flow_off"))
def resolve_fused(accum, flow, view, fade_rgba, auto_clear, time,
                  read_time, flow_decay, flow_width, line_width, *,
                  want_eff=False, interpret=None, flow_off=False):
    """Resolve both passes' padded accumulator over the previous flow/view
    grids in ONE Pallas pass (see `_resolve_kernel`). Only valid for
    in-kernel line widths (<= KMAX_WIDTH — the engine routes wider strokes
    through the XLA `_widen_excess` tail). Returns `(new_flow, new_view)`
    or `(new_flow, new_view, eff)` with `want_eff` (eff: the decayed flow
    at `read_time`, content layout, for `bilinear_gather_keyed`)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _, h, w = view.shape
    rb = _resolve_rb(h, w, want_eff, flow_off)
    n_steps = h // rb

    def scale_of(width):
        width = jnp.maximum(width, 1.0)
        return width / jnp.minimum(width, KMAX_WIDTH)

    scal = jnp.concatenate([
        jnp.stack([jnp.float32(time), jnp.float32(read_time),
                   jnp.float32(flow_decay), jnp.float32(auto_clear)]),
        jnp.asarray(fade_rgba, jnp.float32),
        jnp.stack([scale_of(flow_width), scale_of(line_width),
                   jnp.float32(1e-6)]),
        jnp.zeros(5, jnp.float32)])[None]  # [1, 16]

    grid_spec = pl.BlockSpec((4, rb, w), lambda b: (0, b, 0),
                             memory_space=pltpu.VMEM)
    smem_scal = pl.BlockSpec((1, 16), lambda b: (0, 0),
                             memory_space=pltpu.SMEM)
    nch = N_VIEW if flow_off else N_CHAN
    if flow_off:
        # View-only resolve: the flow input/output pair drops out entirely
        # (the engine carries the old flow grid through).
        assert not want_eff
        n_out = 1
        out_specs = [grid_spec]
        out_shape = [jax.ShapeDtypeStruct((4, h, w), jnp.float32)]
        ins = (scal, accum, view)
        in_specs = [smem_scal, pl.BlockSpec(memory_space=pl.ANY),
                    grid_spec]
        aliases = {2: 0}
    else:
        n_out = 3 if want_eff else 2
        out_specs = [grid_spec, grid_spec]
        out_shape = [jax.ShapeDtypeStruct((4, h, w), jnp.float32)] * 2
        if want_eff:
            out_specs.append(pl.BlockSpec((2, rb, w), lambda b: (0, b, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((2, h, w), jnp.float32))
        ins = (scal, accum, flow, view)
        in_specs = [smem_scal, pl.BlockSpec(memory_space=pl.ANY),
                    grid_spec, grid_spec]
        aliases = {2: 0, 3: 1}
    outs = pl.pallas_call(
        functools.partial(_resolve_kernel, w=w, rb=rb, want_eff=want_eff,
                          n_steps=n_steps, flow_off=flow_off),
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, nch, rb, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2, nch)),
        ],
        # The previous flow/view buffers are donated to the outputs: block
        # b is read at grid step b strictly before its replacement is
        # written back, so the in-place update is safe and XLA drops two
        # full-grid carry copies per frame.
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*ins)
    return tuple(outs[:n_out])


def reconstruct_rows(sl, npx, npy, vl, part_ref, prev_ref, targ_ref=None,
                     tx=None, ty=None):
    """Shared resident-stream reassembly body (un-quantise the q15
    velocity word, alive test, prev = pos − vel, targets re-stack) —
    called from both `_reconstruct_kernel` and `gather_pallas._kernel`'s
    fused recon tail so the live-bit / q15 semantics can't silently
    diverge between the two (ADVICE r3). `sl`: speedLimit scalar; value
    arrays in, output refs written in place."""
    vel_u = vl & (2 ** 30 - 1)
    nvx = ((vel_u & HALF).astype(jnp.float32) * (2.0 / HALF) - 1.0) * sl
    nvy = ((vel_u >> 15).astype(jnp.float32) * (2.0 / HALF) - 1.0) * sl
    alive = (npx != INERT) | (npy != INERT)
    part_ref[0] = npx
    part_ref[1] = npy
    part_ref[2] = nvx
    part_ref[3] = nvy
    prev_ref[0] = jnp.where(alive, npx - nvx, npx)
    prev_ref[1] = jnp.where(alive, npy - nvy, npy)
    prev_ref[2] = nvx
    prev_ref[3] = nvy
    if targ_ref is not None:
        zeros = jnp.zeros_like(npx)
        targ_ref[0] = tx
        targ_ref[1] = ty
        targ_ref[2] = zeros
        targ_ref[3] = zeros


def _reconstruct_kernel(sl_ref, npx_ref, npy_ref, vl_ref, *rest, targets):
    """Resident-stream state reassembly in ONE pass (see
    `reconstruct_resident`)."""
    if targets:
        tx_ref, ty_ref, part_ref, prev_ref, targ_ref = rest
        tx, ty = tx_ref[:], ty_ref[:]
    else:
        part_ref, prev_ref = rest
        targ_ref = tx = ty = None
    reconstruct_rows(sl_ref[0, 0], npx_ref[:], npy_ref[:], vl_ref[:],
                     part_ref, prev_ref, targ_ref, tx, ty)


@functools.partial(jax.jit, static_argnames=("interpret",))
def reconstruct_resident(npx, npy, vl, speed_limit, tx=None, ty=None,
                         interpret=None):
    """Reassemble the resident-stream frame's particle state from the
    sorted ride streams in one Pallas pass: un-quantise the q15 velocity
    word, rebuild `particles`/`previous` `f32[4, M]` (prev = pos − vel for
    live rows, the state-at-frame pairing `src/state/state-at-frame.glsl`),
    and optionally re-stack the targets — replacing the ~6-launch XLA
    elementwise tail and its two extra full-state HBM round trips.
    Returns `(particles, previous[, targets])`; the caller slices `[:n]`."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m = npx.shape[0]
    # Draw streams are padded to the splat's segment-block multiple
    # (BLOCK // samples), which for odd sample counts need not have any
    # power-of-2 divisor — pad to a lane multiple first (the caller slices
    # `[:n]`, and n <= m, so pad rows are simply dropped), then pick the
    # largest lane-aligned block.
    m128 = -(-m // 128) * 128
    if m128 != m:
        pad = m128 - m
        npx, npy, vl = (jnp.pad(v, (0, pad)) for v in (npx, npy, vl))
        if tx is not None:
            tx, ty = jnp.pad(tx, (0, pad)), jnp.pad(ty, (0, pad))
        m = m128
    blk = next(b for b in (4096, 2048, 1024, 512, 256, 128) if m % b == 0)
    targets = tx is not None
    blocked = pl.BlockSpec((blk,), lambda b: (b,),
                           memory_space=pltpu.VMEM)
    out4 = pl.BlockSpec((4, blk), lambda b: (0, b),
                        memory_space=pltpu.VMEM)
    n_out = 3 if targets else 2
    args = [jnp.reshape(jnp.asarray(speed_limit, jnp.float32), (1, 1)),
            npx, npy, vl] + ([tx, ty] if targets else [])
    return pl.pallas_call(
        functools.partial(_reconstruct_kernel, targets=targets),
        grid=(m // blk,),
        in_specs=[pl.BlockSpec((1, 1), lambda b: (0, 0),
                               memory_space=pltpu.SMEM)]
        + [blocked] * (5 if targets else 3),
        out_specs=[out4] * n_out,
        out_shape=[jax.ShapeDtypeStruct((4, m), jnp.float32)] * n_out,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*args)


def fused_draw(flow, view, p0_pix, p1_pix, vel, pos_ndc, mapped, live,
               params, time, *, grid_hw, samples=2, interpret=None,
               idx=None, ride=None,
               idx_bound=None, psum=None,
               derive_p0=False, view_size=None, mapped_scalar=None,
               resolve="xla", read_time=None, want_eff=False,
               flow_off=False, reorder=None):
    """Full fused draw: accumulate with in-kernel per-pass line widths
    (`flowWidth` for the flow deposit, `lineWidth` for the view deposit —
    ref `src/index.js:302,336` set `gl.lineWidth` per pass) and the in-kernel
    render colour model, resolve both blends. `mapped` is the colour-map
    lookup (pre-scaled by colorMapAlpha). Returns (new_flow, new_view), plus
    the flow-gather aux stream when `idx` is given (see
    `fused_draw_accumulate`).

    `psum`: optional reduction of the accumulated parts across a shard_map
    axis before the resolve — the deposit channels (numerators, weight sums,
    log-transmittances) are all order-independent sums, so data-parallel
    shards compose exactly. Composes with `resolve="pallas"`: the RAW
    padded accumulator is psum'd (one 11-channel collective) and every
    shard runs the same fused resolve on the summed accumulator — the
    sharded frame runs the identical fast resolve the single-chip frame
    does (VERDICT r3 item 2).

    `resolve="pallas"` (narrow widths, aligned grid — `resolve_eligible`):
    the whole XLA resolve tail runs as one Pallas pass
    (`_resolve_kernel`), INCLUDING `autoClearView` + fade fill of the
    previous view — the caller passes `view` un-faded. With `want_eff` a
    third output is the decayed flow at `read_time` for the carried-force
    gather; return becomes `(new_flow, new_view[, aux][, eff])`."""
    pallas_resolve = resolve == "pallas"
    # Flow-channel pruning requires the Pallas resolve path (the XLA tail
    # reassembles flow_parts); `flowWeight == 0` + the fallback resolve
    # just keeps the full accumulator.
    flow_off = flow_off and pallas_resolve and not want_eff
    has_ride = ride is not None
    out = fused_draw_accumulate(
        grid_hw, p0_pix, p1_pix, vel, pos_ndc, mapped, live,
        params["speedLimit"], time, idx=idx, ride=ride,
        idx_bound=idx_bound, samples=samples,
        interpret=interpret, derive_p0=derive_p0,
        view_size=view_size, mapped_scalar=mapped_scalar,
        flow_width=params["flowWidth"], line_width=params["lineWidth"],
        speed_alpha=params["speedAlpha"],
        sin_decay=jnp.sin(time * params["flowDecay"]),
        flow_decay=params["flowDecay"],
        base_color=params["baseColor"], flow_color=params["flowColor"],
        raw_accum=pallas_resolve, flow_off=flow_off, reorder=reorder)
    if pallas_resolve:
        accum = out[0]
        if psum is not None:
            accum = psum(accum)
        res = resolve_fused(
            accum, None if flow_off else flow, view,
            params["fadeColor"] * params["autoFade"],
            params["autoClearView"], time,
            time if read_time is None else read_time,
            params["flowDecay"], params["flowWidth"], params["lineWidth"],
            want_eff=want_eff, interpret=interpret, flow_off=flow_off)
        if flow_off:
            # The untouched flow grid passes through: `flowWeight == 0`
            # means nothing reads it (and decay-on-read makes any missed
            # accumulation vanish once flow is re-enabled — documented
            # deviation, the GL reference always renders its flow FBO).
            new_flow, new_view = flow, res[0]
        else:
            new_flow, new_view = res[:2]
        ret = [new_flow, new_view]
        if idx is not None:
            ret.append(out[2])
        if has_ride:
            ret.append(out[3])
        if want_eff:
            ret.append(res[2])
        if reorder is not None:
            # (sorted_key, hist) for the next frame's merge — None when
            # the accumulate-level gate rejected the merge (pads, small
            # N, no tile-prefixed key); the engine then re-seeds.
            ret.append(out[4] if has_ride else None)
        return tuple(ret)
    flow_parts, view_parts = out[:2]
    if psum is not None:
        flow_parts = psum(flow_parts)
        view_parts = psum(view_parts)

    new_flow = composite_over(
        flow, *_widen_excess(flow_parts, params["flowWidth"]))
    new_view = composite_over(
        view, *_widen_excess(view_parts, params["lineWidth"]))
    if has_ride:
        if reorder is not None:
            return new_flow, new_view, out[2], out[3], out[4]
        return new_flow, new_view, out[2], out[3]
    if idx is None:
        return new_flow, new_view
    return new_flow, new_view, out[2]
