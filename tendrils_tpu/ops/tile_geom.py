"""Shared tile geometry for the clustered Pallas kernels (fused draw +
gather): 16x256-px content tiles, 32x384 RMW/DMA regions. The 16-row
vertical margin lets the draw's expand pass key every sample of a segment
by the SEGMENT's bbox-top tile for segments up to ~14 px tall (typical
speedLimit geometry) — expanded blocks then bin as exactly-sorted runs at
the sorted-minimum region-DMA count. The generic `splat_pallas` backend
keeps its own smaller 8x128 geometry (better for arbitrary payload channel
counts at small grids).
"""

import os

HALF = 32767  # 15-bit field max of the packed fixed-point streams
TILE_H = 16
TILE_W = 256
# Region (RMW/DMA window) dims. Env-overridable for geometry experiments
# on real hardware (e.g. TT_REGION_W=512 at 4K trades +33% bytes per
# region visit for fewer stray visits on long segments) — read once at
# import so every kernel/padding helper stays consistent. Semantics are
# unchanged under an override (deposit masses agree to ~0.1%); per-texel
# placement quantisation shifts with the padded width, so the strict
# cross-path CI tolerances are tuned for (and run at) the defaults.
REGION_H = int(os.environ.get("TT_REGION_H", 32))
REGION_W = int(os.environ.get("TT_REGION_W", 384))
assert REGION_H % 8 == 0 and REGION_H >= 2 * TILE_H, REGION_H
assert REGION_W % 128 == 0 and REGION_W >= TILE_W + 128, REGION_W
PAD_LO_H, PAD_LO_W = TILE_H, TILE_W
PAD_HI_H, PAD_HI_W = REGION_H, REGION_W


def pad_dims(h, w):
    hp = (PAD_LO_H + h + PAD_HI_H + TILE_H - 1) // TILE_H * TILE_H
    wp = (PAD_LO_W + w + PAD_HI_W + TILE_W - 1) // TILE_W * TILE_W
    return hp, wp
