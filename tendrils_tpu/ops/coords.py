"""Coordinate maps between particle space, UV space and grid pixels.

Mirrors the reference's GLSL map modules:
  - `posToUV` / `uvToPos`: NDC [-1,1] <-> UV [0,1]
    (`src/map/{pos-to-uv,uv-to-pos}.glsl`, ranges `src/map/ranges/*.glsl`).
  - `coverAspect` / `containAspect` (`src/utils/aspect.js:1-12`): the engine's
    `viewSize` is `coverAspect(viewRes)` (`src/index.js:398`), i.e.
    `max(w, h) / (w, h)`; particle NDC positions are multiplied by it before
    rasterisation (`src/render/index.vert:96`, `src/flow/vert/main.vert:14`)
    and before flow sampling (`src/logic.frag:75`).

Grid convention: arrays are indexed `[row=y, col=x]` with row 0 at clip
y = -1 (matching `gl_FragCoord`'s bottom-left origin); exporters flip at the
edge of the system.
"""

import jax.numpy as jnp
import numpy as np


def pos_to_uv(pos):
    """NDC [-1,1] -> UV [0,1]; `f32[..., 2]`. Ref `src/map/pos-to-uv.glsl`."""
    return pos * 0.5 + 0.5


def uv_to_pos(uv):
    """UV [0,1] -> NDC [-1,1]; `f32[..., 2]`. Ref `src/map/uv-to-pos.glsl`."""
    return uv * 2.0 - 1.0


def aspect(size, scale):
    """`scale / size` — ref `src/utils/aspect.js:6-7`."""
    size = np.asarray(size, np.float32)
    return np.float32(scale) / size


def cover_aspect(size):
    """`max(size) / size` — ref `src/utils/aspect.js:12-13`."""
    return aspect(size, max(size))


def contain_aspect(size):
    """`min(size) / size` — ref `src/utils/aspect.js:9-10`."""
    return aspect(size, min(size))


def clip_to_pixel(p_clip, view_res):
    """Clip-space `f32[..., 2]` -> fractional pixel centres `f32[..., 2]`.

    The GL rasteriser maps clip [-1,1] to window [0, res]; a sample at pixel
    centre k has window coord k + 0.5. Returns (x_pix, y_pix) window coords.
    """
    w, h = view_res
    x = (p_clip[..., 0] * 0.5 + 0.5) * w
    y = (p_clip[..., 1] * 0.5 + 0.5) * h
    return jnp.stack([x, y], axis=-1)


def uv_grid(shape, dtype=jnp.float32):
    """Per-texel UVs of a `[h, w]` grid at pixel centres, `f32[h, w, 2]`.

    Matches `gl_FragCoord.xy / res` (fragment at pixel centre), e.g. the
    logic shader's `uv` (`src/logic.frag:46`).
    """
    h, w = shape
    ys = (jnp.arange(h, dtype=dtype) + 0.5) / h
    xs = (jnp.arange(w, dtype=dtype) + 0.5) / w
    u, v = jnp.meshgrid(xs, ys)  # u: [h, w] of x, v: [h, w] of y
    return jnp.stack([u, v], axis=-1)
