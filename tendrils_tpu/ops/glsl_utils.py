"""Small GLSL utility twins — ref `src/utils/*.glsl`, `src/geom/*.glsl`,
`libs/glsl-hsv/*`.

Ports of the remaining shared shader helpers so every module of the
reference's GLSL corpus has a named equivalent: `length2`, `nilish`, `perp`,
`transform`, `point_in_box`, `line_sdf`, and the HSV pair. All jnp,
shape-generic, vectorised over leading axes.
"""

import jax.numpy as jnp

from ..const import EPSILON


def length2(v):
    """Squared length — ref `src/utils/length-2.glsl`. `f32[..., D]`."""
    return jnp.sum(v * v, axis=-1)


def nilish(v):
    """Near-zero test — ref `src/utils/nilish.glsl` (eps = 1e-9)."""
    v = jnp.asarray(v)
    if v.ndim and v.shape[-1] <= 4:
        return length2(v) <= EPSILON
    return v * v <= EPSILON


def perp(v, anti=False):
    """Perpendicular — ref `src/utils/perp.glsl`. `f32[..., 2]`."""
    x, y = v[..., 0], v[..., 1]
    if anti:
        return jnp.stack([y, -x], axis=-1)
    return jnp.stack([-y, x], axis=-1)


def transform(m, v):
    """Homogeneous transform — ref `src/utils/transform.glsl`.

    `m: f32[D+1, D+1]`, `v: f32[..., D]` -> `f32[..., D]`.
    """
    d = v.shape[-1]
    out = jnp.einsum("ij,...j->...i", m[:d, :d], v) + m[:d, d]
    return out


def point_in_box(point, box):
    """1.0 if inside — ref `src/geom/point-in-box.glsl`.

    `box: f32[4]` as (min.x, min.y, max.x, max.y).
    """
    clamped = jnp.clip(point, box[:2], box[2:])
    diff = point - clamped
    return (length2(diff) <= 0.0).astype(jnp.float32)


def line_sdf(p, start, end, rad):
    """Distance to a capsule segment — ref `src/geom/line/sdf.glsl`."""
    rel = start - p
    direction = start - end
    length = jnp.sqrt(jnp.sum(direction * direction, axis=-1,
                              keepdims=True))
    direction = direction / jnp.maximum(length, 1e-12)
    proj = jnp.clip(jnp.sum(rel * direction, axis=-1, keepdims=True), 0.0,
                    length) * direction
    return jnp.sqrt(length2(rel - proj)) - rad


def rgb_to_hsv(rgb):
    """`libs/glsl-hsv/rgb-hsv.glsl`. `f32[..., 3]` -> `f32[..., 3]`."""
    from .spawn import rgb_to_hsv as _core
    h, s, v = _core(rgb[..., 0], rgb[..., 1], rgb[..., 2])
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    """`libs/glsl-hsv/hsv-rgb.glsl`. `f32[..., 3]` -> `f32[..., 3]`."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    k = jnp.mod(h[..., None] * 6.0 + jnp.asarray([5.0, 3.0, 1.0]), 6.0)
    f = jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)
    return v[..., None] * (1.0 - s[..., None] * f)