"""Scalar filter utilities: bezier falloff curves and vignettes.

Ports `src/utils/bezier.glsl` (1-4 control-point bezier evaluation) and
`src/filter/vignette.glsl` (radial falloff shaped by a bezier curve), used by
the render colour model, the blur/bokeh posts, the optical-flow falloff and
the vignetted pixel-spawn filters.
"""

import jax.numpy as jnp


def bezier(cp, t):
    """Evaluate a bezier with 1–4 control points — ref `src/utils/bezier.glsl`.

    `cp`: sequence/array of 1-4 scalars; `t`: `f32[...]`.
    """
    cp = jnp.asarray(cp, jnp.float32)
    k = cp.shape[-1] if cp.ndim else 1
    if cp.ndim == 0 or k == 1:
        return jnp.broadcast_to(cp.reshape(-1)[0], jnp.shape(t))
    if k == 2:
        return cp[0] + (cp[1] - cp[0]) * t
    if k == 3:
        ut = 1.0 - t
        return (cp[0] * ut + cp[1] * t) * ut + (cp[1] * ut + cp[2] * t) * t
    if k == 4:
        ut = 1.0 - t
        a1 = cp[1] * ut + cp[2] * t
        return (((cp[0] * ut + cp[1] * t) * ut + a1 * t) * ut
                + (a1 * ut + (cp[2] * ut + cp[3] * t) * t) * t)
    raise ValueError("bezier supports 1-4 control points")


def vignette_amount(point, mid, limit):
    """`min(1 - |point-mid|/limit, 1)` — ref `src/filter/vignette.glsl:5-7`.

    `point`: `f32[..., 2]`; returns `f32[...]`.
    """
    d = jnp.sqrt(jnp.sum((point - mid) ** 2, axis=-1))
    return jnp.minimum(1.0 - d / limit, 1.0)


def vignette(point, mid, limit, curve=None):
    """Radial falloff, optionally bezier-shaped — ref `src/filter/vignette.glsl`."""
    amt = vignette_amount(point, mid, limit)
    if curve is None:
        return jnp.maximum(0.0, amt)
    curve = jnp.asarray(curve, jnp.float32)
    if curve.ndim == 0:
        return jnp.maximum(0.0, curve * amt)
    return jnp.maximum(0.0, bezier(curve, amt))


def vignette_pass(uv, pixel, mid, limit, curve):
    """Vignette as a pixel filter — ref `src/filter/pass/vignette.glsl:9-13`.

    `uv`: `f32[..., 2]`, `pixel`: `f32[C, ...]`; multiplies the pixel by the
    vignette value at its uv.
    """
    return pixel * vignette(uv, mid, limit, curve)
