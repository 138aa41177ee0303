"""Per-particle render colour model and the fade/fill passes.

Ports the vertex colour math of `src/render/index.vert:57-100`:
base colour + colour-map lookup + velocity-direction→RGB alignment on three
axes at 120°, each premultiplied & clamped then summed; alpha scaled by speed
and a radial bezier vignette. The resulting RGBA is alpha-blended into the
view/trail buffer by the splat op (GL `SRC_ALPHA, ONE_MINUS_SRC_ALPHA`,
ref `src/index.js:268`).

The fade pass (`drawFade`/`drawFill`, `src/index.js:342-356` +
`src/screen/index.frag`) is a full-screen alpha-blended fill with `fadeColor`
— the trail decay.
"""

import jax.numpy as jnp

from . import sample
from .filters import vignette

# Pre-generated flow axes — ref `src/render/index.vert:33-36`
# (angleToVec(0), angleToVec(tau/3), angleToVec(2*tau/3)).
_FLOW_AXIS = jnp.asarray([
    [1.0, 0.0],
    [-0.5000000000000004, -0.8660254037844385],
    [-0.4999999999999998, 0.8660254037844387],
], jnp.float32)  # [3, 2]

# ref `src/render/index.vert:44-46`
_FADE_RANGE = (0.2, 1.0)
_FALLOFF = jnp.asarray([0.2, 1.0, 1.0], jnp.float32)


def pre_alpha(rgb, a):
    """Premultiply — ref `src/utils/pre-alpha.glsl`. rgb `f32[3, N]`, a `f32[N]`."""
    return jnp.concatenate([rgb * a[None], a[None]])


def particle_colors(pos, vel, colormap_uv, color_map, params, time):
    """Per-particle RGBA — ref `src/render/index.vert:57-94`.

    `pos`, `vel`: `f32[2, N]`; `colormap_uv`: `f32[2, N]` (the draw-geometry
    UV, `uv * geomRes / dataRes` of `src/render/index.vert:65`).
    Returns `f32[4, N]`.
    """
    speed_limit = params["speedLimit"]
    vel_n = vel / speed_limit
    # speedAlpha = 0 means "saturate immediately" (presets use it, e.g.
    # 'Flow Only'); guard the 0/0 the GLSL leaves undefined.
    speed_rate = jnp.minimum(
        (vel_n[0] ** 2 + vel_n[1] ** 2)
        / jnp.maximum(params["speedAlpha"], 1e-12), 1.0)

    # Colour map
    mapped = sample.sample_uv(color_map, colormap_uv.T)  # [4, N]
    mapped = mapped * params["colorMapAlpha"]

    # Flow-alignment colour: velocity direction projected on 3 axes at 120°,
    # hue-rotated over time by flowDecay — ref `src/render/index.vert:76-83`.
    align = jnp.einsum("ac,cn->an", _FLOW_AXIS, vel_n)  # [3, N]
    align_gbr = align[jnp.asarray([1, 2, 0])]
    t = jnp.sin(time * params["flowDecay"])
    mixed = align + (align_gbr * (1.0 - params["flowDecay"]) - align) * t
    flow_align = mixed * 0.5 + 0.5  # map [-1,1] -> [0,1]

    flow_color = params["flowColor"]  # f32[4]
    base_color = params["baseColor"]  # f32[4]

    n = pos.shape[1]
    base_rgba = pre_alpha(jnp.broadcast_to(base_color[:3, None], (3, n)),
                          jnp.broadcast_to(base_color[3], (n,)))
    mapped_rgba = pre_alpha(mapped[:3], mapped[3])
    flow_rgba = pre_alpha(flow_color[:3, None] * flow_align,
                          jnp.broadcast_to(flow_color[3], (n,)))

    color = (jnp.clip(base_rgba, 0.0, 1.0)
             + jnp.clip(mapped_rgba, 0.0, 1.0)
             + jnp.clip(flow_rgba, 0.0, 1.0))

    # Alpha: speed rate × clamped radial vignette — ref index.vert:92-94.
    vig = vignette(pos.T, jnp.zeros((2,), jnp.float32), 1.0, _FALLOFF)
    a = color[3] * speed_rate * jnp.clip(vig, _FADE_RANGE[0], _FADE_RANGE[1])
    return jnp.concatenate([color[:3], a[None]])


def fade_fill(view, color):
    """Alpha-blend a constant colour over a grid — ref `src/index.js:350-356`.

    `view: f32[4, H, W]`, `color: f32[4]`. The reference skips the pass when
    `fadeColor[3] <= 0` (`src/index.js:343`); blending with a = 0 is the same
    no-op, so we blend unconditionally and stay jit-friendly.
    """
    a = color[3]
    src = jnp.concatenate([color[:3], color[3:4]])
    return src[:, None, None] * a + view * (1.0 - a)
