"""Post-processing: fade, copy, blend compositing, vignette blur, bokeh.

TPU re-derivations of the reference's screen-space passes (SURVEY §2.6):

  - Blend (`src/screen/blend/index.js` + `blend/main.frag`): N-texture
    weighted premultiplied sum. Pure elementwise — XLA fuses it.
  - Blur (`src/screen/blur.frag`): vignette-masked hash blur, strongest at
    the edges. The reference jitters 20 sample directions per pixel with a
    hash; per-pixel random gathers are pathological on TPU, so this build
    computes a blur *stack* at static radii (O(1) cumsum box blurs) and
    lerps per pixel by the same vignette-driven blur strength. Same visual
    role (edge-only blur shaped by a bezier vignette), vectorised; the hash
    grain is not reproduced (documented deviation).
  - Bokeh (`src/screen/bokeh.frag` + `libs/bokeh/index.glsl`): brightness-
    weighted disc blur (weights `pow(col², 9)·amount + 0.4` after the
    contrast boost `col·col·1.5`). The weighting is linear in the blur, so
    it is computed exactly as blur(col·w)/blur(w) over the same static
    stack, per-pixel-scaled by the vignette power.

All radii in the stack are static config; the *strength* params stay traced.
"""

import functools

import jax
import jax.numpy as jnp

from . import coords
from .filters import bezier, vignette

# Reference constants: blur.frag:21-22, bokeh.frag:23-25.
BLUR_FALLOFF = (0.0, 1.0, 1.0)
BOKEH_FALLOFF = (0.0, 1.0, 1.0, 1.0)
MID = 0.5
BOKEH_LIMIT = 0.6


def copy(view):
    """FBO blit — ref `src/screen/copy.frag` (FXAA disabled there too)."""
    return view


def blend(views, alphas):
    """Premultiplied weighted sum of views — ref `screen/blend/main.frag:17-29`
    + `src/blend/sum.glsl`. `views`: list of `f32[4, H, W]`; `alphas`: f32[N]
    traced."""
    out = jnp.zeros_like(views[0])
    for i, v in enumerate(views):
        a = v[3] * alphas[i]
        out = out + jnp.concatenate([v[:3] * a[None], a[None]])
    return out


def blend_multiply(views, alphas):
    """`src/blend/multiply.glsl` variant: running premultiplied product."""
    out = None
    for i, v in enumerate(views):
        a = v[3] * alphas[i]
        pre = jnp.concatenate([v[:3] * a[None], a[None]])
        out = pre if out is None else out * pre
    return out


def _box_blur_axis(img, r, axis):
    """O(1) box blur along an axis via cumulative sums, edge-replicated."""
    if r <= 0:
        return img
    pad = [(0, 0)] * img.ndim
    pad[axis] = (r + 1, r)
    padded = jnp.pad(img, pad, mode="edge")
    csum = jnp.cumsum(padded, axis=axis)
    n = img.shape[axis]
    idx_hi = [slice(None)] * img.ndim
    idx_lo = [slice(None)] * img.ndim
    idx_hi[axis] = slice(2 * r + 1, 2 * r + 1 + n)
    idx_lo[axis] = slice(0, n)
    return (csum[tuple(idx_hi)] - csum[tuple(idx_lo)]) / (2 * r + 1)


def box_blur(img, r):
    """Separable box blur of `f32[C, H, W]`, radius static."""
    return _box_blur_axis(_box_blur_axis(img, r, 1), r, 2)


def blur_stack(img, radii=(2, 6, 16)):
    """Progressively blurred copies (repeated boxes ≈ gaussian)."""
    stack = [img]
    cur = img
    prev_r = 0
    for r in radii:
        cur = box_blur(cur, max(1, (r - prev_r) // 2 + 1))
        cur = box_blur(cur, max(1, (r - prev_r) // 2 + 1))
        stack.append(cur)
        prev_r = r
    return stack


def _stack_lerp(stack, level):
    """Blend between stack levels by a per-pixel fractional level `[H, W]`."""
    n = len(stack) - 1
    level = jnp.clip(level, 0.0, n)
    out = stack[0]
    for i in range(n):
        t = jnp.clip(level - i, 0.0, 1.0)[None]
        out = out + (stack[i + 1] - out) * t
    return out


@functools.partial(jax.jit, static_argnames=("radii", "grain"))
def vignette_blur(view, radius, limit, radii=(2, 6, 16), grain=0.75):
    """Edge blur — ref `src/screen/blur.frag:24-32`.

    Per-pixel blur strength = `radius * (1 - vignette(uv, mid, limit,
    falloff)) * texel`; mapped onto the static blur stack. `radius`/`limit`
    stay traced.

    The reference's `glsl-hash-blur` jitters its 20 tap directions with a
    per-pixel sine hash, leaving a characteristic NOISE GRAIN in the
    blurred zones; per-pixel random gathers are pathological on TPU, so the
    grain is reproduced by hash-jittering the per-pixel stack LEVEL with
    the same `fract(sin)` hash (`grain` scales it; 0 = smooth). Crisp
    (level-0) pixels stay untouched, like the reference's unjittered
    centre."""
    _, h, w = view.shape
    uv = coords.uv_grid((h, w))
    amount = 1.0 - vignette(uv, jnp.full((2,), MID), limit,
                            jnp.asarray(BLUR_FALLOFF, jnp.float32))
    strength = radius * amount  # in pixels of blur radius
    max_r = radii[-1]
    level = strength / max_r * (len(radii))
    if grain:
        from .rand import glsl_random
        jitter = glsl_random(uv * jnp.asarray([w, h], jnp.float32)) - 0.5
        level = level + jitter * grain * jnp.minimum(level, 1.0)
    stack = blur_stack(view, radii)
    blurred = _stack_lerp(stack, level)
    # Alpha passes through unblurred — ref blur.frag:30-31 keeps view alpha.
    return jnp.concatenate([blurred[:3], view[3:4]])


@functools.partial(jax.jit, static_argnames=("radii",))
def bokeh(view, radius, amount, radii=(2, 6, 16)):
    """Vignette bokeh — ref `src/screen/bokeh.frag:27-34` +
    `libs/bokeh/index.glsl`.

    Exact weighting (blur of col·w over blur of w with the reference's
    highlight weights), disc kernel approximated by the blur stack, scaled
    per pixel by the vignette power.
    """
    _, h, w = view.shape
    uv = coords.uv_grid((h, w))
    power = 1.0 - vignette(uv, jnp.full((2,), MID), BOKEH_LIMIT,
                           jnp.asarray(BOKEH_FALLOFF, jnp.float32))

    col = view[:3]
    # Contrast boost for highlights — libs/bokeh/index.glsl:34.
    col2 = col * col * 1.5
    # libs/bokeh/index.glsl:27: amount += radius*500 (radius in UV-texel
    # units there; ours is pixels, texel = 1/min(H, W)).
    texel = 1.0 / min(h, w)
    amt = amount * power + (radius * power * texel) * 500.0
    wgt = jnp.power(col2, 9.0) * amt[None] + 0.4

    num = blur_stack(jnp.concatenate([col2 * wgt, wgt]), radii)
    level = (radius * power) / radii[-1] * len(radii)
    blurred = _stack_lerp(num, level)
    out = blurred[:3] / jnp.maximum(blurred[3:], 1e-6)
    return jnp.concatenate([out, view[3:4]])
