"""Spawn ops — pure functions producing new particle (or target) state.

Ports the reference spawn subsystem (`src/spawn/`, SURVEY §2.2). In the
reference each spawner is a fragment shader swapped in place of the logic
shader for one step (`Tendrils.spawnShader`, `src/index.js:432-457`); here
each is a pure function `f32[4, N] -> f32[4, N]` the engine applies to either
the particle ping-pong or the targets buffer (same two destinations as the
reference).

Spawners:
  - `init`: all-inert — `src/spawn/init/index.frag`, `src/spawn/init/cpu.js`.
  - `ball`: uniform random disc of positions and velocities —
    `src/spawn/ball/index.frag:8-18` (same fractional-sine hash, so the
    distribution AND the deterministic respawn behaviour match).
  - `pixels_direct`: spawn each particle from its corresponding texel —
    `src/spawn/pixels/frag/direct-main.frag`.
  - `pixels_best_sample`: stochastic best-of-N candidate sampling —
    `src/spawn/pixels/frag/best-sample-main.frag:22-45`.
  - apply/test plugins — `src/spawn/pixels/{apply,test}/*.glsl`.
  - `geometry`: random triangle fans rasterised to a small grid then
    bright-sampled — `src/spawn/geometry/index.js:54-111`.
"""

import functools

import jax
import jax.numpy as jnp

from ..const import INERT, TAU
from . import coords, sample
from .filters import vignette
from .rand import glsl_random

_FLIP_UV = jnp.asarray([1.0, -1.0], jnp.float32)


def angle_to_vec(rad):
    """Ref `src/utils/angle-to-vec.glsl`. `f32[...]` -> `f32[..., 2]`."""
    return jnp.stack([jnp.cos(rad), jnp.sin(rad)], axis=-1)


@jax.jit
def init(particles):
    """All particles inert — ref `src/spawn/init/index.frag`."""
    n = particles.shape[1]
    return jnp.concatenate([
        jnp.full((2, n), INERT, jnp.float32),
        jnp.zeros((2, n), jnp.float32)])


@jax.jit
def ball(particles, frag_xy, radius, speed):
    """Uniform random disc — ref `src/spawn/ball/index.frag:8-18`.

    `frag_xy`: `f32[2, N]` data-texture frag coords (texel centre, ix+0.5);
    the same coords the fragment shader hashes, so respawn is deterministic
    per-particle exactly like the reference.
    """
    fx = frag_xy.T  # [N, 2]
    r = jnp.stack([
        glsl_random(fx * 1.7654 + 2.3675),
        glsl_random(fx * 1.23494 + 0.36434),
        glsl_random(fx * 0.327789 + 3.498787),
        glsl_random(fx * 9.0374 + 0.2773)])
    pos = angle_to_vec(r[0] * TAU).T * (r[1] * radius)
    vel = angle_to_vec(r[2] * TAU).T * (r[3] * speed)
    return jnp.concatenate([pos, vel])


@jax.jit
def ball_random(particles, key, radius=1.0, speed=0.01):
    """CPU-twin ball spawn with a fresh random stream each call — ref
    `src/spawn/ball/cpu.js` (`Math.random` rather than the coordinate hash,
    so successive respawns differ)."""
    import jax
    n = particles.shape[1]
    r = jax.random.uniform(key, (4, n))
    pos = angle_to_vec(r[0] * TAU).T * (r[1] * radius)
    vel = angle_to_vec(r[2] * TAU).T * (r[3] * speed)
    return jnp.concatenate([pos, vel])


# --- Pixel spawners -------------------------------------------------------

def spawn_to_pos(uv, spawn_matrix, spawn_size, jitter, time, seed_uv=None):
    """UV -> spawn position — ref `src/spawn/pixels/frag/head.frag:27-37`.

    Jitters around the UV cell (hiding boxy scaled-sampling artefacts), flips
    Y, scales by `spawn_size` and applies the 3x3 `spawn_matrix`.
    `uv`: `f32[N, 2]`; returns `f32[N, 2]`.
    """
    if seed_uv is None:
        seed_uv = uv
    jx = glsl_random(seed_uv - 1.2345 + time * 0.001)
    jy = glsl_random(seed_uv + 1.2345 + time * 0.001)
    off = jnp.stack([
        -jitter[0] + 2.0 * jitter[0] * jx,
        -jitter[1] + 2.0 * jitter[1] * jy], axis=-1)
    p = coords.uv_to_pos(uv + off) * _FLIP_UV * spawn_size
    m = spawn_matrix
    return jnp.stack([
        m[0, 0] * p[..., 0] + m[0, 1] * p[..., 1] + m[0, 2],
        m[1, 0] * p[..., 0] + m[1, 1] * p[..., 1] + m[1, 2]], axis=-1)


# apply(uv, pos, pixel) plugins: `pixel` is `f32[4, N]`, `pos`/`uv` `f32[N, 2]`;
# each returns a candidate state `f32[4, N]`.

def apply_color(uv, pos, pixel, *, time=0.0, **_):
    """Hue -> direction via HSV — ref `src/spawn/pixels/apply/color.glsl:12-17`."""
    h, s, v = rgb_to_hsv(pixel[0], pixel[1], pixel[2])
    vel = angle_to_vec((h + time * 0.00003) * TAU).T * (s * v * pixel[3])
    return jnp.concatenate([pos.T, vel])


def apply_brightest(uv, pos, pixel, **_):
    """Luma -> speed, random direction — ref `spawn/pixels/apply/brightest.glsl`."""
    lum = luma(pixel)
    rnd = glsl_random(uv * jnp.sum(pixel[:2] * pixel[2:], axis=0)[:, None])
    vel = angle_to_vec(jnp.mod(rnd, 1.0) * TAU).T * (lum * pixel[3])
    return jnp.concatenate([pos.T, vel])


def apply_flow(uv, pos, pixel, *, time=0.0, decay=0.0, **_):
    """Reuse flow payload — ref `src/spawn/pixels/apply/flow.glsl`."""
    age = jnp.maximum(0.0, 1.0 - (time - pixel[2]) * decay)
    return jnp.concatenate([pos.T, pixel[:2] * age])


def apply_particles(uv, pos, pixel, **_):
    """Pixel pos + particle-format vel — ref `spawn/pixels/apply/particles.glsl`."""
    return jnp.concatenate([pos.T, pixel[2:]])


def apply_simple(uv, pos, pixel, **_):
    """Vel encoded in yz — ref `src/spawn/pixels/apply/simple.glsl`."""
    return jnp.concatenate([pos.T, pixel[1:3]])


def apply_identity(uv, pos, pixel, **_):
    """Ref `src/spawn/pixels/apply/identity.glsl`."""
    return pixel


def with_vignette(apply_fn, mid=(0.5, 0.5), limit=0.6, curve=(0.1, 1.0, 1.0)):
    """Compose a vignette filter pass before apply — ref
    `src/spawn/pixels/apply/compose-filter.glsl` + `vignette-head.glsl`."""
    mid = jnp.asarray(mid, jnp.float32)
    curve = jnp.asarray(curve, jnp.float32)

    def composed(uv, pos, pixel, **kw):
        masked = pixel * vignette(uv, mid, limit, curve)[None]
        return apply_fn(uv, pos, masked, **kw)

    return composed


def test_particles(data):
    """Highest speed wins — ref `src/spawn/pixels/test/particles.glsl`."""
    return data[2] ** 2 + data[3] ** 2


def test_brightest(data):
    """Ref `src/spawn/pixels/test/brightest.glsl`."""
    return luma(data)


def test_simple(data):
    """Score encoded in the x channel — ref `src/spawn/pixels/test/simple.glsl`
    (whose body reads `current.x`; the intended semantics)."""
    return data[0]


def luma(pixel):
    """`glsl-luma`: Rec-601 luma `dot(rgb, (0.299, 0.587, 0.114))` — the
    npm package's actual weights, verified against the shader text inlined
    in the reference's shipped bundle (`docs/js/demo-run.js`; it is NOT the
    Rec-709 triple). `pixel: f32[4, N]` -> `f32[N]`."""
    return (0.299 * pixel[0] + 0.587 * pixel[1] + 0.114 * pixel[2])


def rgb_to_hsv(r, g, b):
    """`libs/glsl-hsv/rgb-hsv.glsl` semantics, vectorised."""
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    eps = 1e-10
    s = d / (mx + eps)
    v = mx
    rc = (mx - r) / (d + eps)
    gc = (mx - g) / (d + eps)
    bc = (mx - b) / (d + eps)
    h = jnp.where(r == mx, bc - gc, jnp.where(g == mx, 2.0 + rc - bc,
                                              4.0 + gc - rc))
    h = jnp.mod(h / 6.0, 1.0)
    h = jnp.where(d < eps, 0.0, h)
    return h, s, v


@functools.partial(jax.jit, static_argnames=("apply_fn",))
def pixels_direct(particles, spawn_data, data_uv, *, apply_fn, speed,
                  spawn_matrix, spawn_size, jitter, time, **apply_kw):
    """Direct per-texel spawn — ref `spawn/pixels/frag/direct-main.frag:10-21`.

    `spawn_data`: `f32[4, H, W]` source texture; `data_uv`: `f32[N, 2]` the
    particle's data-texture UV.
    """
    pos = spawn_to_pos(data_uv, spawn_matrix, spawn_size, jitter, time)
    pixel = sample.sample_uv(spawn_data, data_uv)
    st = apply_fn(data_uv, pos, pixel, time=time, **apply_kw)
    return jnp.concatenate([st[:2], st[2:] * speed])


@functools.partial(jax.jit,
                   static_argnames=("apply_fn", "test_fn", "samples"))
def pixels_best_sample(particles, spawn_data, data_uv, *, apply_fn, test_fn,
                       samples, bias, speed, spawn_matrix, spawn_size, jitter,
                       time, **apply_kw):
    """Stochastic best-of-N spawn — ref `frag/best-sample-main.frag:22-45`.

    Keeps the current state unless a sampled candidate scores higher than
    `bias * test(current)` (bias > 1 favours switching) — note the reference
    comparison is `test(current) > bias*test(next)` keeps current.
    """
    state = particles
    base_seed = (state.T + jnp.concatenate([data_uv, data_uv], axis=-1)
                 + (1.2345 + time * 0.001))  # [N, 4]
    for k in range(int(samples)):
        seed = base_seed + float(k)
        su = jnp.mod(glsl_random(seed[:, :2]), 1.0)
        sv = jnp.mod(glsl_random(seed[:, 2:]), 1.0)
        spawn_uv = jnp.stack([su, sv], axis=-1)
        pos = spawn_to_pos(spawn_uv, spawn_matrix, spawn_size, jitter, time)
        pixel = sample.sample_uv(spawn_data, spawn_uv)
        other = apply_fn(spawn_uv, pos, pixel, time=time, **apply_kw)
        other = jnp.concatenate([other[:2], other[2:] * speed])
        keep = test_fn(state) > bias * test_fn(other)
        state = jnp.where(keep[None], state, other)
    return state


# --- Geometry spawner -----------------------------------------------------

def shuffle_triangles(key, count=3, radii=(0.25, 1.3), arcs=(1e-2, 3e-2),
                      obtuse_rate=0.5, obtuse_pad=0.25):
    """Random triangle fan — ref `src/spawn/geometry/index.js:54-91`.

    Each triangle keeps one vertex at the origin; the other two are placed at
    `angle ∓ arc` with independent random radii. Returns `f32[count, 3, 2]`.
    """
    import jax
    ks = jax.random.split(key, 5)
    u = functools.partial(jax.random.uniform, shape=(count,),
                          dtype=jnp.float32)
    angle = u(ks[0]) * TAU
    arc = TAU * (arcs[0] + u(ks[1]) * arcs[1]
                 + (u(ks[2]) < obtuse_rate) * obtuse_pad)
    rad1 = radii[0] + u(ks[3]) * radii[1]
    rad2 = radii[0] + u(ks[4]) * radii[1]
    p1 = angle_to_vec(angle - arc) * rad1[:, None]
    p2 = angle_to_vec(angle + arc) * rad2[:, None]
    p0 = jnp.zeros_like(p1)
    return jnp.stack([p0, p1, p2], axis=1)


@functools.partial(jax.jit, static_argnames=("grid_hw",))
def rasterize_triangles(tris, grid_hw, view_size, color=(1.0, 1.0, 1.0, 1.0)):
    """Rasterise triangles into `f32[4, H, W]` — the reference draws its fan
    into a small FBO at 0.2× view res (`src/spawn/geometry/index.js:94-103`).

    Dense point-in-triangle test per texel (T is tiny — default 3 triangles),
    clip coords scaled by `view_size` like `geom/vert/index.vert`.
    """
    h, w = grid_hw
    uv = coords.uv_grid((h, w))  # [h, w, 2]
    p = coords.uv_to_pos(uv)  # clip coords of texel centres

    inside = jnp.zeros((h, w), jnp.bool_)
    for t in range(tris.shape[0]):
        a, b, c = (tris[t, 0] * view_size, tris[t, 1] * view_size,
                   tris[t, 2] * view_size)

        def edge(p0, p1):
            return ((p[..., 0] - p0[0]) * (p1[1] - p0[1])
                    - (p[..., 1] - p0[1]) * (p1[0] - p0[0]))

        e0, e1, e2 = edge(a, b), edge(b, c), edge(c, a)
        hit = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | ((e0 <= 0) & (e1 <= 0)
                                                     & (e2 <= 0))
        inside = inside | hit

    col = jnp.asarray(color, jnp.float32)
    return col[:, None, None] * inside[None].astype(jnp.float32)
