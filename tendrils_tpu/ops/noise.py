"""Simplex noise, TPU-vectorised.

The reference's wander force uses `glsl-noise`'s simplex 3D (the public-domain
Ashima Arts / Stefan Gustavson `webgl-noise` algorithm), required from
`src/logic.frag:36` and evaluated per particle at
`(pos*noiseScale, uv.x + time*noiseSpeed)` — `src/logic.frag:62-68`.

This module reimplements the same algorithm as pure `jnp` elementwise math so
XLA fuses it straight into the particle-step kernel (it is transcendental-free
— only floor/abs/mul — so it runs entirely on the VPU). Shapes are arbitrary:
`snoise3` maps `f32[..., 3] -> f32[...]`.
"""

import jax.numpy as jnp


def _mod289(x):
    return x - jnp.floor(x * (1.0 / 289.0)) * 289.0


def _permute(x):
    return _mod289(((x * 34.0) + 1.0) * x)


def _taylor_inv_sqrt(r):
    return 1.79284291400159 - 0.85373472095314 * r


def snoise3(v):
    """Simplex 3D noise of `v: f32[..., 3]` -> `f32[...]` in ~[-1, 1].

    Same lattice/permutation/gradient scheme as the GLSL `snoise(vec3)` the
    reference composes into its logic shader, so preset parameters (noise
    scale/speed) produce comparable fields.
    """
    v = jnp.asarray(v, jnp.float32)
    C_x = jnp.float32(1.0 / 6.0)
    C_y = jnp.float32(1.0 / 3.0)

    # First corner
    i = jnp.floor(v + jnp.sum(v, axis=-1, keepdims=True) * C_y)
    x0 = v - i + jnp.sum(i, axis=-1, keepdims=True) * C_x

    # Other corners
    g = (x0 >= x0[..., [1, 2, 0]]).astype(jnp.float32)
    l = 1.0 - g
    l_zxy = l[..., [2, 0, 1]]
    i1 = jnp.minimum(g, l_zxy)
    i2 = jnp.maximum(g, l_zxy)

    x1 = x0 - i1 + C_x
    x2 = x0 - i2 + C_y
    x3 = x0 - 0.5

    # Permutations
    i = _mod289(i)
    iz, iy, ix = i[..., 2:3], i[..., 1:2], i[..., 0:1]
    z4 = jnp.stack(
        [jnp.zeros_like(i1[..., 2]), i1[..., 2], i2[..., 2],
         jnp.ones_like(i1[..., 2])], axis=-1)
    y4 = jnp.stack(
        [jnp.zeros_like(i1[..., 1]), i1[..., 1], i2[..., 1],
         jnp.ones_like(i1[..., 1])], axis=-1)
    x4 = jnp.stack(
        [jnp.zeros_like(i1[..., 0]), i1[..., 0], i2[..., 0],
         jnp.ones_like(i1[..., 0])], axis=-1)
    p = _permute(_permute(_permute(iz + z4) + iy + y4) + ix + x4)

    # Gradients: 7x7 points over a square, mapped onto an octahedron.
    ns_x = jnp.float32(2.0 / 7.0)  # n_ * D.w  (n_ = 1/7, D.w = 2)
    ns_y = jnp.float32(0.5 / 7.0 - 1.0)  # n_ * D.y - D.z
    ns_z = jnp.float32(1.0 / 7.0)  # n_ * D.z - D.x

    j = p - 49.0 * jnp.floor(p * (ns_z * ns_z))

    x_ = jnp.floor(j * ns_z)
    y_ = jnp.floor(j - 7.0 * x_)

    x = x_ * ns_x + ns_y
    y = y_ * ns_x + ns_y
    h = 1.0 - jnp.abs(x) - jnp.abs(y)

    # b0 = (x.xy, y.xy), b1 = (x.zw, y.zw)
    sx = jnp.floor(x) * 2.0 + 1.0
    sy = jnp.floor(y) * 2.0 + 1.0
    sh = -(h <= 0.0).astype(jnp.float32)

    a0x = x + sx * sh
    a0y = y + sy * sh

    p0 = jnp.stack([a0x[..., 0], a0y[..., 0], h[..., 0]], axis=-1)
    p1 = jnp.stack([a0x[..., 1], a0y[..., 1], h[..., 1]], axis=-1)
    p2 = jnp.stack([a0x[..., 2], a0y[..., 2], h[..., 2]], axis=-1)
    p3 = jnp.stack([a0x[..., 3], a0y[..., 3], h[..., 3]], axis=-1)

    def dot3(a, b):
        return jnp.sum(a * b, axis=-1)

    norm = _taylor_inv_sqrt(
        jnp.stack([dot3(p0, p0), dot3(p1, p1), dot3(p2, p2), dot3(p3, p3)],
                  axis=-1))
    p0 = p0 * norm[..., 0:1]
    p1 = p1 * norm[..., 1:2]
    p2 = p2 * norm[..., 2:3]
    p3 = p3 * norm[..., 3:4]

    m = jnp.maximum(
        0.6 - jnp.stack([dot3(x0, x0), dot3(x1, x1), dot3(x2, x2),
                         dot3(x3, x3)], axis=-1),
        0.0)
    m = m * m
    grads = jnp.stack([dot3(p0, x0), dot3(p1, x1), dot3(p2, x2), dot3(p3, x3)],
                      axis=-1)
    return 42.0 * jnp.sum(m * m * grads, axis=-1)
