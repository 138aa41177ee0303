"""Pallas gather backend vs the XLA bilinear oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from tendrils_tpu.ops import sample
from tendrils_tpu.ops.gather_pallas import bilinear_gather


def test_matches_bilinear_oracle():
    rng = np.random.default_rng(0)
    h, w, m = 96, 384, 5000
    grid = jnp.asarray(rng.uniform(-1, 1, (4, h, w)), jnp.float32)
    x = jnp.asarray(rng.uniform(-3, w + 3, m), jnp.float32)
    y = jnp.asarray(rng.uniform(-3, h + 3, m), jnp.float32)
    ref = sample.bilinear_sample(grid, x, y)
    out = bilinear_gather(grid, x, y, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_slot_order_preserved():
    # Output must be in input order despite internal sorting.
    h, w = 32, 128
    grid = jnp.arange(h * w, dtype=jnp.float32).reshape(1, h, w)
    x = jnp.asarray([100.5, 3.5, 50.5], jnp.float32)
    y = jnp.asarray([20.5, 1.5, 10.5], jnp.float32)
    out = bilinear_gather(grid, x, y, interpret=True)
    exp = [20 * w + 100, 1 * w + 3, 10 * w + 50]
    np.testing.assert_allclose(np.asarray(out[0]), exp, atol=1e-4)


def test_clamp_to_edge():
    grid = jnp.ones((2, 16, 128)) * jnp.arange(128)[None, None, :]
    out = bilinear_gather(grid, jnp.asarray([-10.0, 500.0]),
                          jnp.asarray([8.0, 8.0]), interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]), [0.0, 127.0], atol=1e-4)
