"""Pallas splat backend vs the XLA scatter oracle (interpret mode on CPU —
SURVEY §4: CPU-vs-Pallas consistency tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tendrils_tpu.ops import splat
from tendrils_tpu.ops.splat_pallas import splat_accumulate

import pytest

pytestmark = pytest.mark.kernel  # Pallas-kernel set (see pytest.ini)


def _compare(grid_hw, m, seed=0, spread=1.0):
    rng = np.random.default_rng(seed)
    h, w = grid_hw
    x = jnp.asarray(rng.uniform(-2, w * spread + 2, m), jnp.float32)
    y = jnp.asarray(rng.uniform(-2, h * spread + 2, m), jnp.float32)
    vals = jnp.asarray(rng.uniform(-1, 1, (4, m)), jnp.float32)
    alpha = jnp.asarray(rng.uniform(0, 0.9, m), jnp.float32)

    num_r, wsum_r, logt_r = splat.splat_accumulate_xla(grid_hw, x, y, vals,
                                                       alpha)
    num_p, wsum_p, logt_p = splat_accumulate(grid_hw, x, y, vals, alpha,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(wsum_p), np.asarray(wsum_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logt_p), np.asarray(logt_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(num_p), np.asarray(num_r),
                               rtol=1e-4, atol=1e-4)


def test_matches_xla_dense():
    _compare((64, 256), 4096)


def test_matches_xla_sparse():
    # Fewer samples than one block, scattered over many tiles.
    _compare((128, 384), 300)


def test_matches_xla_clustered():
    rng = np.random.default_rng(1)
    m = 2048
    x = jnp.asarray(rng.normal(100.0, 2.0, m), jnp.float32)
    y = jnp.asarray(rng.normal(30.0, 2.0, m), jnp.float32)
    vals = jnp.asarray(rng.uniform(0, 1, (2, m)), jnp.float32)
    alpha = jnp.full((m,), 0.3, jnp.float32)
    ref = splat.splat_accumulate_xla((64, 256), x, y, vals, alpha)
    out = splat_accumulate((64, 256), x, y, vals, alpha, interpret=True)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_offgrid_samples_drop():
    # Samples far off-grid contribute nothing (alpha forced to 0), matching
    # the XLA validity mask.
    m = 64
    x = jnp.full((m,), -500.0)
    y = jnp.full((m,), 1000.0)
    vals = jnp.ones((1, m))
    alpha = jnp.ones((m,))
    num, wsum, logt = splat_accumulate((32, 128), x, y, vals, alpha,
                                       interpret=True)
    assert float(jnp.abs(wsum).sum()) == 0.0
    assert float(jnp.abs(num).sum()) == 0.0
