"""Engine integration of the merge reorder (`EngineConfig.merge_reorder`):
resident frames restore sortedness by merging the churned rows
(`ops/reorder_pallas.py`) instead of the flat segment sort.

Equivalence: per particle identity the trajectories must match the
flat-sort resident path to accumulation-order tolerance (the merge's
U-before-C within-tile order changes the deposit SUMMATION order, so the
flow/view fields — and forces gathered from them — differ at f32
rounding; per-row reconstruction is order-independent). The carry must
stay valid across frames (tile-sorted key stream + exact histogram), and
a mass respawn must fall back and re-establish it.
"""

import numpy as np
import pytest

from tendrils_tpu import EngineConfig, Tendrils
from tendrils_tpu.engine import (merge_reorder_enabled, resident_enabled,
                                 run_headless, seed_sort_carry)
from tendrils_tpu.ops import spawn
from tendrils_tpu.ops.draw_pallas import PACK_IDX_BITS, seg_tile_count

pytestmark = pytest.mark.kernel


def make_engine(merge, root=128):
    cfg = EngineConfig(root_num=root, view_res=(32, 128), flow_samples=2,
                       flow_rows=1, view_samples=2, splat_backend="pallas",
                       gather_backend="pallas", fused_draw=True,
                       resident_stream=True, merge_reorder=merge)
    eng = Tendrils(cfg)
    eng.setup()
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
    return eng


def by_identity(sim):
    order = np.argsort(np.asarray(sim.idx))
    return np.asarray(sim.particles)[:, order]


def _key_bits(cfg):
    """The fused draw's key packing for this geometry (gather mode 1 vs
    3 — mirrors `fused_draw_accumulate`)."""
    nt = seg_tile_count(cfg.view_res)
    if cfg.n <= (1 << 20) and nt <= (1 << 11):
        return 20
    return PACK_IDX_BITS


def test_merge_matches_flat_resident():
    a = make_engine(merge=True)
    b = make_engine(merge=False)
    assert merge_reorder_enabled(a.config) and resident_enabled(a.config)
    assert not merge_reorder_enabled(b.config)
    assert a.sim.sort_key is not None and b.sim.sort_key is None
    for _ in range(5):
        a.frame()
        b.frame()
    pa, pb = by_identity(a.sim), by_identity(b.sim)
    # Deposit-order rounding feeds back through the gathered force; the
    # bulk must stay near-exact (same bounds as the resident-vs-classic
    # test).
    np.testing.assert_allclose(pa, pb, atol=1e-3)
    assert (np.abs(pa - pb) > 5e-5).mean() < 0.01
    idx = np.sort(np.asarray(a.sim.idx))
    np.testing.assert_array_equal(idx, np.arange(a.config.n))
    np.testing.assert_allclose(np.asarray(a.sim.view),
                               np.asarray(b.sim.view), atol=2e-4)
    np.testing.assert_allclose(np.asarray(a.sim.flow),
                               np.asarray(b.sim.flow), atol=2e-4)

    # The carry invariant: the key stream is tile-sorted and the
    # histogram is its exact tile census.
    bits = _key_bits(a.config)
    ks = np.asarray(a.sim.sort_key)
    tiles = ks >> bits
    assert np.all(np.diff(tiles) >= 0)
    nt = seg_tile_count(a.config.view_res)
    np.testing.assert_array_equal(
        np.asarray(a.sim.sort_hist),
        np.bincount(tiles, minlength=nt)[:nt])


def test_merge_engages_on_coherent_frames():
    """Steady frames must take the MERGE branch, not the flat fallback:
    the merge's U-before-C within-tile order differs from the flat
    sort's full-key order, so the row permutations diverge while the
    per-id states stay equivalent."""
    a = make_engine(merge=True)
    b = make_engine(merge=False)
    for _ in range(5):
        a.frame()
        b.frame()
    assert not np.array_equal(np.asarray(a.sim.idx),
                              np.asarray(b.sim.idx)), \
        "identical row orders after 5 frames - the merge never engaged"


def test_spawn_falls_back_and_recovers():
    """A mass respawn churns every key (capacity guard trips -> flat
    fallback) and the next frames re-establish a valid carry."""
    a = make_engine(merge=True)
    for _ in range(3):
        a.frame()
    a.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.3, 0.02))
    for _ in range(3):
        a.frame()
    bits = _key_bits(a.config)
    tiles = np.asarray(a.sim.sort_key) >> bits
    assert np.all(np.diff(tiles) >= 0)
    idx = np.sort(np.asarray(a.sim.idx))
    np.testing.assert_array_equal(idx, np.arange(a.config.n))


def test_run_headless_seeds_and_carries():
    """`run_headless` seeds the carry when enabled (scan-stable
    structure) and returns a valid carry."""
    a = make_engine(merge=True)
    sim = a.sim
    # Strip the carry: run_headless must re-seed it.
    import dataclasses
    sim = dataclasses.replace(sim, sort_key=None, sort_hist=None)
    out = run_headless(sim, a.params(), a.config, a._view_size,
                       0.0, 1.0 / 60.0, 4, targets_live=True)
    assert out.sort_key is not None
    bits = _key_bits(a.config)
    tiles = np.asarray(out.sort_key) >> bits
    assert np.all(np.diff(tiles) >= 0)


def test_seed_shape_matches_geometry():
    a = make_engine(merge=True)
    seeded = seed_sort_carry(a.sim, a.config)
    assert seeded.sort_key.shape == (a.config.n,)
    assert seeded.sort_hist.shape == (seg_tile_count(a.config.view_res),)
