"""Resident-sorted particle mode: the row permutation must be invisible —
same trajectories (per original index), same rendered fields — while the
Pallas kernels see clustered blocks with no per-frame sorting."""

import numpy as np

from tendrils_tpu import EngineConfig, Tendrils
from tendrils_tpu.ops import spawn


def run(resident, frames=6, backend="pallas"):
    # resident_stream off for BOTH runs: this test isolates the amortised
    # resident_sort permutation (the stream mode has its own test file and
    # slightly different deposit placement via derive_p0).
    eng = Tendrils(EngineConfig(
        root_num=32, view_res=(32, 128), flow_samples=2, flow_rows=1,
        view_samples=2, splat_backend=backend, gather_backend=backend,
        resident_sort=resident, resident_stream=False))
    eng.setup()
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
    for _ in range(frames):
        eng.frame()
    # Particles back in original-index order for comparison.
    order = np.argsort(np.asarray(eng.sim.idx))
    p = np.asarray(eng.sim.particles)[:, order]
    return p, np.asarray(eng.sim.flow), np.asarray(eng.sim.view)


def test_resident_matches_unsorted():
    p_ref, flow_ref, view_ref = run(0)
    p_rs, flow_rs, view_rs = run(2)
    # Same per-particle trajectories (order restored by idx); fp
    # reassociation from permuted reductions allows small noise.
    np.testing.assert_allclose(p_rs, p_ref, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(flow_rs.sum(), flow_ref.sum(), rtol=1e-3)
    np.testing.assert_allclose(view_rs.sum(), view_ref.sum(), rtol=1e-3)


def test_idx_is_permutation():
    eng = Tendrils(EngineConfig(
        root_num=16, view_res=(32, 64), flow_samples=2, flow_rows=1,
        view_samples=2, splat_backend="pallas", gather_backend="pallas",
        resident_sort=1))
    eng.setup()
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
    for _ in range(3):
        eng.frame()
    idx = np.sort(np.asarray(eng.sim.idx))
    np.testing.assert_array_equal(idx, np.arange(eng.config.n))


def test_resident_sorted_rows_clustered():
    # After a resort, consecutive rows should have monotonically
    # non-decreasing tile keys.
    from tendrils_tpu.engine import resort_sim
    eng = Tendrils(EngineConfig(root_num=32, view_res=(64, 128),
                                flow_samples=2, flow_rows=1,
                                view_samples=2))
    eng.setup()
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.8, 0.01))
    sim = resort_sim(eng.sim, eng.config, eng._view_size)
    pos = np.asarray(sim.particles[:2])
    from tendrils_tpu.ops import draw_pallas as dp
    fh, fw = 64, 128
    hp, wp = dp._pad_dims(fh, fw)
    vs = np.asarray(eng._view_size)
    x = np.clip((pos[0] * vs[0] * 0.5 + 0.5) * fw + dp.PAD_LO_W, 1.0,
                dp.PAD_LO_W + fw + 1.0)
    y = np.clip((pos[1] * vs[1] * 0.5 + 0.5) * fh + dp.PAD_LO_H, 1.0,
                dp.PAD_LO_H + fh + 1.0)
    key = ((np.floor(y - 0.5).astype(int) // dp.TILE_H) * (wp // dp.TILE_W)
           + np.floor(x - 0.5).astype(int) // dp.TILE_W)
    assert (np.diff(key) >= 0).all()


def test_coords_from_idx_match_host_twins():
    import jax.numpy as jnp
    from tendrils_tpu import state as sm
    r = 16
    idx = jnp.arange(r * r, dtype=jnp.int32)
    uv, i01, _ = sm.particle_coords_from_idx(idx, r)
    np.testing.assert_allclose(np.asarray(uv), np.asarray(sm.particle_uv(r)),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(i01),
                               np.asarray(sm.particle_index01(r)), atol=1e-6)
