"""Carried flow force (`EngineConfig.carry_force`): the fused draw's
segment sort doubles as the next step's flow-gather binning, so the step
pays no gather sort. Must match the in-step gather path (same pre-decayed
bilinear read, positions quantised to the splat's sub-pixel grid)."""

import dataclasses

import numpy as np

from tendrils_tpu import EngineConfig, Tendrils
from tendrils_tpu.engine import carry_enabled
from tendrils_tpu.ops import spawn

import pytest

pytestmark = pytest.mark.kernel  # Pallas-kernel set (see pytest.ini)


def make(carry, frames=6, root=32):
    eng = Tendrils(EngineConfig(
        root_num=root, view_res=(32, 128), flow_samples=2, flow_rows=1,
        view_samples=2, splat_backend="pallas", gather_backend="pallas",
        carry_force=carry))
    eng.setup()
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
    for _ in range(frames):
        eng.frame()
    return eng


def test_carry_gate():
    assert carry_enabled(make(True, frames=0).config)
    assert not carry_enabled(make(False, frames=0).config)
    assert not carry_enabled(
        dataclasses.replace(make(True, frames=0).config,
                            gather_backend="xla"))


def test_carry_matches_instep_gather():
    a = make(True)
    b = make(False)

    # The carry path runs resident (rows tile-sorted) — compare by
    # particle identity.
    def ident(sim):
        return np.asarray(sim.particles)[:, np.argsort(np.asarray(sim.idx))]

    # Positions quantised to 1/32 px (this grid) for the carried gather;
    # the carry path additionally reconstructs p0 from the quantised vel
    # (resident mode), jittering deposits ≤ ~0.03 px — a handful of
    # particles near flow-gradient boundaries drift visibly-in-f32 but
    # sub-pixel over 6 frames.
    pa, pb = ident(a.sim), ident(b.sim)
    np.testing.assert_allclose(pa, pb, atol=2e-3)
    assert (np.abs(pa - pb) > 1e-4).mean() < 0.02
    np.testing.assert_allclose(np.asarray(a.sim.flow)[3].sum(),
                               np.asarray(b.sim.flow)[3].sum(), rtol=1e-2)


def test_carry_populates_and_consumes():
    eng = make(True, frames=1)
    assert eng.sim.force is not None
    assert eng.sim.force.shape == (2, eng.config.n)
    # Flow edits invalidate the carried force.
    eng.inject_flow_segments(
        np.asarray([[4.0, 4.0]], np.float32),
        np.asarray([[8.0, 8.0]], np.float32),
        np.asarray([[0.002], [0.002]], np.float32), 2.0)
    assert eng.sim.force is None
    eng.frame()
    assert eng.sim.force is not None
    # Respawn invalidates.
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.5, 0.01))
    assert eng.sim.force is None


def test_carry_headless_scan_matches_interactive():
    import jax.numpy as jnp
    from tendrils_tpu.engine import run_headless

    eng = make(True, frames=0)
    dt = 1000.0 / 60.0
    sim = run_headless(eng.sim, eng.params(), eng.config, eng._view_size,
                       jnp.float32(0.0), jnp.float32(dt), 4)

    eng2 = make(True, frames=0)
    for _ in range(4):
        eng2.frame()
    # Host-timer time accumulation vs traced `t0 + dt*i` differ at f32 ulp;
    # noise forces amplify that to ~1e-4 over a few frames (same for the
    # non-carried path) — structural agreement is what's asserted.
    np.testing.assert_allclose(np.asarray(sim.particles),
                               np.asarray(eng2.sim.particles),
                               rtol=1e-3, atol=5e-4)


def test_gather2_fallback_on_big_grids():
    """Grids with >2^11 tiles (4K-class) can't pack the gather key with the
    row id in 31 bits — the aux stream falls back to two sort operands
    (`gather==2`). Exercised by the 4M/16M bench configs on TPU; this
    covers the branch in CI."""
    import jax.numpy as jnp
    from tendrils_tpu.ops.draw_pallas import fused_draw_accumulate
    from tendrils_tpu.ops.gather_pallas import bilinear_gather_keyed
    from tendrils_tpu.ops.tile_geom import TILE_H, TILE_W, pad_dims

    h, w = 1024, 8064
    hp, wp = pad_dims(h, w)
    assert (hp // TILE_H) * (wp // TILE_W) > (1 << 11)  # forces gather==2

    rng = np.random.RandomState(5)
    n = 64
    p0 = jnp.asarray(
        np.stack([rng.uniform(4, w - 4, n), rng.uniform(4, h - 4, n)], -1),
        jnp.float32)
    p1 = p0 + jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    vel = jnp.asarray(rng.uniform(-0.008, 0.008, (2, n)), jnp.float32)
    out = fused_draw_accumulate(
        (h, w), p0, p1, vel, jnp.zeros((2, n)), jnp.zeros((4, n)),
        jnp.ones((n,)), jnp.float32(0.01), jnp.float32(16.0),
        idx=jnp.arange(n, dtype=jnp.int32), samples=2,
        base_color=jnp.asarray([1.0, 1.0, 1.0, 0.5]),
        speed_alpha=jnp.float32(1e-6))
    flow_parts, view_parts, aux = out
    gidx, gkey, p1u = [np.asarray(a) for a in aux]
    # ids are a permutation (pads carry tail ids); keys are legal tiles.
    np.testing.assert_array_equal(np.sort(gidx), np.arange(gidx.size))
    assert gkey.min() >= 0
    assert gkey.max() < (hp // TILE_H) * (wp // TILE_W)
    assert np.asarray(flow_parts[1]).sum() > 0  # deposits landed

    # The keyed gather consumes the stream (wide grid, clustered order).
    grid = jnp.asarray(rng.rand(2, h, w), jnp.float32)
    from tendrils_tpu.ops.draw_pallas import HALF, pos_scale_for
    from tendrils_tpu.ops.tile_geom import PAD_LO_H, PAD_LO_W
    inv_p = 1.0 / pos_scale_for((h, w))
    xs = np.clip((p1u & HALF).astype(np.float32) * inv_p,
                 PAD_LO_W + 0.5, PAD_LO_W + w - 0.5)
    ys = np.clip((p1u >> 15).astype(np.float32) * inv_p,
                 PAD_LO_H + 0.5, PAD_LO_H + h - 0.5)
    f = np.asarray(bilinear_gather_keyed(grid, jnp.asarray(xs),
                                         jnp.asarray(ys),
                                         jnp.asarray(gkey)))
    assert np.isfinite(f).all()
    # Spot-check the live rows against the XLA bilinear oracle.
    from tendrils_tpu.ops import sample
    want = np.asarray(sample.bilinear_sample(
        grid, jnp.asarray(xs - PAD_LO_W), jnp.asarray(ys - PAD_LO_H)))
    live_rows = gidx < n
    np.testing.assert_allclose(f[:, live_rows], want[:, live_rows],
                               rtol=1e-4, atol=1e-5)


def test_carry_io_frame_sees_injections():
    # step_draw_io gathers the carried force AFTER flow-line injection: the
    # next step must feel the injected flow.
    def run(inject):
        eng = make(True, frames=0)
        eng.state["flowWeight"] = 2.0
        eng.timer.tick()
        seg = None
        if inject:
            p0 = np.asarray([[40.0, 10.0]], np.float32)
            p1 = np.asarray([[60.0, 20.0]], np.float32)
            vel = np.asarray([[0.008], [0.008]], np.float32)
            seg = (p0, p1, vel, 6.0)
        eng.step_draw_io(segments=seg)
        eng.timer.tick()
        eng.step_draw_io()
        return np.asarray(eng.sim.particles)

    base = run(False)
    pushed = run(True)
    assert np.abs(pushed - base).max() > 1e-7


def test_flow_off_gate_matches_general_path():
    """`flow_force_unused` (host-known flowWeight == 0) must not change
    trajectories: the flow term the gate skips is exactly `force * 0`
    (variance is multiplicative), so particle state matches the ungated
    frame bit-for-bit, and so does the VIEW — the flow-channel-pruned
    splat computes the view group with the identical matmuls (round-5
    config-1 lever). The flow grid itself is FROZEN under flow_off (the
    five flow channels are dropped from the accumulator; nothing reads
    the grid while flowWeight == 0 — documented deviation, decay-on-read
    makes missed accumulation vanish on re-enable)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from tendrils_tpu import engine as eng_mod

    def run(flow_off):
        eng = make(carry=True, frames=0)
        eng.state["flowWeight"] = 0.0
        assert eng_mod.flow_force_unused(eng.state) is True
        flow0 = np.asarray(eng.sim.flow)
        for _ in range(4):
            eng.timer.tick()
            eng._check_force_params()
            eng.sim = eng_mod._frame_jit(
                eng.sim, eng.params(), jnp.float32(eng.timer.time),
                jnp.float32(eng.timer.dt), eng.config, eng._view_size,
                targets_live=False,
                fast_resolve=eng_mod.fast_resolve_ok(eng.config, eng.state),
                flow_off=flow_off)
        return eng.sim, flow0

    (a, flow0), (b, _) = run(True), run(False)
    # Identity-aligned exact state match (rows may sort differently only
    # if the draw variant changed sort ties — align by idx).
    pa = np.asarray(a.particles)[:, np.argsort(np.asarray(a.idx))]
    pb = np.asarray(b.particles)[:, np.argsort(np.asarray(b.idx))]
    np.testing.assert_array_equal(pa, pb)
    pruned = eng_mod.fast_resolve_ok(make(carry=True, frames=0).config,
                                     {"flowWidth": 1.0, "lineWidth": 1.0})
    if pruned:
        # Pruned path active: flow frozen, view bit-exact.
        np.testing.assert_array_equal(np.asarray(a.flow), flow0)
        np.testing.assert_array_equal(np.asarray(a.view),
                                      np.asarray(b.view))
    else:
        np.testing.assert_allclose(np.asarray(a.view), np.asarray(b.view),
                                   atol=1e-5)
    assert a.force is None


def test_flow_off_flag_is_off_when_flow_active():
    from tendrils_tpu.engine import flow_force_unused
    assert flow_force_unused({"flowWeight": 1.0}) is False
    assert flow_force_unused({"flowWeight": 0.0}) is True
    assert flow_force_unused({}) is False
    assert flow_force_unused(None) is False
