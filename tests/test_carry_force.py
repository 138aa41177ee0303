"""Carried flow force (`EngineConfig.carry_force`): the fused draw's
segment sort doubles as the next step's flow-gather binning, so the step
pays no gather sort. Must match the in-step gather path (same pre-decayed
bilinear read, positions quantised to the splat's sub-pixel grid)."""

import dataclasses

import numpy as np

from tendrils_tpu import EngineConfig, Tendrils
from tendrils_tpu.engine import carry_enabled
from tendrils_tpu.ops import spawn


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
    # Positions quantised to 1/32 px (this grid) for the carried gather;
    # flow force differences stay far below velocity scale.
    np.testing.assert_allclose(np.asarray(a.sim.particles),
                               np.asarray(b.sim.particles),
                               rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(a.sim.flow).sum(),
                               np.asarray(b.sim.flow).sum(), rtol=1e-3)


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
