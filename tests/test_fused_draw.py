"""Fused draw kernel vs the generic two-pass path (interpret mode on CPU).

With unit line widths and matching sample counts, the fused kernel must
reproduce the generic pallas/xla path exactly (the width blur is identity at
width 1)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from tendrils_tpu import EngineConfig, Tendrils
from tendrils_tpu.engine import draw_sim, step_sim
from tendrils_tpu.ops import spawn

import pytest

pytestmark = pytest.mark.kernel  # Pallas-kernel set (see pytest.ini)


def make_engine(fused, backend="pallas"):
    cfg = EngineConfig(root_num=16, view_res=(32, 128), flow_samples=2,
                       flow_rows=1, view_samples=2, splat_backend=backend,
                       fused_draw=fused)
    eng = Tendrils(cfg)
    eng.setup()
    eng.state["flowWidth"] = 1.0
    eng.state["lineWidth"] = 1.0
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
    return eng


def test_fused_matches_generic_paths():
    outs = {}
    for name, (fused, backend) in {
        "fused": (True, "pallas"),
        "generic_pallas": (False, "pallas"),
        "generic_xla": (False, "xla"),
    }.items():
        eng = make_engine(fused, backend)
        params = eng.params()
        sim = step_sim(eng.sim, params, jnp.float32(16.0), jnp.float32(16.0),
                       eng.config, eng._view_size)
        sim = draw_sim(sim, params, jnp.float32(16.0), eng.config,
                       eng._view_size)
        outs[name] = (np.asarray(sim.flow), np.asarray(sim.view))

    # The fused kernel quantises positions (1/32 px here) and values (15-bit
    # fixed point) to slim the sort; sub-pixel placement can hop a texel, so
    # compare after a 1-px smoothing which integrates the jitter out.
    def smooth(img):
        k = np.ones(3) / 3
        img = np.apply_along_axis(lambda v: np.convolve(v, k, "same"), -1,
                                  img)
        return np.apply_along_axis(lambda v: np.convolve(v, k, "same"), -2,
                                   img)

    for a, b in [("fused", "generic_pallas"), ("fused", "generic_xla")]:
        np.testing.assert_allclose(smooth(outs[a][0]), smooth(outs[b][0]),
                                   rtol=5e-2, atol=2e-2)
        np.testing.assert_allclose(smooth(outs[a][1]), smooth(outs[b][1]),
                                   rtol=5e-2, atol=2e-2)
    # Totals (deposit mass) match tightly.
    np.testing.assert_allclose(outs["fused"][0].sum(),
                               outs["generic_xla"][0].sum(), rtol=1e-3)


def test_fused_width_blur_spreads_flow():
    eng = make_engine(True)
    eng.state["flowWidth"] = 7.0
    eng.frame()
    wide = np.asarray(eng.sim.flow)[3]

    eng2 = make_engine(True)
    eng2.state["flowWidth"] = 1.0
    eng2.frame()
    narrow = np.asarray(eng2.sim.flow)[3]

    # Wider flow strokes touch more texels; total deposit is roughly
    # width-scaled.
    assert (wide > 1e-4).sum() > (narrow > 1e-4).sum()


def test_fused_line_width_widens_view():
    # lineWidth applies to the view pass in the fused path (ref
    # `src/index.js:336` sets gl.lineWidth(state.lineWidth); keyMash 'M').
    def view_alpha(width):
        eng = make_engine(True)
        eng.state["lineWidth"] = width
        eng.state["autoFade"] = False
        eng.frame()
        return np.asarray(eng.sim.view)[0, 3]

    narrow = view_alpha(1.0)
    wide = view_alpha(3.0)
    # Wider strokes cover more pixels and deposit ~width-scaled mass.
    assert (wide > 1e-4).sum() > 1.5 * (narrow > 1e-4).sum()
    assert 2.0 < wide.sum() / narrow.sum() < 4.5


def test_fused_line_width_spread_matches_generic_rows():
    # Fused (isotropic blur) vs generic (perpendicular rows) at lineWidth=3:
    # same deposited mass scaling and similar spatial spread (second moment),
    # not pixel-exact (documented deviation).
    import jax.numpy as jnp2

    def moments(img):
        ys, xs = np.mgrid[:img.shape[0], :img.shape[1]]
        m = img.sum()
        cy = (ys * img).sum() / m
        cx = (xs * img).sum() / m
        var = (((ys - cy) ** 2 + (xs - cx) ** 2) * img).sum() / m
        return m, var

    eng = make_engine(True)
    eng.state["lineWidth"] = 3.0
    eng.state["autoFade"] = False
    eng.frame()
    fused = np.asarray(eng.sim.view)[0, 3]

    cfg = EngineConfig(root_num=16, view_res=(32, 128), flow_samples=2,
                       flow_rows=1, view_samples=2, view_rows=3,
                       splat_backend="pallas", fused_draw=False)
    eng2 = Tendrils(cfg)
    eng2.setup()
    eng2.state["flowWidth"] = 1.0
    eng2.state["lineWidth"] = 3.0
    eng2.state["autoFade"] = False
    eng2.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
    eng2.frame()
    generic = np.asarray(eng2.sim.view)[0, 3]

    mf, vf = moments(fused)
    mg, vg = moments(generic)
    assert 0.5 < mf / mg < 2.0
    assert 0.5 < vf / vg < 2.0


def test_fused_engine_runs_multiframe():
    eng = make_engine(True)
    for _ in range(3):
        eng.frame()
    p = np.asarray(eng.sim.particles)
    assert np.isfinite(p).all()
    assert np.asarray(eng.sim.flow)[3].max() > 0
    assert np.asarray(eng.sim.view)[0, 3].max() > 0


def test_low_pscale_wide_grid():
    # Very wide grids force coarse position quantization (pscale 2-4);
    # packing must stay within 15-bit fields and deposits must land near
    # the right texels.
    from tendrils_tpu.ops.draw_pallas import (fused_draw_accumulate,
                                              _pos_scale, _pad_dims)
    h, w = 16, 8064
    hp, wp = _pad_dims(h, w)
    assert _pos_scale(hp, wp) <= 4
    p0 = jnp.asarray([[100.0, 8.0], [8000.0, 8.0]])
    p1 = p0 + jnp.asarray([[4.0, 0.0], [4.0, 0.0]])
    vel = jnp.asarray([[0.004, 0.004], [0.0, 0.0]])
    pos_ndc = jnp.zeros((2, 2))
    mapped = jnp.ones((4, 2)) * 0.5
    live = jnp.ones(2)
    flow_parts, view_parts = fused_draw_accumulate(
        (h, w), p0, p1, vel, pos_ndc, mapped, live, jnp.float32(0.01),
        jnp.float32(16.0), samples=2)
    wsum = np.asarray(flow_parts[1])
    ys, xs = np.nonzero(wsum > 1e-5)
    assert xs.size > 0
    # Deposits near both segments (within quantization + bilinear reach).
    assert np.abs(xs - 102).min() <= 4 or np.abs(xs - 8002).min() <= 4
    assert np.abs(xs - 8002).min() <= 4
    assert np.all(np.abs(ys - 8) <= 2)


def test_inert_particles_do_not_deposit():
    from tendrils_tpu.const import INERT
    eng = make_engine(True)
    # Kill half the particles.
    import dataclasses
    import jax.numpy as jnp2
    n = eng.config.n
    parts = eng.sim.particles
    dead = jnp2.concatenate([
        jnp2.full((2, n // 2), INERT), parts[:2, n // 2:]], axis=1)
    parts = jnp2.concatenate([dead, parts[2:]], axis=0)
    eng.sim = dataclasses.replace(eng.sim, particles=parts, previous=parts)
    eng.clear()
    eng.frame()
    wsum = np.asarray(eng.sim.flow[3])
    # Only the live half deposits; dead half (clamped to pad margin)
    # contributes nothing.
    assert wsum.sum() > 0
    live_deposit = wsum.sum()
    # Kill all -> zero deposits.
    allp = jnp2.concatenate([jnp2.full((2, n), INERT),
                             eng.sim.particles[2:]], axis=0)
    eng.sim = dataclasses.replace(eng.sim, particles=allp, previous=allp)
    eng.clear()
    eng.frame()
    assert np.asarray(eng.sim.flow[3]).sum() == 0
    assert live_deposit > 0


def test_gather_predecay_matches_exact_path():
    # Engine pallas gather (decay-then-interp) vs xla (interp-then-decay):
    # identical wherever the decay clamp is inactive; bounded everywhere.
    from tendrils_tpu.engine import step_sim
    outs = {}
    for backend in ["xla", "pallas"]:
        eng = make_engine(False, "xla")
        cfg = dataclasses.replace(eng.config, gather_backend=backend)
        eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.5, 0.01))
        # Paint fresh flow (stamps = now -> decay factor ~1, clamp inactive).
        eng.frame()
        sim = step_sim(eng.sim, eng.params(), jnp.float32(32.0),
                       jnp.float32(16.0), cfg, eng._view_size)
        outs[backend] = np.asarray(sim.particles)
    # Velocities are O(1e-4); the two evaluation orders agree to ~2e-5
    # absolute (fp + quantization), far below the force scale.
    np.testing.assert_allclose(outs["pallas"], outs["xla"], atol=5e-5)


def test_fused_odd_samples_mass_conserved():
    """view_samples=3 makes the splat block's segment count a non-multiple
    of the window size; every window must still be covered (ADVICE r2: a
    floored window count silently dropped ~25% of deposits)."""
    masses = {}
    for samples in (2, 3, 4):
        cfg = EngineConfig(root_num=16, view_res=(32, 128), flow_samples=2,
                           flow_rows=1, view_samples=samples,
                           splat_backend="pallas", gather_backend="pallas",
                           fused_draw=True)
        eng = Tendrils(cfg)
        eng.setup()
        eng.state["flowWidth"] = 1.0
        eng.state["lineWidth"] = 1.0
        eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
        eng.frame()
        masses[samples] = float(np.asarray(eng.sim.flow)[3].sum())
    # Deposited flow mass is sample-count independent (alpha scales 1/s).
    np.testing.assert_allclose(masses[3], masses[2], rtol=0.05)
    np.testing.assert_allclose(masses[3], masses[4], rtol=0.05)
