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


def test_fused_engine_runs_multiframe():
    eng = make_engine(True)
    for _ in range(3):
        eng.frame()
    p = np.asarray(eng.sim.particles)
    assert np.isfinite(p).all()
    assert np.asarray(eng.sim.flow)[3].max() > 0
    assert np.asarray(eng.sim.view)[0, 3].max() > 0
