"""Fused Pallas resolve vs the XLA tail it replaces (interpret mode).

The resolve kernel fuses: pad slice, stamp reassembly, narrow-width scale,
`composite_over` of both passes, `autoClearView` + fade fill, and the
decayed-flow (`eff`) emission for the carried-force gather.
"""

import jax.numpy as jnp
import numpy as np

from tendrils_tpu.ops import render
from tendrils_tpu.ops.draw_pallas import (N_CHAN, _widen_excess,
                                          resolve_eligible, resolve_fused)
from tendrils_tpu.ops.splat import composite_over
from tendrils_tpu.ops.tile_geom import PAD_LO_H, PAD_LO_W, pad_dims

import pytest

pytestmark = pytest.mark.kernel  # Pallas-kernel set (see pytest.ini)


def _random_case(seed, h, w):
    rng = np.random.default_rng(seed)
    hp, wp = pad_dims(h, w)
    accum = np.zeros((N_CHAN, hp, wp), np.float32)
    # Plausible accumulator: numerators ~ value*alpha, alpha sums >= 0,
    # log-transmittances <= 0; sparse (most pixels untouched).
    touched = rng.uniform(0, 1, (hp, wp)) < 0.3
    alpha_f = rng.uniform(0, 3, (hp, wp)).astype(np.float32) * touched
    alpha_v = rng.uniform(0, 3, (hp, wp)).astype(np.float32) * touched
    accum[0] = rng.uniform(-1, 1, (hp, wp)) * alpha_f
    accum[1] = rng.uniform(-1, 1, (hp, wp)) * alpha_f
    accum[2] = rng.uniform(0, 1, (hp, wp)) * alpha_f
    accum[3] = alpha_f
    accum[4] = -rng.uniform(0, 2, (hp, wp)) * touched
    for c in range(4):
        accum[5 + c] = rng.uniform(0, 1, (hp, wp)) * alpha_v
    accum[9] = alpha_v
    accum[10] = -rng.uniform(0, 2, (hp, wp)) * touched
    flow = rng.uniform(-1, 1, (4, h, w)).astype(np.float32)
    view = rng.uniform(0, 1, (4, h, w)).astype(np.float32)
    return jnp.asarray(accum), jnp.asarray(flow), jnp.asarray(view)


def _xla_tail(accum, flow, view, fade_rgba, auto_clear, time, read_time,
              flow_decay, flow_width, line_width):
    h, w = flow.shape[1:]
    out = accum[:, PAD_LO_H:PAD_LO_H + h, PAD_LO_W:PAD_LO_W + w]
    stamp_num = time * out[3]
    fnum = jnp.concatenate([out[0:2], stamp_num[None], out[2:3]])
    flow_parts = (fnum, out[3], out[4])
    view_parts = (out[5:9], out[9], out[10])
    new_flow = composite_over(flow, *_widen_excess(flow_parts, flow_width))
    view0 = view * (1.0 - auto_clear)
    view0 = render.fade_fill(view0, fade_rgba)
    new_view = composite_over(view0, *_widen_excess(view_parts, line_width))
    eff = new_flow[:2] * jnp.maximum(
        0.0, 1.0 - (read_time - new_flow[2]) * flow_decay)[None]
    return new_flow, new_view, eff


def test_resolve_fused_matches_xla_tail():
    h, w = 64, 128
    assert resolve_eligible(h, w)
    accum, flow, view = _random_case(3, h, w)
    args = (jnp.asarray([0.1, 0.2, 0.0, 0.55], jnp.float32),  # fade rgba
            jnp.float32(0.0),  # autoClear
            jnp.float32(2.5),  # time
            jnp.float32(2.6),  # read_time
            jnp.float32(1.3),  # flowDecay
            jnp.float32(2.0),  # flowWidth (narrow: in-kernel identity)
            jnp.float32(1.0))  # lineWidth
    ref_f, ref_v, ref_e = _xla_tail(accum, flow, view, *args)
    out_f, out_v, out_e = resolve_fused(accum, flow, view, *args,
                                        want_eff=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_f),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref_v),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(ref_e),
                               atol=1e-5, rtol=1e-5)


def test_resolve_fused_autoclear_fade_no_eff():
    h, w = 32, 256
    assert resolve_eligible(h, w)
    accum, flow, view = _random_case(11, h, w)
    args = (jnp.asarray([0.3, 0.0, 0.1, 0.25], jnp.float32),
            jnp.float32(1.0),  # autoClearView on
            jnp.float32(7.0), jnp.float32(7.1), jnp.float32(0.4),
            jnp.float32(1.0), jnp.float32(3.0))
    ref_f, ref_v, _ = _xla_tail(accum, flow, view, *args)
    out_f, out_v = resolve_fused(accum, flow, view, *args,
                                 want_eff=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_f),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref_v),
                               atol=1e-5, rtol=1e-5)


def test_resolve_eligibility_gates():
    assert not resolve_eligible(64, 129)   # unaligned width
    assert not resolve_eligible(33, 128)   # rows not blockable
    assert resolve_eligible(1080, 1920)
    assert resolve_eligible(2160, 3840)
