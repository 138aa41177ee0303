"""Measured acceptance of the segment splat against the exact GL_LINES
rasteriser (tests/gl_line_oracle.py — the reference's draw primitive,
`src/index.js:300-303,335-337`, with its SRC_ALPHA/ONE_MINUS_SRC_ALPHA
blending).

Pins the deposit parity the TPU splat achieves, and the residual deviations:

  - deposit mass scales with the MAJOR-AXIS extent like the GL DDA (the
    euclidean-length scaling used before over-deposited diagonals by √2);
  - the bilinear point-sample footprint spreads coverage over fractional
    pixels, inflating the concave `1-∏(1-a)` coverage sum by ~5-14% for
    long lines (angle-independent; documented, asserted bounded);
  - sub-pixel placement differs from the hard pen (spatial correlation
    pinned, not exactness).
"""

import numpy as np

import jax.numpy as jnp

from tendrils_tpu.ops import splat
from gl_line_oracle import gl_lines_exact

H = W = 64


def ours_coverage(p0, p1, alpha, width, samples=4, rows=1):
    vals = jnp.ones((1, p0.shape[0]), jnp.float32)
    _, _, logt = splat.splat_segments_accumulate(
        jnp.asarray(p0), jnp.asarray(p1), vals, jnp.asarray(alpha),
        grid_hw=(H, W), width=float(width), samples=samples, rows=rows)
    return 1.0 - np.exp(np.asarray(logt))


def gl_coverage(p0, p1, alpha, width):
    dst = np.zeros((1, H, W), np.float32)
    _, cov = gl_lines_exact(dst, p0, p1,
                            np.ones((1, len(alpha)), np.float32),
                            np.asarray(alpha, np.float32), width)
    return cov


def test_long_line_mass_angle_independent():
    """GL's major-axis pen makes mass ∝ major extent; the splat matches, so
    the ours/GL mass ratio is flat in angle (within the bilinear-spread
    inflation band ~1.0-1.15) — before the major-extent fix the 45° ratio
    was 1.58."""
    ratios = []
    for deg in (0, 15, 30, 45, 60, 75, 90):
        th = np.radians(deg)
        c = np.array([[32.0, 32.0]], np.float32)
        d = np.array([[np.cos(th), np.sin(th)]], np.float32) * 10
        a = np.array([0.3], np.float32)
        mo = ours_coverage(c - d, c + d, a, 1, samples=16).sum()
        mg = gl_coverage(c - d, c + d, a, 1).sum()
        ratios.append(mo / mg)
    ratios = np.asarray(ratios)
    assert ratios.max() < 1.2, ratios
    assert ratios.min() > 0.95, ratios
    assert ratios.max() / ratios.min() < 1.12, \
        f"angle-dependent deposit mass: {ratios}"


def test_short_segment_batch_mass_matches_gl():
    """200 random sub-4px segments (the per-frame regime) at production
    sample counts: total coverage mass within 5% of the GL rasteriser,
    spatial correlation of the coverage maps > 0.8."""
    rng = np.random.RandomState(0)
    n = 200
    p0 = rng.uniform(10, 54, (n, 2)).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi, n)
    ln = rng.uniform(0.2, 4.0, n)
    p1 = (p0 + np.stack([np.cos(ang), np.sin(ang)], -1)
          * ln[:, None]).astype(np.float32)
    a = rng.uniform(0.05, 0.5, n).astype(np.float32)
    mo = ours_coverage(p0, p1, a, 1, samples=4)
    mg = gl_coverage(p0, p1, a, 1)
    assert abs(mo.sum() / mg.sum() - 1.0) < 0.05
    assert np.corrcoef(mo.ravel(), mg.ravel())[0, 1] > 0.8


def test_wide_line_cross_section_matches_pen():
    """Width-3 horizontal line at production flow params (samples=4,
    rows=3): the coverage cross-section occupies the same 3 rows as the GL
    pen, with per-pixel alpha within 10%."""
    p0 = np.array([[12.0, 32.5]], np.float32)
    p1 = np.array([[52.0, 32.5]], np.float32)
    a = np.array([0.3], np.float32)
    co = ours_coverage(p0, p1, a, 3, samples=16, rows=3)
    cg = gl_coverage(p0, p1, a, 3)
    col_o = co[:, 32]
    col_g = cg[:, 32]
    assert (col_o > 0.05).sum() == 3
    assert (col_g > 0.05).sum() == 3
    np.testing.assert_allclose(col_o[31:34], col_g[31:34], rtol=0.1)


def test_gl_oracle_sanity():
    """The oracle itself: a horizontal width-1 line lights exactly one row,
    one fragment per column, src-alpha composited."""
    p0 = np.array([[10.0, 20.5]], np.float32)
    p1 = np.array([[20.0, 20.5]], np.float32)
    cov = gl_coverage(p0, p1, np.array([0.4], np.float32), 1)
    assert cov[20, 10:20].tolist() == [np.float32(0.4)] * 10
    assert cov.sum() == np.float32(0.4) * 10
