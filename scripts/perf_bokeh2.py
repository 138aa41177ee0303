"""Bokeh stack rewrite candidates: conv (shifted-add) box blurs vs cumsum.

`timeout 550 python scripts/perf_bokeh2.py`
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tendrils_tpu.ops import post  # noqa: E402


def timeit(fn, *args, reps=6, warm=2):
    for _ in range(warm):
        out = fn(*args)
    out = jax.tree.leaves(out)[0]
    float(out.ravel()[0].astype(jnp.float32))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    out = jax.tree.leaves(out)[0]
    float(out.ravel()[0].astype(jnp.float32))
    return (time.time() - t0) / reps * 1000


def conv_axis(img, w, axis):
    """Weighted shifted-add conv along an axis, edge-replicated pad."""
    k = len(w)
    r = k // 2
    pad = [(0, 0)] * img.ndim
    pad[axis] = (r, r)
    p = jnp.pad(img, pad, mode="edge")
    n = img.shape[axis]
    out = None
    for i in range(k):
        idx = [slice(None)] * img.ndim
        idx[axis] = slice(i, i + n)
        t = p[tuple(idx)] * w[i]
        out = t if out is None else out + t
    return out


def tri_weights(rr):
    """Two boxes of half-width rr == one triangle of 4rr+1 taps."""
    box = np.full(2 * rr + 1, 1.0 / (2 * rr + 1))
    return tuple(np.convolve(box, box))


def main():
    h, w = 2160, 3840
    key = jax.random.PRNGKey(0)
    img6 = jax.random.uniform(key, (6, h, w), jnp.float32)

    for rr in (2, 3, 6):
        wts = tri_weights(rr)
        for axis, name in ((1, "H"), (2, "W")):
            f = jax.jit(lambda im, ax=axis, wt=wts: conv_axis(im, wt, ax))
            ms = timeit(f, img6)
            print(f"tri-conv rr={rr} ({len(wts)} taps) axis {name}: "
                  f"{ms:.2f} ms", flush=True)

    # Full 3-level stack via tri-convs at full res.
    def conv_stack(im):
        out = [im]
        cur = im
        prev = 0
        for r in (2, 6, 16):
            rr = max(1, (r - prev) // 2 + 1)
            wts = tri_weights(rr)
            cur = conv_axis(conv_axis(cur, wts, 1), wts, 2)
            out.append(cur)
            prev = r
        return jnp.stack(out)
    ms = timeit(jax.jit(conv_stack), img6)
    print(f"conv stack 6ch 4K full-res: {ms:.2f} ms", flush=True)

    # Decimated conv stack: level1 full, level2 at 1/2, level3 at 1/4,
    # manual bilinear upsample via repeat+shift (no jax.image.resize).
    def up2(im):
        # 2x nearest then half-texel average == bilinear for factor 2.
        r = jnp.repeat(jnp.repeat(im, 2, 1), 2, 2)
        r = (r + jnp.roll(r, -1, 1)) * 0.5
        return (r + jnp.roll(r, -1, 2)) * 0.5

    def dec_conv_stack(im):
        wts2 = tri_weights(2)
        l1 = conv_axis(conv_axis(im, wts2, 1), wts2, 2)
        d2 = im.reshape(6, h // 2, 2, w // 2, 2).mean((2, 4))
        l2 = conv_axis(conv_axis(d2, wts2, 1), wts2, 2)
        d4 = d2.reshape(6, h // 4, 2, w // 4, 2).mean((2, 4))
        wts3 = tri_weights(3)
        l3 = conv_axis(conv_axis(d4, wts3, 1), wts3, 2)
        return l1 + up2(l2) + up2(up2(l3))
    ms = timeit(jax.jit(dec_conv_stack), img6)
    print(f"decimated conv stack (1/1, 1/2, 1/4): {ms:.2f} ms", flush=True)

    # jax.image.resize upsample alone, 1/2 -> full.
    small = img6[:, ::2, ::2]
    f = jax.jit(lambda s: jax.image.resize(s, (6, h, w), "bilinear"))
    ms = timeit(f, small)
    print(f"jax.image.resize 1/2->full 6ch: {ms:.2f} ms", flush=True)
    f = jax.jit(up2)
    ms = timeit(f, small)
    print(f"manual up2 6ch: {ms:.2f} ms", flush=True)

    # Sanity: conv stack vs cumsum stack numerics.
    ref = jnp.stack(post.blur_stack(img6[:, :256, :256]))
    got = jax.jit(lambda im: conv_stack(im))(img6[:, :256, :256])
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"conv-vs-cumsum max abs err (256sq): {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
