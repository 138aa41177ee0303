"""Scan-timed (in-jit) bokeh component costs — dispatch floor excluded.

`timeout 550 python scripts/perf_bokeh4.py`

Each candidate runs ITERS times inside one lax.scan in one jit; the
reported ms is (total - empty-scan control) / ITERS.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tendrils_tpu.ops import post  # noqa: E402

H, W = 2160, 3840
ITERS = 10


def scan_time(label, f, x, iters=ITERS, reps=3):
    """f: img -> img (same shape/dtype); carried through a scan."""
    @jax.jit
    def run(x0):
        def body(c, _):
            return f(c), ()
        out, _ = jax.lax.scan(body, x0, None, length=iters)
        return out
    run(x)  # compile
    float(run(x).ravel()[0].astype(jnp.float32))
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        float(run(x).ravel()[0].astype(jnp.float32))
        best = min(best, time.time() - t0)
    ms = best * 1000 / iters
    print(f"{label}: {ms:.2f} ms/iter", flush=True)
    return ms


def conv_axis(img, w, axis):
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
    box = np.full(2 * rr + 1, 1.0 / (2 * rr + 1))
    return tuple(np.convolve(box, box))


def main():
    key = jax.random.PRNGKey(0)
    img6 = jax.random.uniform(key, (6, H, W), jnp.float32)
    view = jax.random.uniform(key, (4, H, W), jnp.float32)

    # Control: near-empty body (carries the array through one add).
    base = scan_time("control (x+1)", lambda x: x + 1.0, img6)

    scan_time("elementwise chain x5", lambda x: ((x * 1.1 + 0.1) * 0.9
                                                 + 0.01) * 1.01 + 0.1, img6)

    scan_time("cumsum box r=6 H", lambda x: post._box_blur_axis(x, 6, 1),
              img6)
    scan_time("cumsum box r=6 W", lambda x: post._box_blur_axis(x, 6, 2),
              img6)
    scan_time("tri-conv rr=2 H", lambda x: conv_axis(x, tri_weights(2), 1),
              img6)
    scan_time("tri-conv rr=2 W", lambda x: conv_axis(x, tri_weights(2), 2),
              img6)
    scan_time("tri-conv rr=6 H", lambda x: conv_axis(x, tri_weights(6), 1),
              img6)
    scan_time("tri-conv rr=6 W", lambda x: conv_axis(x, tri_weights(6), 2),
              img6)

    def cur_stack(x):
        return sum(post.blur_stack(x))
    scan_time("CURRENT cumsum stack (3 lvls)", cur_stack, img6)

    def conv_stack(x):
        out = x
        cur = x
        prev = 0
        for r in (2, 6, 16):
            rr = max(1, (r - prev) // 2 + 1)
            wts = tri_weights(rr)
            cur = conv_axis(conv_axis(cur, wts, 1), wts, 2)
            out = out + cur
            prev = r
        return out
    scan_time("conv stack full-res", conv_stack, img6)

    def up2(im, hh, ww):
        r = jnp.repeat(jnp.repeat(im, 2, 1), 2, 2)
        r = (r + jnp.roll(r, -1, 1)) * 0.5
        return (r + jnp.roll(r, -1, 2)) * 0.5

    def dec_conv_stack(x):
        wts2 = tri_weights(2)
        l1 = conv_axis(conv_axis(x, wts2, 1), wts2, 2)
        d2 = x.reshape(6, H // 2, 2, W // 2, 2).mean((2, 4))
        l2 = conv_axis(conv_axis(d2, wts2, 1), wts2, 2)
        d4 = d2.reshape(6, H // 4, 2, W // 4, 2).mean((2, 4))
        wts3 = tri_weights(3)
        l3 = conv_axis(conv_axis(d4, wts3, 1), wts3, 2)
        return l1 + up2(l2, H, W) + up2(up2(l3, H // 2, W // 2), H, W)
    scan_time("decimated conv stack", dec_conv_stack, img6)

    def full_bokeh(v):
        out = post.bokeh(v, jnp.float32(3.0), jnp.float32(40.0))
        return out
    scan_time("CURRENT bokeh full", full_bokeh, view)


if __name__ == "__main__":
    main()
