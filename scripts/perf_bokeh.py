"""Decompose the config-5 bokeh tail at 4K on the TPU.

`timeout 550 python scripts/perf_bokeh.py`

The config-5 show frame spends ~50 ms outside `engine.frame` (battery G:
287.8 show vs 214.2 frame, minus the ~24 ms dispatch floor). The bokeh
pass is the suspect: a 3-level blur stack over 6 channels at 2160x3840,
each level two cumsum box blurs per axis. This probe times the pass and
its pieces to target the rewrite (decimated stack levels vs transposed
cumsum vs tap conv).
"""

import sys
import time

import jax
import jax.numpy as jnp

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


def main():
    h, w = 2160, 3840
    key = jax.random.PRNGKey(0)
    view = jax.random.uniform(key, (4, h, w), jnp.float32)
    img6 = jax.random.uniform(key, (6, h, w), jnp.float32)
    r = jnp.float32(3.0)
    a = jnp.float32(40.0)

    ms = timeit(lambda v: post.bokeh(v, r, a), view)
    print(f"bokeh full 4K: {ms:.2f} ms", flush=True)

    stack = jax.jit(lambda im: jnp.stack(post.blur_stack(im)))
    ms = timeit(stack, img6)
    print(f"blur_stack 6ch 4K (3 levels): {ms:.2f} ms", flush=True)

    for axis, name in ((1, "H (major)"), (2, "W (minor)")):
        f = jax.jit(lambda im, ax=axis: post._box_blur_axis(im, 6, ax))
        ms = timeit(f, img6)
        print(f"box_blur r=6 axis {name}: {ms:.2f} ms", flush=True)

    # Transposed W blur: transpose, blur along the new major axis, untranspose.
    def tblur(im):
        t = jnp.swapaxes(im, 1, 2)
        t = post._box_blur_axis(t, 6, 1)
        return jnp.swapaxes(t, 1, 2)
    ms = timeit(jax.jit(tblur), img6)
    print(f"box_blur r=6 W via transpose: {ms:.2f} ms", flush=True)

    # Decimated stack prototype: level1 full res, level2 at 1/2, level3 at
    # 1/4 (downsample by mean-pool, then the residual blurs at scale).
    def dec_stack(im):
        l1 = post.box_blur(post.box_blur(im, 2), 2)
        d2 = im.reshape(6, h // 2, 2, w // 2, 2).mean((2, 4))
        l2 = post.box_blur(post.box_blur(d2, 2), 2)
        d4 = d2.reshape(6, h // 4, 2, w // 4, 2).mean((2, 4))
        l3 = post.box_blur(post.box_blur(d4, 3), 3)
        up2 = jax.image.resize(l2, (6, h, w), "bilinear")
        up4 = jax.image.resize(l3, (6, h, w), "bilinear")
        return im + l1 + up2 + up4
    ms = timeit(jax.jit(dec_stack), img6)
    print(f"decimated stack 6ch 4K (1/1, 1/2, 1/4 + upsample): {ms:.2f} ms",
          flush=True)

    # The weight/elementwise prologue alone.
    def prologue(v):
        col = v[:3]
        col2 = col * col * 1.5
        c4 = col2 * col2
        c4 = c4 * c4
        wgt = c4 * c4 * col2 * a + 0.4
        return jnp.concatenate([col2 * wgt, wgt])
    ms = timeit(jax.jit(prologue), view)
    print(f"wgt prologue: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
