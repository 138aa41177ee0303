"""Establish the full-res pass floor at 4K: XLA vs Pallas vs bf16.

`timeout 550 python scripts/perf_bokeh3.py`
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, ".")


def timeit(fn, *args, reps=8, warm=2):
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
    img6 = jax.random.uniform(key, (6, h, w), jnp.float32)
    img6b = img6.astype(jnp.bfloat16)

    ms = timeit(jax.jit(lambda x: x * 2.0 + 1.0), img6)
    print(f"xla elementwise f32 6ch ({img6.nbytes/1e6:.0f}MB r+w): {ms:.2f} ms"
          f"  -> {2*img6.nbytes/ms/1e6:.0f} GB/s", flush=True)

    ms = timeit(jax.jit(lambda x: x * 2.0 + 1.0), img6b)
    print(f"xla elementwise bf16 6ch: {ms:.2f} ms"
          f"  -> {2*img6b.nbytes/ms/1e6:.0f} GB/s", flush=True)

    # 4-ch (the actual view size).
    view = img6[:4]
    ms = timeit(jax.jit(lambda x: x * 2.0 + 1.0), view)
    print(f"xla elementwise f32 4ch: {ms:.2f} ms", flush=True)

    # Pallas copy kernel, row-block grid.
    def _copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0 + 1.0

    @jax.jit
    def pallas_pass(x):
        c, hh, ww = x.shape
        bh = 216
        return pl.pallas_call(
            _copy_kernel,
            grid=(hh // bh,),
            in_specs=[pl.BlockSpec((c, bh, ww), lambda i: (0, i, 0))],
            out_specs=pl.BlockSpec((c, bh, ww), lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)

    ms = timeit(pallas_pass, img6)
    print(f"pallas elementwise f32 6ch: {ms:.2f} ms"
          f"  -> {2*img6.nbytes/ms/1e6:.0f} GB/s", flush=True)
    ms = timeit(pallas_pass, img6b)
    print(f"pallas elementwise bf16 6ch: {ms:.2f} ms", flush=True)

    # Pallas vertical 9-tap conv within a row-block (halo ignored: measures
    # the compute+stream cost shape only).
    def _conv_kernel(x_ref, o_ref):
        acc = x_ref[...] * 0.2
        for d in range(1, 5):
            acc += (pltpu_roll(x_ref[...], d) + pltpu_roll(x_ref[...], -d)) * 0.1
        o_ref[...] = acc

    def pltpu_roll(x, d):
        return jnp.roll(x, d, axis=1)

    @jax.jit
    def pallas_conv(x):
        c, hh, ww = x.shape
        bh = 216
        return pl.pallas_call(
            _conv_kernel,
            grid=(hh // bh,),
            in_specs=[pl.BlockSpec((c, bh, ww), lambda i: (0, i, 0))],
            out_specs=pl.BlockSpec((c, bh, ww), lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)

    ms = timeit(pallas_conv, img6)
    print(f"pallas 9-tap vert conv f32 6ch: {ms:.2f} ms", flush=True)

    # Fused prologue+downsample in one XLA jit: read view, produce the
    # 6ch half-res base (does the full-res wgt grid ever need materialising?)
    @jax.jit
    def fused_prologue_half(v):
        col = v[:3]
        col2 = col * col * 1.5
        c4 = col2 * col2
        c4 = c4 * c4
        wgt = c4 * c4 * col2 * 40.0 + 0.4
        six = jnp.concatenate([col2 * wgt, wgt])
        return six.reshape(6, h // 2, 2, w // 2, 2).mean((2, 4))
    ms = timeit(fused_prologue_half, view)
    print(f"fused prologue -> half-res 6ch: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
