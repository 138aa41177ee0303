"""Probe 2: isolate splat-kernel cost sorted vs clustered; int32 vs f32 sort.

`timeout 550 python scripts/perf_sorts2.py` on TPU.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def timeit(fn, *args, reps=10, warm=2):
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
    key = jax.random.PRNGKey(0)
    n = 1 << 20
    m = 2 * n

    # Honest operand-count scaling (all outputs consumed).
    for ops_n, rows in [(2, n), (3, n), (4, n), (5, n), (6, n), (10, n),
                        (5, m), (6, m)]:
        kk = jax.random.randint(key, (rows,), 0, 550, jnp.int32)
        vv = [jax.random.randint(key, (rows,), 0, 2 ** 30, jnp.int32)
              for _ in range(ops_n - 1)]
        f_i = jax.jit(lambda k, *v: jax.lax.sort([k, *v], num_keys=1))
        print(f"sort {ops_n} int32 x {rows / 1e6:.0f}M: "
              f"{timeit(f_i, kk, *vv):.2f} ms", flush=True)

    # Block-local sort: [blocks, 4096] rows sorted along the last axis.
    kk = jax.random.randint(key, (m,), 0, 550, jnp.int32).reshape(-1, 4096)
    vv = [jax.random.randint(key, (m,), 0, 2 ** 30,
                             jnp.int32).reshape(-1, 4096)
          for _ in range(4)]
    f_b = jax.jit(lambda k, *v: jax.lax.sort([k, *v], num_keys=1,
                                             dimension=1))
    print(f"block-local sort 5 int32 x 2M (4096 blocks): "
          f"{timeit(f_b, kk, *vv):.2f} ms", flush=True)

    # Splat kernel cost, sorted vs two-run clustered, same key content.
    from tendrils_tpu.ops import draw_pallas as dp
    from tendrils_tpu.ops.tile_geom import pad_dims
    h, w = 1080, 1920
    hp, wp = pad_dims(h, w)
    tiles_x = wp // dp.TILE_W
    pscale = dp._pos_scale(hp, wp)

    # Synthetic sorted samples: uniform over content tiles.
    xs = jax.random.uniform(key, (m,), minval=260.0, maxval=2150.0)
    ys = jax.random.uniform(key, (m,), minval=20.0, maxval=1090.0)
    keys = ((ys - 0.5).astype(jnp.int32) // dp.TILE_H * tiles_x
            + (xs - 0.5).astype(jnp.int32) // dp.TILE_W)
    pos = (jnp.round(ys * pscale).astype(jnp.int32) * (dp.HALF + 1)
           + jnp.round(xs * pscale).astype(jnp.int32))
    vel = (jax.random.randint(key, (m,), 0, dp.HALF) * (dp.HALF + 1)
           + jax.random.randint(key, (m,), 0, dp.HALF))
    rgba = jax.random.randint(key, (m,), 0, 2 ** 31 - 1, jnp.int32)
    asc = jax.random.uniform(key, (m,), minval=0.2, maxval=1.0)

    k_s, pos_s, vel_s, rgba_s, asc_s = jax.lax.sort(
        [keys, pos, vel, rgba, asc], num_keys=1)

    # Expand-from-sorted-segments layout: take 1M sorted "segments" (the
    # even rows of the sorted sample stream) and emit each block as
    # [2048 segs s=0 | same 2048 segs s=1] — two sorted runs over the SAME
    # key range per block, which is what expand-after-segment-sort produces.
    def tworun(v):
        a = v[0::2].reshape(-1, 2048)
        return jnp.concatenate([a, a], axis=1).reshape(-1)

    k_c = tworun(k_s)
    pos_c, vel_c, rgba_c, asc_c = map(tworun, (pos_s, vel_s, rgba_s, asc_s))

    scal = jnp.stack([jnp.float32(0.01), jnp.float32(16.0),
                      jnp.float32(1.0), jnp.float32(1.0)])[None]

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def run_kernel(scal, key, pos, vel, rgba, ascale):
        accum0 = jnp.zeros((dp.N_CHAN, hp, wp), jnp.float32)
        blocked = pl.BlockSpec((dp.BLOCK,), lambda b: (b,),
                               memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(dp._kernel, tiles_x=tiles_x, pscale=pscale),
            grid=(m // dp.BLOCK,),
            in_specs=([pl.BlockSpec((1, 4), lambda b: (0, 0),
                                    memory_space=pltpu.SMEM)]
                      + [blocked] * 5
                      + [pl.BlockSpec(memory_space=pl.ANY)]),
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((dp.N_CHAN, hp, wp), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((dp.N_CHAN, dp.REGION_H, dp.REGION_W),
                           jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            input_output_aliases={6: 0},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(scal, key, pos, vel, rgba, ascale, accum0)

    f_k = jax.jit(run_kernel)
    print(f"splat kernel sorted 2M: "
          f"{timeit(f_k, scal, k_s, pos_s, vel_s, rgba_s, asc_s):.2f} ms",
          flush=True)
    print(f"splat kernel two-run 2M: "
          f"{timeit(f_k, scal, k_c, pos_c, vel_c, rgba_c, asc_c):.2f} ms",
          flush=True)

    # Ball-like clustered (spatially concentrated input, sorted).
    r = jnp.sqrt(jax.random.uniform(key, (m,))) * 0.4
    th = jax.random.uniform(key, (m,), maxval=6.2832)
    xb = 1210.0 + r * 900.0 * jnp.cos(th)
    yb = 556.0 + r * 540.0 * jnp.sin(th)
    kb = ((yb - 0.5).astype(jnp.int32) // dp.TILE_H * tiles_x
          + (xb - 0.5).astype(jnp.int32) // dp.TILE_W)
    pb = (jnp.round(yb * pscale).astype(jnp.int32) * (dp.HALF + 1)
          + jnp.round(xb * pscale).astype(jnp.int32))
    kb_s, pb_s, vel_b, rgba_b, asc_b = jax.lax.sort(
        [kb, pb, vel, rgba, asc], num_keys=1)
    print(f"splat kernel ball-sorted 2M: "
          f"{timeit(f_k, scal, kb_s, pb_s, vel_b, rgba_b, asc_b):.2f} ms",
          flush=True)
    kb_c = tworun(kb_s)
    pb_c, velb_c, rgbab_c, ascb_c = map(tworun, (pb_s, vel_b, rgba_b,
                                                 asc_b))
    print(f"splat kernel ball-two-run 2M: "
          f"{timeit(f_k, scal, kb_c, pb_c, velb_c, rgbab_c, ascb_c):.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
