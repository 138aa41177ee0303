"""Phase-level probe of fused_draw_accumulate on real engine data.

`timeout 550 python scripts/perf_fused.py` on TPU.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from tendrils_tpu import EngineConfig, Tendrils  # noqa: E402
from tendrils_tpu.engine import step_sim  # noqa: E402
from tendrils_tpu.ops import coords, draw_pallas as dp, sample, spawn  # noqa: E402
from tendrils_tpu import state as sm  # noqa: E402

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


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
    cfg = EngineConfig(root_num=1024, view_res=(1080, 1920),
                       splat_backend="pallas", gather_backend="pallas",
                       flow_samples=2, flow_rows=1, view_samples=2)
    eng = Tendrils(cfg)
    eng.setup()
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
    params = eng.params()
    vs = eng._view_size
    t, dt = jnp.float32(16.0), jnp.float32(16.0)
    sim = jax.jit(lambda s: step_sim(s, params, t, dt, cfg, vs))(eng.sim)

    h, w = cfg.view_res
    hp, wp = dp._pad_dims(h, w)
    tiles_x = wp // dp.TILE_W
    pscale = dp._pos_scale(hp, wp)
    samples = 2
    n = cfg.n
    seg_block = dp.BLOCK // samples
    m_pad = n * samples

    pos = sim.particles[:2]
    vel = sim.particles[2:]
    prev = sim.previous[:2]
    cmuv = sm.particle_coords_from_idx(sim.idx, cfg.root_num)[2]
    live = jnp.ones((n,))
    p_clip0 = jnp.stack([prev[0] * vs[0], prev[1] * vs[1]], -1)
    p_clip1 = jnp.stack([pos[0] * vs[0], pos[1] * vs[1]], -1)
    p0 = coords.clip_to_pixel(p_clip0, (w, h))
    p1 = coords.clip_to_pixel(p_clip1, (w, h))
    mapped = sample.sample_uv(sim.color_map, cmuv.T) \
        * params["colorMapAlpha"]

    scal = jnp.concatenate([
        jnp.stack([params["speedLimit"], t, params["flowWidth"],
                   params["lineWidth"], params["speedAlpha"],
                   jnp.sin(t * params["flowDecay"]), params["flowDecay"]]),
        params["baseColor"], params["flowColor"],
        jnp.zeros(1, jnp.float32)])[None]

    segspec = pl.BlockSpec((seg_block,), lambda b: (b,),
                           memory_space=pltpu.VMEM)
    smem_scal = pl.BlockSpec((1, 16), lambda b: (0, 0),
                             memory_space=pltpu.SMEM)
    i32 = jnp.int32

    def pack(scal, p0, p1, vel, pos, mapped, live):
        return pl.pallas_call(
            functools.partial(dp._pack_kernel, tiles_x=tiles_x,
                              pscale=pscale, h=h, w=w),
            grid=(n // seg_block,),
            in_specs=([smem_scal] + [segspec] * 13),
            out_specs=[segspec] * 5,
            out_shape=[jax.ShapeDtypeStruct((n,), i32)] * 5,
        )(scal, p0[:, 0], p0[:, 1], p1[:, 0], p1[:, 1], vel[0], vel[1],
          pos[0], pos[1], mapped[0], mapped[1], mapped[2], mapped[3], live)

    packf = jax.jit(pack)
    print(f"pack (colors in-kernel): "
          f"{timeit(packf, scal, p0, p1, vel, pos, mapped, live):.2f} ms",
          flush=True)
    keym, p0u, p1u, vlu, rgbau = packf(scal, p0, p1, vel, pos, mapped, live)

    sortf = jax.jit(lambda *ops: jax.lax.sort(list(ops), num_keys=1))
    print(f"segment sort 5x1M: "
          f"{timeit(sortf, keym, p0u, p1u, vlu, rgbau):.2f} ms", flush=True)
    keym_s, p0s, p1s, vls, rgbs = sortf(keym, p0u, p1u, vlu, rgbau)

    out_spec = pl.BlockSpec((dp.BLOCK,), lambda b: (b,),
                            memory_space=pltpu.VMEM)

    def expand(scal, p0u, p1u, vlu, rgbau):
        return pl.pallas_call(
            functools.partial(dp._expand_kernel, samples=samples,
                              tiles_x=tiles_x, pscale=pscale, h=h, w=w),
            grid=(n // seg_block,),
            in_specs=([smem_scal] + [segspec] * 4),
            out_specs=[out_spec] * 5,
            out_shape=[jax.ShapeDtypeStruct((m_pad,), d)
                       for d in (i32, i32, i32, i32, jnp.float32)],
        )(scal, p0u, p1u, vlu, rgbau)

    expandf = jax.jit(expand)
    print(f"expand: {timeit(expandf, scal, p0s, p1s, vls, rgbs):.2f} ms",
          flush=True)
    key, pos_u, vel_u, rgba_u, ascale = expandf(scal, p0s, p1s, vls, rgbs)

    blocked = pl.BlockSpec((dp.BLOCK,), lambda b: (b,),
                           memory_space=pltpu.VMEM)

    def splat(scal, key, pos_u, vel_u, rgba_u, ascale):
        accum0 = jnp.zeros((dp.N_CHAN, hp, wp), jnp.float32)
        return pl.pallas_call(
            functools.partial(dp._kernel, tiles_x=tiles_x, pscale=pscale),
            grid=(m_pad // dp.BLOCK,),
            in_specs=([smem_scal] + [blocked] * 5
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
        )(scal, key, pos_u, vel_u, rgba_u, ascale, accum0)

    splatf = jax.jit(splat)
    print(f"splat kernel (seg-keyed two-run): "
          f"{timeit(splatf, scal, key, pos_u, vel_u, rgba_u, ascale):.2f} ms",
          flush=True)

    # Fully-sorted baseline for comparison.
    key_s, pos_s2, vel_s2, rgba_s2, asc_s2 = jax.jit(
        lambda *o: jax.lax.sort(list(o), num_keys=1))(
        key, pos_u, vel_u, rgba_u, ascale)
    print(f"splat kernel (fully sample-sorted): "
          f"{timeit(splatf, scal, key_s, pos_s2, vel_s2, rgba_s2, asc_s2):.2f}"
          " ms", flush=True)

    # Visit statistics.
    import numpy as np
    kb = np.asarray(key).reshape(-1, dp.BLOCK)
    visits = sum(len(np.unique(b)) for b in kb)
    ks = np.asarray(key_s).reshape(-1, dp.BLOCK)
    visits_s = sum(len(np.unique(b)) for b in ks)
    print(f"tile visits: seg-keyed {visits}, sorted {visits_s}, "
          f"blocks {kb.shape[0]}", flush=True)

    # Window-gate pass counts (host sim of the range gates).
    def gate_count(karr):
        total = 0
        for b in karr:
            keys = np.unique(b)
            wins = b.reshape(dp.N_WIN, dp.WIN)
            lo = wins.min(1)
            hi = wins.max(1)
            for t_ in keys:
                total += int(((lo <= t_) & (hi >= t_)).sum())
        return total
    print(f"window-visits: seg-keyed {gate_count(kb)}, "
          f"sorted {gate_count(ks)}", flush=True)


if __name__ == "__main__":
    main()
