"""Merge reorder vs flat lax.sort on TPU (north-star sort attack).

Self-contained resident-stream model at production geometry: particles
drift in a swirl field over a 4K-ish tile grid; the stream is kept in
tile-sorted order frame to frame (resident invariant), keys follow the
production shape `tile << PACK_IDX_BITS | id-low-bits`. Per frame both
variants restore sortedness of (key + 4 payload words):

    flat : jax.lax.sort, 5 int32 operands   (the production resident sort)
    merge: ops.reorder_pallas.merge_reorder (compact + k-sort + apply)

Reports per-frame ms for each (host-timed with readback — the axon
tunnel ignores block_until_ready), measured churn, and the merge path's
ok-rate (fallback frequency must be 0 in steady state).

Run: timeout 1200 python scripts/perf_reorder.py [root]
CPU check: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/perf_reorder.py 512
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tendrils_tpu.ops.reorder_pallas import (  # noqa: E402
    hist_outer, merge_reorder)

IDX_BITS = 13
FRAMES = 12


def tile_of(px, py, tiles_x):
    tx = jnp.clip((px * tiles_x).astype(jnp.int32), 0, tiles_x - 1)
    ty = jnp.clip((py * 136.0).astype(jnp.int32), 0, 135)
    return ty * tiles_x + tx


def step(px, py, t):
    # Swirl + drift, tuned for ~5-8 %/frame tile churn at 4K geometry.
    cx = px - 0.5
    cy = py - 0.5
    vx = -cy * 0.9 + jnp.sin(py * 9.0 + t) * 0.25
    vy = cx * 0.9 + jnp.cos(px * 7.0 - t) * 0.25
    dt = 0.0021
    return ((px + vx * dt) % 1.0, (py + vy * dt) % 1.0)


def main():
    root = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = root * root
    tiles_x = 17
    n_tiles = tiles_x * 136  # 2312: 4K-view production scale
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.random(n), jnp.float32)
    py = jnp.asarray(rng.random(n), jnp.float32)
    ids = jnp.arange(n, dtype=jnp.int32)
    low = ids & ((1 << IDX_BITS) - 1)

    def keys_of(px, py, low):
        return (tile_of(px, py, tiles_x) << IDX_BITS) | low

    # Settle into sorted order first (resident invariant).
    k0 = keys_of(px, py, low)
    _, px, py, low = jax.lax.sort(
        [k0, jax.lax.bitcast_convert_type(px, jnp.int32),
         jax.lax.bitcast_convert_type(py, jnp.int32), low], num_keys=1)
    px = jax.lax.bitcast_convert_type(px, jnp.float32)
    py = jax.lax.bitcast_convert_type(py, jnp.float32)

    @jax.jit
    def frame_flat(px, py, low, prev_key, t):
        px, py = step(px, py, t)
        key = keys_of(px, py, low)
        pxi = jax.lax.bitcast_convert_type(px, jnp.int32)
        pyi = jax.lax.bitcast_convert_type(py, jnp.int32)
        aux = pxi ^ pyi  # stand-in 4th payload (vlu/rgba class)
        key_s, pxs, pys, lows, auxs = jax.lax.sort(
            [key, pxi, pyi, low, aux], num_keys=1)
        return (jax.lax.bitcast_convert_type(pxs, jnp.float32),
                jax.lax.bitcast_convert_type(pys, jnp.float32),
                lows, key_s, auxs[0])

    @jax.jit
    def frame_merge(px, py, low, prev_key, hist, t):
        px, py = step(px, py, t)
        key = keys_of(px, py, low)
        pxi = jax.lax.bitcast_convert_type(px, jnp.int32)
        pyi = jax.lax.bitcast_convert_type(py, jnp.int32)
        aux = pxi ^ pyi
        ok, key_s, (pxs, pys, lows, auxs), new_hist = merge_reorder(
            key, prev_key, [pxi, pyi, low, aux], hist,
            n_tiles=n_tiles, idx_bits=IDX_BITS, interpret=None)

        def fallback(_):
            ks, a, b, c, d = jax.lax.sort([key, pxi, pyi, low, aux],
                                          num_keys=1)
            t_pad = -(-n_tiles // 32) * 32
            h = hist_outer(jax.lax.shift_right_logical(ks, IDX_BITS),
                           t_pad)[:n_tiles]
            return ks, a, b, c, d, h

        key_s, pxs, pys, lows, auxs, new_hist = jax.lax.cond(
            ok, lambda _: (key_s, pxs, pys, lows, auxs, new_hist),
            fallback, None)
        return (jax.lax.bitcast_convert_type(pxs, jnp.float32),
                jax.lax.bitcast_convert_type(pys, jnp.float32),
                lows, key_s, new_hist, ok, auxs[0])

    # churn measurement + initial hist
    key = keys_of(px, py, low)
    t_pad = -(-n_tiles // 32) * 32
    hist = jax.jit(lambda k: hist_outer(
        jax.lax.shift_right_logical(k, IDX_BITS), t_pad)[:n_tiles])(key)

    for name in ("flat", "merge"):
        pxv, pyv, lowv = px, py, low
        prev = keys_of(pxv, pyv, lowv)
        h = hist
        oks = []
        t0 = None
        for f in range(FRAMES):
            tt = jnp.float32(0.1 * f)
            if name == "flat":
                pxv, pyv, lowv, prev, sink = frame_flat(pxv, pyv, lowv,
                                                        prev, tt)
            else:
                pxv, pyv, lowv, prev, h, okf, sink = frame_merge(
                    pxv, pyv, lowv, prev, h, tt)
                oks.append(bool(okf))
            float(jnp.asarray(sink).ravel()[0])  # host readback barrier
            if f == 1:
                t0 = time.time()  # warm: compiles + first churn settled
        ms = (time.time() - t0) / (FRAMES - 2) * 1000
        extra = ""
        if name == "merge":
            extra = f"  ok-rate {sum(oks[2:])}/{len(oks[2:])}"
        print(f"{name:6s} {root}^2 ({n} rows): {ms:8.2f} ms/frame{extra}")

    # churn figure (host)
    pxn, pyn = step(px, py, jnp.float32(0.5))
    churn = float(jnp.mean((keys_of(pxn, pyn, low) != key)
                           .astype(jnp.float32)))
    print(f"churn/frame: {churn:.3f}")


if __name__ == "__main__":
    main()
