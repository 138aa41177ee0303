"""Component breakdown of merge_reorder at production scale: compact /
histograms+C-sort / prep / apply, timed cumulatively on TPU (host-timed
with readback; consume every output against DCE).

Run: timeout 1500 python scripts/perf_reorder_parts.py [root=4096]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from tendrils_tpu.ops import reorder_pallas as ro  # noqa: E402
from perf_reorder import IDX_BITS, step, tile_of  # noqa: E402

LANES = ro.LANES


def main():
    root = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = root * root
    tiles_x = 17
    n_tiles = tiles_x * 136
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.random(n), jnp.float32)
    py = jnp.asarray(rng.random(n), jnp.float32)
    ids = jnp.arange(n, dtype=jnp.int32)
    low = ids & ((1 << IDX_BITS) - 1)

    def keys_of(px, py, low):
        return (tile_of(px, py, tiles_x) << IDX_BITS) | low

    k0 = keys_of(px, py, low)
    _, px, py, low = jax.lax.sort(
        [k0, jax.lax.bitcast_convert_type(px, jnp.int32),
         jax.lax.bitcast_convert_type(py, jnp.int32), low], num_keys=1)
    px = jax.lax.bitcast_convert_type(px, jnp.float32)
    py = jax.lax.bitcast_convert_type(py, jnp.float32)
    prev_key = keys_of(px, py, low)
    t32 = -(-n_tiles // 32) * 32
    hist = jax.jit(lambda k: ro.hist_outer(
        jax.lax.shift_right_logical(k, IDX_BITS), t32)[:n_tiles])(prev_key)
    npx, npy = step(px, py, jnp.float32(0.3))
    key = keys_of(npx, npy, low)
    pays = [jax.lax.bitcast_convert_type(npx, jnp.int32),
            jax.lax.bitcast_convert_type(npy, jnp.int32), low,
            jax.lax.bitcast_convert_type(npx, jnp.int32) ^ low]

    t_pad = -(-(n_tiles + 1) // LANES) * LANES
    k_cap = n // 8
    k_rag_rows = max(k_cap // LANES + n // ro.SB + ro.SB // LANES,
                     ro.CWIN // LANES)
    tblw = min(t_pad, max(ro.TBLW, 2 * (ro.WIN * n_tiles // n) + 16,
                          2 * (ro.CWIN * n_tiles // max(k_cap, 1)) + 16))

    def upto_compact(key, prev_key, pays, prev_hist):
        key2 = key.reshape(-1, LANES)
        prev2 = prev_key.reshape(-1, LANES)
        pays2 = [p.reshape(-1, LANES) for p in pays]
        ck2, cprev2, cpays2, k_total, okl = ro._compact(
            key2, prev2, pays2, k_rag_rows, False)
        return ck2, cprev2, cpays2, k_total

    def upto_sort(key, prev_key, pays, prev_hist):
        ck2, cprev2, cpays2, k_total = upto_compact(key, prev_key, pays,
                                                    prev_hist)
        ckf = ck2.reshape(-1)
        cvalid = ckf != ro.MAXKEY
        tiles_new = jnp.where(
            cvalid, jax.lax.shift_right_logical(ckf, IDX_BITS), t_pad)
        tiles_old = jnp.where(
            cvalid,
            jax.lax.shift_right_logical(cprev2.reshape(-1), IDX_BITS),
            t_pad)
        hist_c = ro.hist_outer(tiles_new, t_pad)
        hist_cout = ro.hist_outer(tiles_old, t_pad)
        prev_hist_p = jnp.zeros(t_pad, jnp.int32).at[:n_tiles].set(
            prev_hist)
        hist_u = prev_hist_p - hist_cout[:t_pad]
        sorted_c = jax.lax.sort(
            [ckf] + [p.reshape(-1) for p in cpays2], num_keys=1,
            is_stable=False)
        return (sorted_c, hist_u, hist_c[:t_pad], k_total)

    def upto_prep(key, prev_key, pays, prev_hist):
        sorted_c, hist_u, hist_c, k_total = upto_sort(key, prev_key, pays,
                                                      prev_hist)
        ck_s = sorted_c[0].reshape(k_rag_rows, LANES)
        csum_u_incl = jnp.cumsum(hist_u)
        csum_c_excl = jnp.cumsum(hist_c) - hist_c
        scal = ro._apply_prep(key, key.reshape(-1, LANES),
                              prev_key.reshape(-1, LANES), ck_s, k_total,
                              hist_u, hist_c, csum_u_incl, csum_c_excl,
                              n_tiles, IDX_BITS, t_pad, tblw, k_rag_rows)
        return scal, sorted_c

    def full(key, prev_key, pays, prev_hist):
        return ro.merge_reorder(key, prev_key, pays, prev_hist,
                                n_tiles=n_tiles, idx_bits=IDX_BITS)

    variants = [("compact", upto_compact), ("(+)hist+csort", upto_sort),
                ("(+)prep", upto_prep), ("full merge", full)]
    for name, fn in variants:
        def scalarised(key, prev_key, pays, prev_hist, fn=fn):
            out = fn(key, prev_key, pays, prev_hist)
            # ONE readback scalar consuming every output (the tunnel
            # costs ~24 ms per host read — per-leaf reads swamp compute).
            acc = jnp.float32(0)
            for lf in jax.tree_util.tree_leaves(out):
                lf = jnp.asarray(lf)
                acc = acc + lf.ravel()[:: max(1, lf.size // 7)].astype(
                    jnp.float32).sum()
            return acc
        jf = jax.jit(scalarised)
        float(jf(key, prev_key, pays, hist))
        t0 = time.time()
        reps = 4
        for _ in range(reps):
            float(jf(key, prev_key, pays, hist))
        ms = (time.time() - t0) / reps * 1000
        print(f"{name:14s}: {ms:8.2f} ms")


if __name__ == "__main__":
    main()
