"""Localise the merge-reorder TPU ok=0 failure: run one merge frame with
debug outputs and compare the device-computed `scal` prep table (window
offsets, exact bases, rank-table slices) against an exact numpy oracle.

If scal matches but per-block counts are wrong -> in-kernel bug; if scal
differs -> the XLA prep (matmul operand precision) is the culprit, and
the diffing column names it.

Run: timeout 1200 python scripts/dbg_reorder.py [root=1024]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from tendrils_tpu.ops import reorder_pallas as ro  # noqa: E402
from perf_reorder import IDX_BITS, step, tile_of  # noqa: E402

LANES = ro.LANES


def np_prep(key, prev_key, ck_sorted_vals, k_total, csum_u_incl,
            csum_c_excl, n_tiles, t_pad, tblw, k_rag_rows):
    """Exact numpy replica of _apply_prep (exact row anchors)."""
    n = key.shape[0]
    nrows = n // LANES
    nb_d = n // ro.DB
    winr = ro.WIN // LANES
    cwinr = ro.CWIN // LANES

    mask_u = (key == prev_key).reshape(nrows, LANES)
    u_chunk = mask_u.sum(1).astype(np.int64)
    u128c = np.cumsum(u_chunk) - u_chunk
    targets = np.arange(nb_d, dtype=np.int64) * ro.DB

    tile2 = (key >> IDX_BITS).reshape(nrows, LANES)
    tfu = np.min(np.where(mask_u, tile2, t_pad), axis=1)
    tfu = np.minimum.accumulate(tfu[::-1])[::-1]
    tfu_cl = np.minimum(tfu, t_pad - 1)
    rank_row = u128c + csum_c_excl[tfu_cl]
    first_ge = (rank_row[None, :] < targets[:, None]).sum(1)
    s0 = np.clip(first_ge - 3, 0, nrows - winr)
    u_base = u128c[s0]
    t0 = np.clip(tfu_cl[s0] - 4, 0, t_pad - tblw)

    ck0 = ck_sorted_vals.reshape(k_rag_rows, LANES)[:, 0]
    ctile_row = np.where(ck0 == ro.MAXKEY, t_pad - 1, ck0 >> IDX_BITS)
    crank_row = (csum_u_incl[ctile_row]
                 + np.arange(k_rag_rows, dtype=np.int64) * LANES)
    first_ge_c = (crank_row[None, :] < targets[:, None]).sum(1)
    c0 = np.clip(first_ge_c - 3, 0, k_rag_rows - cwinr)
    t0c = np.clip(ctile_row[c0] - 4, 0, t_pad - tblw)
    tbl_c = np.stack([csum_c_excl[np.minimum(t0 + k, t_pad - 1)]
                      for k in range(tblw)], 1)
    tbl_u = np.stack([csum_u_incl[np.minimum(t0c + k, t_pad - 1)]
                      for k in range(tblw)], 1)
    scal = np.concatenate(
        [np.stack([s0, u_base, c0, np.broadcast_to(k_total, (nb_d,)),
                   t0, t0c, targets, np.zeros(nb_d, np.int64)], 1),
         tbl_c, tbl_u], 1)
    return scal.astype(np.int64)


def main():
    root = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
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
    t_pad32 = -(-n_tiles // 32) * 32
    hist = jax.jit(lambda k: ro.hist_outer(
        jax.lax.shift_right_logical(k, IDX_BITS), t_pad32)[:n_tiles])(
            prev_key)

    npx, npy = step(px, py, jnp.float32(0.3))
    key = keys_of(npx, npy, low)
    pxi = jax.lax.bitcast_convert_type(npx, jnp.int32)
    pyi = jax.lax.bitcast_convert_type(npy, jnp.int32)
    aux = pxi ^ pyi
    ok, key_s, pays, new_hist, dbg = ro.merge_reorder(
        key, prev_key, [pxi, pyi, low, aux], hist,
        n_tiles=n_tiles, idx_bits=IDX_BITS, debug=True)
    ok_layout, k_total, counts, scal = [np.asarray(x) for x in dbg]
    kh = np.asarray(key)
    ph = np.asarray(prev_key)
    print(f"ok={bool(np.asarray(ok))} ok_layout={bool(ok_layout)} "
          f"k_total={int(k_total)} k_cap={n // 8} "
          f"churn={float((kh != ph).mean()):.4f}")
    bad = counts != ro.DB
    print(f"counts != DB: {bad.sum()}/{counts.shape[0]} "
          f"min={counts.min()} max={counts.max()}")

    # --- numpy oracle of the prep table ---
    t_pad = -(-(n_tiles + 1) // LANES) * LANES
    k_cap = n // 8
    k_rag_rows = max(k_cap // LANES + n // ro.SB + ro.SB // LANES,
                     ro.CWIN // LANES)
    tblw = min(t_pad, max(ro.TBLW, 2 * (ro.WIN * n_tiles // n) + 16,
                          2 * (ro.CWIN * n_tiles // max(k_cap, 1)) + 16))
    mask_c = kh != ph
    kt = int(mask_c.sum())
    hist_u_np = np.bincount(ph[~mask_c] >> IDX_BITS, minlength=t_pad)
    hist_c_np = np.bincount(kh[mask_c] >> IDX_BITS, minlength=t_pad)
    csum_u_incl = np.cumsum(hist_u_np)
    csum_c_excl = np.cumsum(hist_c_np) - hist_c_np
    ck_vals = np.full(k_rag_rows * LANES, ro.MAXKEY, np.int64)
    ck_vals[:kt] = np.sort(kh[mask_c])
    scal_np = np_prep(kh.astype(np.int64), ph.astype(np.int64), ck_vals,
                      kt, csum_u_incl, csum_c_excl, n_tiles, t_pad, tblw,
                      k_rag_rows)
    scal = scal.astype(np.int64)
    names = (["s0", "u_base", "c0", "k_total", "t0", "t0c", "d0", "pad"]
             + [f"tbl_c[{i}]" for i in range(tblw)]
             + [f"tbl_u[{i}]" for i in range(tblw)])
    # --- bad-block analysis: window membership of the TRUE block rows ---
    if bad.any():
        tiles_all = kh >> IDX_BITS
        # True merge rank of every source row: U rows -> #U before (in
        # current order) + #C in tiles strictly before; C rows -> #U in
        # tiles <= t + index among sorted C.
        mu = ~mask_c
        u_excl = np.cumsum(mu) - mu
        rank = np.where(mu, u_excl + csum_c_excl[tiles_all], 0)
        c_order = np.argsort(kh[mask_c], kind="stable")
        c_src = np.nonzero(mask_c)[0][c_order]
        rank_c_np = csum_u_incl[kh[c_src] >> IDX_BITS] \
            + np.arange(c_src.shape[0])
        rank = rank.astype(np.int64)
        rank[c_src] = rank_c_np
        bad_idx = np.nonzero(bad)[0]
        for b in bad_idx[:8]:
            d0 = b * ro.DB
            rows = np.nonzero((rank >= d0) & (rank < d0 + ro.DB))[0]
            is_u = mu[rows]
            s0b = int(scal[b, 0]) * LANES
            c0b = int(scal[b, 2]) * LANES
            u_in = ((rows[is_u] >= s0b)
                    & (rows[is_u] < s0b + ro.WIN)).sum()
            # sorted-C index of each C row in this block
            ci = rank[rows[~is_u]] - csum_u_incl[
                kh[rows[~is_u]] >> IDX_BITS]
            c_in = ((ci >= c0b) & (ci < c0b + ro.CWIN)).sum()
            print(f"  bad block {b}: count={int(counts[b])} "
                  f"true U={int(is_u.sum())} (in-window {int(u_in)}) "
                  f"C={int((~is_u).sum())} (in-window {int(c_in)}) "
                  f"s0={s0b} c0={c0b} t0={int(scal[b, 4])} "
                  f"t0c={int(scal[b, 5])}")

    ndiff = 0
    for j, nm in enumerate(names):
        d = scal[:, j] - scal_np[:, j]
        if np.any(d != 0):
            ndiff += 1
            if ndiff <= 12:
                i = int(np.argmax(np.abs(d)))
                print(f"scal DIFF {nm}: {int((d != 0).sum())} blocks, "
                      f"max|d|={int(np.abs(d).max())} e.g. block {i}: "
                      f"dev={int(scal[i, j])} np={int(scal_np[i, j])}")
    if ndiff == 0:
        print("scal table EXACT vs numpy oracle -> failure is in-kernel")
    # correctness of the merged output where counts hold
    if bool(np.asarray(ok)):
        ks = np.asarray(key_s)
        tiles = ks >> IDX_BITS
        print(f"tile-sorted: {bool(np.all(np.diff(tiles) >= 0))}")

        # --- chained merge: frame 2 from the MERGE-ordered stream ---
        pxs = jax.lax.bitcast_convert_type(pays[0], jnp.float32)
        pys = jax.lax.bitcast_convert_type(pays[1], jnp.float32)
        lows = pays[2]
        npx2, npy2 = step(pxs, pys, jnp.float32(0.45))
        key2 = keys_of(npx2, npy2, lows)
        px2i = jax.lax.bitcast_convert_type(npx2, jnp.int32)
        py2i = jax.lax.bitcast_convert_type(npy2, jnp.int32)
        ok2, key2_s, pays2, hist2, dbg2 = ro.merge_reorder(
            key2, key_s, [px2i, py2i, lows, px2i ^ py2i], new_hist,
            n_tiles=n_tiles, idx_bits=IDX_BITS, debug=True)
        okl2, kt2, counts2, _ = [np.asarray(x) for x in dbg2]
        bad2 = counts2 != ro.DB
        print(f"frame2 (chained): ok={bool(np.asarray(ok2))} "
              f"ok_layout={bool(okl2)} k_total={int(kt2)} "
              f"counts!=DB: {bad2.sum()}/{counts2.shape[0]} "
              f"min={counts2.min()} max={counts2.max()}")
        # exact new_hist check (device vs numpy over the merged keys)
        nh_np = np.bincount(np.asarray(key_s) >> IDX_BITS,
                            minlength=n_tiles)
        nh_dev = np.asarray(new_hist)
        print(f"new_hist exact: {bool(np.all(nh_np == nh_dev))}")


if __name__ == "__main__":
    main()
