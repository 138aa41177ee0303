"""Merge reorder: restore the resident stream's tile-sorted row order
without a global `lax.sort`.

The resident frame keeps particle state in segment-key-sorted row order
(`engine.draw_sim(resident=True)`); each frame re-sorts by the new keys —
~123 ms of the 208 ms config-5 frame at 16.7M rows (BENCHMARKS.md
north-star ladder). But the permutation between frames is MEASURED to be
self-locating (`scripts/perf_perm_apply.py`, round-5 probe r5f): rows
whose key did not change (~91-96 %/frame) stay within a ~3-block window
of their destination at every scale, and ONLY churned rows stray. Since
the previous order was sorted by the previous keys, the unchanged rows
already form a sorted subsequence — sortedness can be RESTORED by a
merge instead of recomputed by a sort:

    U = rows with key == prev_key   (already relatively sorted)
    C = rows with key != prev_key   (~4-9 %/frame + spawns)

    1. compact C's rows out           (Pallas, block-local log-shift)
    2. lax.sort the compacted C       (k rows instead of n)
    3. per-tile histograms + cumsums  (XLA, k-sized one-hots)
    4. merge-apply                    (Pallas: windowed DMA + in-VMEM
                                       log-shift routing to exact ranks)

Ordering contract: the output is sorted by TILE (key >> idx_bits) with
U rows before C rows inside a tile, U in previous relative order and C
sorted by full key. Consumers only need tile-clustered runs (the splat
kernel re-derives per-sample keys from geometry; force gathers and the
reconstruction are per-row) — the within-tile tie order of `lax.sort`
is NOT semantically meaningful, so the merge result is a valid sorted
order, just a different deterministic one.

The in-VMEM router is a "log-shift": pass b moves every element whose
remaining shift has bit b set by exactly 2^b. A single chain is only
collision-free for the COMPACTION shape (consecutive destinations,
LSB-first — see `_logshift_left`); arbitrary strictly-increasing
destinations are routed by compact-then-expand (`_route_to`), where the
expansion runs the exact reverse schedule of a compaction (MSB-first,
right moves) and is therefore collision-free by retracing. Verified
exhaustively for small widths and randomized to W = 8192;
`tests/test_reorder.py` pins both the router and the full merge.

Failure containment: fixed capacities (C capacity `n // 8`, window
sizes) and estimate-based window offsets can be exceeded by adversarial
frames (mass respawns, teleports). Every such failure makes the
per-block placed counts disagree with the row count; `merge_reorder`
returns an `ok` flag and the caller falls back to the flat sort for
that frame — correctness never depends on the estimates.

No reference counterpart: the GL original re-draws from scratch each
frame (`src/index.js:278-340`); this is TPU-native engineering against
`lax.sort`'s bitonic cost model (~25 ms/operand at 16.7M rows).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SB = 4096         # compaction source block (rows)
DB = 4096         # merge-apply dest block (elements; 4096 halves the
                  # apply kernel's window-routing passes vs 2048 — same
                  # windows serve twice the dests)
WIN = 8192        # U source window per dest block (rows)
CWIN = 4096       # sorted-C window per dest block (rows)
TBLW = 32         # per-block table slice (tiles) for rank lookups
MAXKEY = 2 ** 31 - 1  # python int: kernels must not capture traced constants


# --- in-VMEM routing primitives ---------------------------------------------


def _roll_left(x, s):
    """Left-roll a [R, 128] block by `s` in flattened row-major order
    (static `s`): out_flat[i] = x_flat[(i + s) % (R·128)]."""
    r, lanes = x.shape
    q, rr = divmod(s, lanes)
    out = x
    if rr:
        a = pltpu.roll(out, lanes - rr, axis=1)
        b = pltpu.roll(a, r - 1, axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        out = jnp.where(lane < lanes - rr, a, b)
    if q:
        out = pltpu.roll(out, r - q, axis=0)
    return out


def _roll_right(x, s):
    """Right-roll a [R, 128] block by `s` in flattened row-major order."""
    r, lanes = x.shape
    return _roll_left(x, r * lanes - s)


def _logshift_left(words, rte, n_bits, flag_last=False):
    """COMPACT: route elements LEFT by `rte` (int32 >= 0, 0 =
    junk/settled) to CONSECUTIVE destinations, LSB-first. Collision-free
    only for the compaction shape — sources strictly increasing, dests
    consecutive (dest gap 1): an arriving element's target can then never
    hold a non-moving element (the two remaining shifts would have to
    differ by < 2^b while both being multiples of 2^b — impossible with
    unit dest gaps). Gapped destinations are NOT safe here — use
    `_logshift_expand` for those. Junk slots hold stale values (callers
    mask by position < count)."""
    for b in range(n_bits):
        bit = jnp.int32(1 << b)
        mv = (rte & bit) != 0
        arrive = _roll_left(mv.astype(jnp.int32), 1 << b) != 0
        new_words = []
        for i, wd in enumerate(words):
            rolled = _roll_left(wd, 1 << b)
            if flag_last and i == len(words) - 1:
                # The flag word must not leave stale copies behind: a
                # vacated slot zeroes it (placed tests read it directly).
                wd = jnp.where(mv, 0, wd)
            new_words.append(jnp.where(arrive, rolled, wd))
        words = new_words
        # Movers vacate their slot (remaining shift -> 0 junk); arrivals
        # carry their decremented shift.
        rte = jnp.where(arrive, _roll_left(rte, 1 << b) - bit,
                        jnp.where(mv, jnp.int32(0), rte))
    return words, rte


def _logshift_expand(words, rte, n_bits, flag_last=False):
    """EXPAND: route elements RIGHT by `rte` from consecutive sources to
    strictly-increasing destinations, MSB-first. This is the exact
    reverse schedule of `_logshift_left` compacting the inverse
    permutation, so every intermediate state retraces a collision-free
    compaction backwards — collision-free by construction."""
    for b in reversed(range(n_bits)):
        bit = jnp.int32(1 << b)
        mv = (rte & bit) != 0
        arrive = _roll_right(mv.astype(jnp.int32), 1 << b) != 0
        new_words = []
        for i, wd in enumerate(words):
            rolled = _roll_right(wd, 1 << b)
            if flag_last and i == len(words) - 1:
                wd = jnp.where(mv, 0, wd)
            new_words.append(jnp.where(arrive, rolled, wd))
        words = new_words
        rte = jnp.where(arrive, _roll_right(rte, 1 << b) - bit,
                        jnp.where(mv, jnp.int32(0), rte))
    return words, rte


def _route_to(words, sel, dest, n_bits_w, n_bits_d):
    """Move the `sel` elements of `words` to block-local destinations
    `dest` (strictly increasing over selected elements, dest < 2^n_bits_d)
    via safe compact-then-expand. Returns routed words + a placed mask."""
    mf = sel.astype(jnp.float32)
    csum = _cumsum_flat(mf)
    flat = _flat_iota(sel.shape)
    rank = (csum - mf).astype(jnp.int32)
    rte1 = jnp.where(sel, flat - rank, 0)
    ws = list(words) + [jnp.where(sel, dest, 0),
                        jnp.where(sel, 1, 0)]
    ws, _ = _logshift_left(ws, rte1, n_bits_w)
    dcomp, ones = ws[-2], ws[-1]
    shp0 = sel.shape[0]
    cnt = csum[shp0 - 1, LANES - 1].astype(jnp.int32)
    live = (flat < cnt) & (ones != 0)
    rte2 = jnp.where(live, dcomp - flat, 0)
    ws2, _ = _logshift_expand(list(ws[:-2]) + [jnp.where(live, 1, 0)],
                              rte2, n_bits_d, flag_last=True)
    return ws2[:-1], ws2[-1] != 0


def _cumsum_flat(m):
    """Inclusive cumsum of a [R, 128] f32 block in flattened row-major
    order, via triangular matmuls. `m` must be 0/1-valued: the TPU's
    default-precision f32 matmul rounds OPERANDS to bf16 (~8 mantissa
    bits), so only small-integer operands multiply exactly — 0/1 masks
    and the triangular matrices are exact, but the row totals (up to
    R·128) are NOT, so they cross the second matmul as two 8-bit halves
    (the `_shifted_tables` trick; f32 ACCUMULATION is always exact for
    counts < 2^24)."""
    r, lanes = m.shape
    li = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 1)
    tri = (li <= lj).astype(jnp.float32)
    row_c = jnp.dot(m, tri, preferred_element_type=jnp.float32)
    tot = row_c[:, lanes - 1:lanes]                      # [R, 1] < 2^16
    hi = jnp.floor(tot * (1.0 / 256.0))
    lo = tot - hi * 256.0
    ri = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    tri_r = (ri > rj).astype(jnp.float32)                # rows before r
    pref = (jnp.dot(tri_r, hi, preferred_element_type=jnp.float32) * 256.0
            + jnp.dot(tri_r, lo, preferred_element_type=jnp.float32))
    return row_c + pref


def _flat_iota(shape):
    return (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * shape[1]
            + jax.lax.broadcasted_iota(jnp.int32, shape, 1))


# --- K1: churned-row compaction ---------------------------------------------


def _compact_kernel(base_ref, key_ref, prev_ref, *rest, n_pay, sbr):
    """Extract this block's churned rows (key != prev_key), packed to the
    block head by the log-shift router, and DMA them to the ragged-128
    output at the block's precomputed row base. Non-compacted tail rows
    are key=MAXKEY (the C sort sends them last; histograms mask them)."""
    n_c = 2 + n_pay
    pays = [rest[i] for i in range(n_pay)]
    # rest: pays, aliased fill inputs (ANY, same buffers as the outputs),
    # output refs (ANY), staging VMEM, DMA sem.
    outs = rest[n_pay + n_c:n_pay + 2 * n_c]
    stage = rest[n_pay + 2 * n_c:-1]
    sem = rest[-1]

    key = key_ref[:]
    prev = prev_ref[:]
    mask = key != prev
    mf = mask.astype(jnp.float32)
    csum = _cumsum_flat(mf)
    flat = _flat_iota(key.shape)
    rank_ex = (csum - mf).astype(jnp.int32)   # exclusive rank among C
    rte = jnp.where(mask, flat - rank_ex, 0)

    words = [key, prev] + [p[:] for p in pays]
    routed, _ = _logshift_left(words, rte, n_bits=12)   # shifts < SB=4096

    cnt = csum[sbr - 1, LANES - 1].astype(jnp.int32)
    valid = flat < cnt
    stage[0][:] = jnp.where(valid, routed[0], jnp.int32(MAXKEY))
    for i, wd in enumerate(routed[1:]):
        stage[1 + i][:] = wd

    base = base_ref[0, 0, 0]
    copies = []
    for i, o in enumerate(outs):
        dma = pltpu.make_async_copy(
            stage[i], o.at[pl.ds(base, sbr), :], sem.at[i])
        dma.start()
        copies.append(dma)
    for dma in copies:
        dma.wait()


def _compact(key2, prev2, pays2, k_rag_rows, interpret):
    """Run K1 over all source blocks. Returns (ck2, cprev2, cpays2,
    k_total, ok_layout) — ragged-128 compacted arrays [k_rag_rows, 128]
    with MAXKEY fill."""
    nrows = key2.shape[0]
    n = nrows * LANES
    nb = n // SB
    sbr = SB // LANES
    n_pay = len(pays2)

    mask = (key2 != prev2)
    cnt_b = mask.reshape(nb, SB // LANES, LANES).sum((1, 2))
    cap_rows = (cnt_b + (LANES - 1)) // LANES
    base_rows = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(cap_rows)[:-1]])
    ok_layout = (base_rows[-1] + cap_rows[-1]) <= k_rag_rows
    base_rows = jnp.minimum(base_rows, k_rag_rows - sbr).astype(jnp.int32)
    k_total = cnt_b.sum()

    blocked = pl.BlockSpec((sbr, LANES), lambda b: (b, 0),
                           memory_space=pltpu.VMEM)
    # Mosaic requires the last two block dims to equal (or 8/128-divide)
    # the array dims — per-block scalars ride a LEADING grid axis.
    smem = pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                        memory_space=pltpu.SMEM)
    fill = [jnp.full((k_rag_rows, LANES), MAXKEY, jnp.int32)] \
        + [jnp.zeros((k_rag_rows, LANES), jnp.int32)] * (1 + n_pay)
    n_in = 3 + n_pay
    outs = pl.pallas_call(
        functools.partial(_compact_kernel, n_pay=n_pay, sbr=sbr),
        grid=(nb,),
        in_specs=([smem, blocked, blocked] + [blocked] * n_pay
                  + [pl.BlockSpec(memory_space=pl.ANY)] * (2 + n_pay)),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 + n_pay),
        out_shape=[jax.ShapeDtypeStruct((k_rag_rows, LANES), jnp.int32)]
        * (2 + n_pay),
        scratch_shapes=[pltpu.VMEM((sbr, LANES), jnp.int32)] * (2 + n_pay)
        + [pltpu.SemaphoreType.DMA((2 + n_pay,))],
        input_output_aliases={n_in + i: i for i in range(2 + n_pay)},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(base_rows[:, None, None], key2, prev2, *pays2, *fill)
    return outs[0], outs[1], list(outs[2:]), k_total, ok_layout


# --- K2: merge apply ---------------------------------------------------------


def _apply_kernel(scal_ref, key_ref, prev_ref, *rest, n_pay, winr, cwinr,
                  dbr, idx_bits, tblw):
    """Place one dest block: DMA the U source window and the sorted-C
    window, compute exact merge ranks in-kernel (tables arrive as TBLW
    SMEM scalars), route both to their block-local destinations with the
    log-shift router, and combine."""
    upays = rest[:n_pay]
    ck_ref = rest[n_pay]
    cpays = rest[n_pay + 1:2 * n_pay + 1]
    okey_ref = rest[2 * n_pay + 1]
    opays = rest[2 * n_pay + 2:3 * n_pay + 2]
    cnt_ref = rest[3 * n_pay + 2]
    scratch = rest[3 * n_pay + 3:-1]
    sem = rest[-1]

    s0 = scal_ref[0, 0, 0]
    u_base = scal_ref[0, 0, 1]
    c0 = scal_ref[0, 0, 2]
    k_total = scal_ref[0, 0, 3]
    t0 = scal_ref[0, 0, 4]
    t0c = scal_ref[0, 0, 5]
    d0 = scal_ref[0, 0, 6]        # this block's first global rank (j·DB)

    # Windows: U streams (key, prev, payloads) + C streams (key, payloads).
    n_u = 2 + n_pay
    ustage = scratch[:n_u]
    cstage = scratch[n_u:n_u + 1 + n_pay]
    copies = []
    for i, (src, dst) in enumerate(
            [(key_ref, ustage[0]), (prev_ref, ustage[1])]
            + [(upays[i], ustage[2 + i]) for i in range(n_pay)]):
        dma = pltpu.make_async_copy(src.at[pl.ds(s0, winr), :], dst,
                                    sem.at[i])
        dma.start()
        copies.append(dma)
    for i, (src, dst) in enumerate(
            [(ck_ref, cstage[0])]
            + [(cpays[i], cstage[1 + i]) for i in range(n_pay)]):
        dma = pltpu.make_async_copy(src.at[pl.ds(c0, cwinr), :], dst,
                                    sem.at[n_u + i])
        dma.start()
        copies.append(dma)
    for dma in copies:
        dma.wait()

    def tbl_lookup(rel, off):
        # tblw-entry table lookup from SMEM scalars (clamped; estimate
        # misses surface as count mismatches -> caller falls back).
        relc = jnp.clip(rel, 0, tblw - 1)
        out = jnp.zeros(rel.shape, jnp.int32)
        for j in range(tblw):
            out = jnp.where(relc == j, scal_ref[0, 0, off + j], out)
        return out

    # --- U ranks: #U before (globally) + #C in tiles strictly before. ---
    ukey = ustage[0][:]
    uprev = ustage[1][:]
    mask_u = ukey == uprev
    mf = mask_u.astype(jnp.float32)
    u_loc_ex = (_cumsum_flat(mf) - mf).astype(jnp.int32)
    tile_u = jax.lax.shift_right_logical(ukey, idx_bits)
    c_before = tbl_lookup(tile_u - t0, 8)
    rank_u = u_base + u_loc_ex + c_before
    d_u = rank_u - d0
    sel_u = mask_u & (d_u >= 0) & (d_u < dbr * LANES)
    uw, pu_full = _route_to(
        [ukey] + [ustage[2 + i][:] for i in range(n_pay)],
        sel_u, d_u, n_bits_w=13, n_bits_d=12)            # WIN 8192, DB 4096

    # --- C ranks: #U in tiles <= t + global index among valid C rows. ---
    ckey = cstage[0][:]
    flat_c = _flat_iota(ckey.shape)
    gidx_c = c0 * LANES + flat_c
    valid_c = gidx_c < k_total                            # pads sort last
    tile_c = jax.lax.shift_right_logical(ckey, idx_bits)
    u_upto = tbl_lookup(tile_c - t0c, 8 + tblw)
    rank_c = u_upto + gidx_c
    d_c = rank_c - d0
    sel_c = valid_c & (d_c >= 0) & (d_c < dbr * LANES)
    cw, pc_full = _route_to(
        [ckey] + [cstage[1 + i][:] for i in range(n_pay)],
        sel_c, d_c, n_bits_w=12, n_bits_d=12)            # CWIN 4096

    pu = pu_full[:dbr]
    pc = pc_full[:dbr]
    okey_ref[:] = jnp.where(pu, uw[0][:dbr],
                            jnp.where(pc, cw[0][:dbr], jnp.int32(MAXKEY)))
    for i in range(n_pay):
        opays[i][:] = jnp.where(pu, uw[1 + i][:dbr],
                                jnp.where(pc, cw[1 + i][:dbr], 0))
    cnt = (jnp.sum(pu_full.astype(jnp.int32))
           + jnp.sum(pc_full.astype(jnp.int32))).astype(jnp.int32)
    # Mosaic cannot store scalars to VMEM — broadcast to the block.
    cnt_ref[0] = jnp.broadcast_to(cnt, (8, LANES))


# --- public entry ------------------------------------------------------------


def hist_outer(tiles, t_pad):
    """int32[t_pad] histogram of `tiles` (values outside [0, t_pad)
    dropped) as an MXU outer product: split each tile id into 5-bit
    lo / remaining hi halves, one-hot both (k×(t_pad/32 + 32) cheap
    compares instead of k×t_pad), and contract onehot_hiᵀ @ onehot_lo —
    the k×t_pad work lands on the MXU. f32 accumulation is exact for
    per-bin counts < 2^24. `t_pad` must be a multiple of 32."""
    assert t_pad % 32 == 0
    n_hi = t_pad // 32
    hi = jax.lax.shift_right_logical(tiles, 5)
    lo = tiles & 31
    oh_hi = (hi[:, None] == jnp.arange(n_hi, dtype=jnp.int32)[None, :]
             ).astype(jnp.bfloat16)
    oh_lo = (lo[:, None] == jnp.arange(32, dtype=jnp.int32)[None, :]
             ).astype(jnp.bfloat16)
    h2 = jax.lax.dot_general(oh_hi, oh_lo, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return h2.reshape(-1).astype(jnp.int32)


def _take_small(table, idx):
    """table[idx] (int32) without TPU's serial gather: a broadcast
    compare + masked reduce, split into two 13-bit halves so the f32
    reduction stays exact for values < 2^26. Cost idx·|table| element
    ops — use only when that product is ~1e8 or less."""
    eq = idx[:, None] == jnp.arange(table.shape[0],
                                    dtype=jnp.int32)[None, :]
    hi = jnp.sum(jnp.where(eq, (table >> 13).astype(jnp.float32), 0.0),
                 axis=1)
    lo = jnp.sum(jnp.where(eq, (table & 8191).astype(jnp.float32), 0.0),
                 axis=1)
    return (hi.astype(jnp.int32) << 13) + lo.astype(jnp.int32)


def _shifted_tables(table, t0, tblw):
    """rows[j, k] = table[t0[j] + k] for k < tblw (one one-hot matmul
    against tblw shifted copies of the table)."""
    t = table.shape[0]
    padded = jnp.concatenate(
        [table, jnp.full(tblw, table[-1], table.dtype)])
    shifts = jnp.stack([padded[k:k + t] for k in range(tblw)], axis=1)
    oh = (t0[:, None] == jnp.arange(t, dtype=jnp.int32)[None, :]
          ).astype(jnp.bfloat16)
    parts = []
    for sh in (16, 8, 0):
        comp = ((shifts >> sh) & 255).astype(jnp.bfloat16)
        got = jnp.dot(oh, comp, preferred_element_type=jnp.float32)
        parts.append(got.astype(jnp.int32))
    return (parts[0] << 16) + (parts[1] << 8) + parts[2]




def _prefix_lookup(bounds, hist, strict):
    """Per-row prefix sums of `hist` up to a bound: Σ_t hist[t] for
    t < bounds[r] (`strict`) or t <= bounds[r] — a 0/1-compare matmul
    against the 8-bit components of `hist`, exact for values < 2^24 (the
    TPU default-precision matmul rounds operands to bf16, so only the
    0/1 mask and 8-bit components cross the MXU)."""
    t = hist.shape[0]
    tids = jnp.arange(t, dtype=jnp.int32)[None, :]
    cmp = (bounds[:, None] > tids) if strict else (bounds[:, None] >= tids)
    a = cmp.astype(jnp.bfloat16)
    parts = []
    for sh in (16, 8, 0):
        comp = ((hist >> sh) & 255).astype(jnp.bfloat16)
        got = jnp.dot(a, comp, preferred_element_type=jnp.float32)
        parts.append(got.astype(jnp.int32))
    return (parts[0] << 16) + (parts[1] << 8) + parts[2]


def _apply_prep(key, key2, prev2, ck_s, k_total, hist_u, hist_c,
                csum_u_incl, csum_c_excl, n_tiles, idx_bits, t_pad, tblw,
                k_rag_rows):
    """Per-dest-block scalars for the apply kernel (XLA): window offsets,
    exact bases, and the two rank-table slices. Returns the
    [nb_d, 8 + 2·tblw] int32 scal array.

    Window offsets are EXACT at row (128-element) granularity — the
    earlier strided-sample estimates broke at 16.7M rows, where local
    churn imbalance displaces a block's true source range by more than
    any fixed margin (measured: whole blocks outside their windows).
    Exactness without gathers: the merge rank at each source row start
    is monotone, so each row's rank lands in a dest-block bin and an
    MXU histogram (`hist_outer`) + cumsum inverts the map — the first
    source row with rank >= b·DB is exactly the number of rows in
    earlier bins."""
    n = key.shape[0]
    nrows = n // LANES
    nb_d = n // DB
    winr = WIN // LANES
    cwinr = CWIN // LANES
    nbp = -(-(nb_d + 1) // 32) * 32          # dest-block bins (padded)

    mask_u2 = key2 == prev2
    u_chunk = mask_u2.sum(1, dtype=jnp.int32)
    u128c = jnp.cumsum(u_chunk) - u_chunk                  # #U before row r
    targets = jnp.arange(nb_d, dtype=jnp.int32) * DB

    # --- U anchor: rank of each row's first U row (exact, monotone). ---
    tile2 = jax.lax.shift_right_logical(key2, idx_bits)
    tfu = jnp.min(jnp.where(mask_u2, tile2, t_pad), axis=1)
    # U-free rows inherit the NEXT row's U tile (reverse running min keeps
    # the sequence monotone; tail rows with no U left stay at t_pad).
    tfu = jnp.flip(jax.lax.cummin(jnp.flip(tfu)))
    tfu_cl = jnp.minimum(tfu, t_pad - 1)
    rank_row = u128c + _prefix_lookup(tfu_cl, hist_c, strict=True)
    blk = jnp.clip(rank_row // DB, 0, nbp - 1)
    hob = hist_outer(blk, nbp)
    first_ge = (jnp.cumsum(hob) - hob)[:nb_d]  # rows with rank < b·DB
    s0 = jnp.clip(first_ge - 3, 0, nrows - winr)
    u_base = _take_small(u128c, s0)
    t0 = jnp.clip(_take_small(tfu_cl, s0) - 4, 0, t_pad - tblw)

    # --- C anchor: rank of each sorted-C row's first element. ---
    ck0 = ck_s[:, 0]                           # row min (globally sorted)
    ctile_row = jnp.where(
        ck0 == MAXKEY, t_pad - 1,
        jax.lax.shift_right_logical(ck0, idx_bits))
    crank_row = (_prefix_lookup(ctile_row, hist_u, strict=False)
                 + jnp.arange(k_rag_rows, dtype=jnp.int32) * LANES)
    blkc = jnp.clip(crank_row // DB, 0, nbp - 1)
    hoc = hist_outer(blkc, nbp)
    first_ge_c = (jnp.cumsum(hoc) - hoc)[:nb_d]
    c0 = jnp.clip(first_ge_c - 3, 0, k_rag_rows - cwinr)
    t0c = jnp.clip(_take_small(ctile_row, c0) - 4, 0, t_pad - tblw)

    tbl_c = _shifted_tables(csum_c_excl, t0, tblw)         # [nb_d, tblw]
    tbl_u = _shifted_tables(csum_u_incl, t0c, tblw)
    return jnp.concatenate(
        [jnp.stack([s0, u_base, c0,
                    jnp.broadcast_to(k_total, (nb_d,)), t0, t0c, targets,
                    jnp.zeros(nb_d, jnp.int32)], axis=1),
         tbl_c, tbl_u], axis=1).astype(jnp.int32)          # [nb_d, 8+2T]


@functools.partial(jax.jit, static_argnames=("n_tiles", "idx_bits",
                                             "interpret", "debug"))
def merge_reorder(key, prev_key, payloads, prev_hist, *, n_tiles,
                  idx_bits, interpret=None, debug=False):
    """Reorder `key` + `payloads` (int32[n] each, n % 4096 == 0) into
    tile-sorted order by merging against the previous sorted order
    (`prev_key` = the key stream this row order was sorted by, carried
    from the previous frame; `prev_hist` = int32[n_tiles] per-tile counts
    of `prev_key`, carried likewise).

    Returns `(ok, sorted_key, sorted_payloads, new_hist)`. `ok=False`
    means a capacity/window guard tripped — the caller must fall back to
    `lax.sort([key] + payloads)` for this frame (e.g. frame 0, mass
    respawns). `new_hist` is the tile histogram of `key` (carry it as the
    next frame's `prev_hist` — it is exact whenever `ok`)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = key.shape[0]
    assert n % SB == 0 and n >= WIN
    n_pay = len(payloads)
    nrows = n // LANES
    k_cap = n // 8
    # Ragged-128 layout bound: per-block round-up slack (one row per
    # source block) + the LAST block's full-SB write overhang (every
    # block DMAs its whole staging buffer); at least one full C window
    # so the apply kernel's CWIN DMAs stay in bounds.
    k_rag_rows = max(k_cap // LANES + n // SB + SB // LANES,
                     CWIN // LANES)
    t_pad = -(-(n_tiles + 1) // LANES) * LANES
    # Per-block table slice: must cover every tile a window can span
    # (windows span ~WIN·n_tiles/n tiles for U, ~CWIN·n_tiles/k_cap for
    # sorted C, plus estimate error margins).
    tblw = min(t_pad,
               max(TBLW, 2 * (WIN * n_tiles // n) + 16,
                   2 * (CWIN * n_tiles // max(k_cap, 1)) + 16))

    key2 = key.reshape(nrows, LANES)
    prev2 = prev_key.reshape(nrows, LANES)
    pays2 = [p.reshape(nrows, LANES) for p in payloads]

    # K1: compact the churned rows (ragged-128, MAXKEY fill).
    ck2, cprev2, cpays2, k_total, ok_layout = _compact(
        key2, prev2, pays2, k_rag_rows, interpret)
    ok = ok_layout & (k_total <= k_cap)

    # Histograms over the compacted rows only (k-sized, not n-sized).
    ckf = ck2.reshape(-1)
    cvalid = ckf != MAXKEY
    # Invalid (ragged-fill) rows must land OUTSIDE the counted bin range
    # [0, t_pad) or they pollute the histograms' tail bins.
    tiles_new = jnp.where(
        cvalid, jax.lax.shift_right_logical(ckf, idx_bits), t_pad)
    tiles_old = jnp.where(
        cvalid, jax.lax.shift_right_logical(cprev2.reshape(-1), idx_bits),
        t_pad)
    hist_c = hist_outer(tiles_new, t_pad)
    hist_cout = hist_outer(tiles_old, t_pad)
    prev_hist_p = jnp.zeros(t_pad, jnp.int32).at[:n_tiles].set(prev_hist)
    hist_u = prev_hist_p - hist_cout[:t_pad]
    hist_c = hist_c[:t_pad]
    csum_u_incl = jnp.cumsum(hist_u)                       # #U tile <= t
    csum_c_excl = jnp.cumsum(hist_c) - hist_c              # #C tile <  t
    new_hist = (hist_u + hist_c)[:n_tiles]

    # C sort: key + payloads, k_rag rows (pads sort last on MAXKEY).
    sorted_c = jax.lax.sort(
        [ckf] + [p.reshape(-1) for p in cpays2], num_keys=1,
        is_stable=False)
    ck_s = sorted_c[0].reshape(k_rag_rows, LANES)
    cpays_s = [p.reshape(k_rag_rows, LANES) for p in sorted_c[1:]]

    scal = _apply_prep(key, key2, prev2, ck_s, k_total, hist_u, hist_c,
                       csum_u_incl, csum_c_excl, n_tiles, idx_bits, t_pad,
                       tblw, k_rag_rows)

    nb_d = n // DB
    winr = WIN // LANES
    cwinr = CWIN // LANES
    dbr = DB // LANES
    blocked_out = pl.BlockSpec((dbr, LANES), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1, 8 + 2 * tblw), lambda b: (b, 0, 0),
                        memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    n_u = 2 + n_pay
    outs = pl.pallas_call(
        functools.partial(_apply_kernel, n_pay=n_pay, winr=winr,
                          cwinr=cwinr, dbr=dbr, idx_bits=idx_bits,
                          tblw=tblw),
        grid=(nb_d,),
        in_specs=[smem] + [any_spec] * (n_u + 1 + n_pay),
        out_specs=[blocked_out] * (1 + n_pay)
        + [pl.BlockSpec((1, 8, LANES), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((nrows, LANES), jnp.int32)]
        * (1 + n_pay)
        + [jax.ShapeDtypeStruct((nb_d, 8, LANES), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((winr, LANES), jnp.int32)] * n_u
        + [pltpu.VMEM((cwinr, LANES), jnp.int32)] * (1 + n_pay)
        + [pltpu.SemaphoreType.DMA((n_u + 1 + n_pay,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(scal[:, None, :], key2, prev2, *pays2, ck_s, *cpays_s)

    okey = outs[0].reshape(-1)
    opays = [o.reshape(-1) for o in outs[1:1 + n_pay]]
    counts = outs[1 + n_pay][:, 0, 0]
    ok = ok & jnp.all(counts == DB)
    if debug:
        return ok, okey, opays, new_hist, (ok_layout, k_total, counts,
                                           scal)
    return ok, okey, opays, new_hist
