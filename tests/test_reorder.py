"""Merge-reorder correctness (ops/reorder_pallas.py): the router's
collision-freedom, and the full merge against a numpy oracle of its
ordering contract (tile-sorted, U before C per tile, U stable, C by
key)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tendrils_tpu.ops import reorder_pallas as ro

pytestmark = pytest.mark.kernel


def _route_host(vals, sel, dest, n_bits_w, n_bits_d):
    """Run the compact+expand router in a tiny interpret-mode kernel."""
    from jax.experimental import pallas as pl

    r, lanes = vals.shape

    def k(sel_ref, dest_ref, v_ref, out_ref, placed_ref):
        (routed,), placed = ro._route_to(
            [v_ref[:]], sel_ref[:] != 0, dest_ref[:],
            n_bits_w=n_bits_w, n_bits_d=n_bits_d)
        out_ref[:] = routed
        placed_ref[:] = placed.astype(jnp.int32)

    return pl.pallas_call(
        k,
        out_shape=[jax.ShapeDtypeStruct((r, lanes), jnp.int32)] * 2,
        interpret=True,
    )(jnp.asarray(sel, jnp.int32), jnp.asarray(dest, jnp.int32),
      jnp.asarray(vals, jnp.int32))


def test_route_to_scattered_selection():
    """Scattered selected elements route to arbitrary strictly-increasing
    destinations — the compact+expand safety the module relies on."""
    rng = np.random.default_rng(7)
    for trial in range(12):
        r, lanes = 16, 128
        w = r * lanes
        db = 1024                       # dest space (n_bits_d = 10)
        nsel = int(rng.integers(1, db))
        src = np.sort(rng.choice(w, nsel, replace=False))
        dest_sel = np.sort(rng.choice(db, nsel, replace=False))
        vals = np.full(w, -1, dtype=np.int32)
        vals[src] = np.arange(nsel)
        sel = np.zeros(w, dtype=np.int32)
        sel[src] = 1
        dest = np.zeros(w, dtype=np.int32)
        dest[src] = dest_sel
        out, placed = _route_host(vals.reshape(r, lanes),
                                  sel.reshape(r, lanes),
                                  dest.reshape(r, lanes),
                                  n_bits_w=11, n_bits_d=10)
        out = np.asarray(out).ravel()
        placed = np.asarray(placed).ravel()
        np.testing.assert_array_equal(out[dest_sel], np.arange(nsel))
        got = np.zeros(w, dtype=np.int32)
        got[dest_sel] = 1
        np.testing.assert_array_equal(placed, got)


def _mk_stream(n, n_tiles, idx_bits, churn, rng, teleport=0.0):
    """A prev-sorted stream + a churned current frame.

    Rows carry unique low bits (id) so the contract order is fully
    deterministic and payload rows can be compared exactly."""
    ids = rng.permutation(n) % (1 << idx_bits)
    # unique full keys: tile * 2^idx + per-tile-unique low bits
    base_tiles = np.sort(rng.integers(0, n_tiles - 1, n))
    low = np.zeros(n, dtype=np.int64)
    for t in range(n_tiles):
        m = base_tiles == t
        low[m] = rng.choice(1 << idx_bits, m.sum(), replace=False)
    prev_key = (base_tiles << idx_bits) | low

    key = prev_key.copy()
    moved = rng.random(n) < churn
    # churn: mostly +-1 tile (smooth motion), some global teleports
    delta = rng.choice([-1, 1], n)
    tele = rng.random(n) < teleport
    new_tiles = np.clip(base_tiles + delta, 0, n_tiles - 2)
    new_tiles[tele] = rng.integers(0, n_tiles - 1, int(tele.sum()))
    nk = (new_tiles << idx_bits) | low
    key[moved] = nk[moved]
    # keep keys unique among moved rows (drop accidental collisions)
    _, first = np.unique(key, return_index=True)
    dup = np.ones(n, dtype=bool)
    dup[first] = False
    key[dup] = prev_key[dup]

    prev_hist = np.bincount(prev_key >> idx_bits,
                            minlength=n_tiles).astype(np.int32)
    return key.astype(np.int64), prev_key.astype(np.int64), prev_hist


def _oracle(key, prev_key, idx_bits):
    """Expected order: tile asc; within tile U rows in SOURCE order (the
    contract preserves their relative order even when the source isn't
    key-sorted within a tile) then C rows in full-key order."""
    n = len(key)
    is_c = (key != prev_key).astype(np.int64)
    key_eff = np.where(is_c == 1, key, 0)
    order = np.lexsort((np.arange(n), key_eff, is_c, key >> idx_bits))
    return order


def _run(key, prev_key, prev_hist, n_tiles, idx_bits, pays):
    ok, okey, opays, new_hist = ro.merge_reorder(
        jnp.asarray(key, jnp.int32), jnp.asarray(prev_key, jnp.int32),
        [jnp.asarray(p, jnp.int32) for p in pays],
        jnp.asarray(prev_hist, jnp.int32),
        n_tiles=n_tiles, idx_bits=idx_bits, interpret=True)
    return (bool(ok), np.asarray(okey), [np.asarray(p) for p in opays],
            np.asarray(new_hist))


@pytest.mark.parametrize("churn,teleport", [(0.06, 0.0), (0.10, 0.3),
                                            (0.0, 0.0)])
def test_merge_reorder_matches_oracle(churn, teleport):
    rng = np.random.default_rng(3)
    n, n_tiles, idx_bits = 8192, 48, 13
    key, prev_key, prev_hist = _mk_stream(n, n_tiles, idx_bits, churn,
                                          rng, teleport)
    pays = [np.arange(n, dtype=np.int64), rng.integers(0, 2**31, n)]
    ok, okey, opays, new_hist = _run(key, prev_key, prev_hist, n_tiles,
                                     idx_bits, pays)
    assert ok
    order = _oracle(key, prev_key, idx_bits)
    np.testing.assert_array_equal(okey, key[order].astype(np.int32))
    for got, p in zip(opays, pays):
        np.testing.assert_array_equal(got, p[order].astype(np.int32))
    np.testing.assert_array_equal(
        new_hist, np.bincount(key >> idx_bits, minlength=n_tiles))


def test_merge_reorder_multi_frame():
    """Iterate: each frame's output feeds the next as prev — hist and
    order stay exact."""
    rng = np.random.default_rng(11)
    n, n_tiles, idx_bits = 8192, 48, 13
    key, prev_key, prev_hist = _mk_stream(n, n_tiles, idx_bits, 0.08,
                                          rng)
    ids = np.arange(n, dtype=np.int64)
    for _ in range(3):
        ok, okey, (oids,), new_hist = _run(key, prev_key, prev_hist,
                                           n_tiles, idx_bits, [ids])
        assert ok
        order = _oracle(key, prev_key, idx_bits)
        np.testing.assert_array_equal(oids, ids[order].astype(np.int32))
        # next frame: rows sit in sorted order; churn a few again
        prev_key = key[order]
        prev_hist = new_hist
        ids = ids[order]
        key = prev_key.copy()
        moved = rng.random(n) < 0.07
        key[moved] = ((np.clip((prev_key[moved] >> idx_bits)
                               + rng.choice([-1, 1], moved.sum()),
                               0, n_tiles - 2) << idx_bits)
                      | (prev_key[moved] & ((1 << idx_bits) - 1)))
        _, first = np.unique(key, return_index=True)
        dup = np.ones(n, dtype=bool)
        dup[first] = False
        key[dup] = prev_key[dup]


def test_merge_reorder_fallback_on_overflow():
    """Churn beyond the n//8 capacity must refuse (ok=False), not
    corrupt."""
    rng = np.random.default_rng(5)
    n, n_tiles, idx_bits = 8192, 48, 13
    key, prev_key, prev_hist = _mk_stream(n, n_tiles, idx_bits, 0.9,
                                          rng, teleport=0.5)
    if (key != prev_key).sum() <= n // 8:  # ensure over capacity
        pytest.skip("stream not churned enough")
    ok, *_ = _run(key, prev_key, prev_hist, n_tiles, idx_bits,
                  [np.arange(n)])
    assert not ok
