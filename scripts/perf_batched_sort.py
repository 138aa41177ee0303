"""Probe: does XLA TPU sort get cheaper per row when batched?

The segment sort (~6 ms of a ~17 ms frame at 1M) is bitonic —
O(n log² n) comparator stages. Sorting a [B, n/B] array along the minor
axis runs B independent bitonic sorts of depth log²(n/B): for n = 512k,
B = 64 that is 169 vs 361 stages — IF XLA's TPU sort actually scales with
row length and parallelises the batch. If it does, a two-phase bucket
sort (coarse route to B buckets + one batched sort) beats the flat sort;
if not, the flat-sort floor stands (recorded either way in BENCHMARKS.md).

Run on TPU: `timeout 550 python scripts/perf_batched_sort.py [M]`.
"""

import sys
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    for o in jax.tree.leaves(out):
        float(o.ravel()[0].astype(jnp.float32))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    for o in jax.tree.leaves(out):  # consume EVERY output (DCE trap)
        float(o.ravel()[0].astype(jnp.float32))
    return (time.time() - t0) / reps * 1000


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 19
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    ops = [jax.random.randint(ks[i], (m,), 0, 1 << 30, jnp.int32)
           for i in range(5)]

    f = jax.jit(lambda *o: jax.lax.sort(list(o), num_keys=1))
    print(f"flat sort {m} rows x 5 ops: {timeit(f, *ops):.2f} ms",
          flush=True)

    for b in (16, 64, 256, 1024):
        shaped = [o.reshape(b, -1) for o in ops]

        def fb(*o):
            return jax.lax.sort(list(o), dimension=1, num_keys=1)

        fbj = jax.jit(fb)
        print(f"batched [{b}, {m // b}] x 5 ops: "
              f"{timeit(fbj, *shaped):.2f} ms", flush=True)

    # single combined-key operand (key<<20|id already packs both)
    f1 = jax.jit(lambda k: jax.lax.sort([k], num_keys=1))
    print(f"flat sort {m} rows x 1 op: {timeit(f1, ops[0]):.2f} ms",
          flush=True)
    for b in (64, 256):
        f1b = jax.jit(lambda k: jax.lax.sort([k], dimension=1, num_keys=1))
        print(f"batched [{b}, {m // b}] x 1 op: "
              f"{timeit(f1b, ops[0].reshape(b, -1)):.2f} ms", flush=True)

    # sort_key_val pair form some backends special-case
    kv = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v))
    print(f"sort_key_val {m}: {timeit(kv, ops[0], ops[1]):.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
