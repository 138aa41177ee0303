"""Is `lax.sort` per-operand cost word-width-insensitive? (TPU probe)

`timeout 550 python scripts/perf_sort_i64.py`

BENCHMARKS microdata says operand cost is dtype-insensitive among 32-bit
types. If an int64 operand costs ~an int32 operand, the production
segment sort (5 int32 ops at 16.7M) can ride as 3 int64 ops
(keym<<32|vlu keeps key order for keym >= 0; unstable sort, pads absent
at 2^24). Scan-timed, all outputs consumed (DCE trap).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

N = 16 * 1024 * 1024
ITERS = 4


def scan_time(label, f, args, iters=ITERS, reps=3):
    @jax.jit
    def run(a):
        def body(c, _):
            out = f(*c)
            # Consume every output; keep carry structure fixed.
            return tuple(o for o in out), ()
        out, _ = jax.lax.scan(body, a, None, length=iters)
        return sum(jnp.sum(o ^ o[0]) if o.dtype != jnp.float32
                   else jnp.sum(o) for o in out)
    run(args)
    float(run(args))
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        float(run(args))
        best = min(best, time.time() - t0)
    ms = best * 1000 / iters
    print(f"{label}: {ms:.2f} ms/iter", flush=True)
    return ms


def main():
    key = jax.random.PRNGKey(0)
    keym = jax.random.randint(key, (N,), 0, 2048, jnp.int32)
    vals = [jax.random.randint(jax.random.fold_in(key, i), (N,),
                               jnp.iinfo(jnp.int32).min, 2**31 - 1,
                               jnp.int32) for i in range(4)]

    def sort_n(k, *vs):
        return jax.lax.sort([k, *vs], num_keys=1, is_stable=False)

    scan_time("i32 sort 3 ops", sort_n, (keym, *vals[:2]))
    scan_time("i32 sort 4 ops", sort_n, (keym, *vals[:3]))
    scan_time("i32 sort 5 ops", sort_n, (keym, *vals[:4]))

    with jax.enable_x64(True):
        def pack(hi, lo):
            return ((hi.astype(jnp.int64) << 32)
                    | (lo.astype(jnp.int64) & jnp.int64(0xFFFFFFFF)))
        k64 = pack(keym, vals[0])
        a64 = pack(vals[1], vals[2])
        b64 = vals[3].astype(jnp.int64)

        def sort64(k, a, b):
            return jax.lax.sort([k, a, b], num_keys=1, is_stable=False)
        def sort64_2(k, a, b):
            out = jax.lax.sort([k, a], num_keys=1, is_stable=False)
            return (*out, b)

        try:
            scan_time("i64 sort 3 ops (packed 5)", sort64, (k64, a64, b64))
            scan_time("i64 sort 2 ops", sort64_2, (k64, a64, b64))
        except Exception as e:
            print("i64 sort failed:", type(e).__name__, e)

    # f32-keyed control at 16M for the record.
    scan_time("i32 sort 1 op (key only)", sort_n, (keym,))


if __name__ == "__main__":
    main()
