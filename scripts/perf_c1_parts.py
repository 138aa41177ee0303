"""Config-1 floor decomposition (VERDICT r4 #3): standalone in-scan costs
of (a) lax.sort at 65k rows with 2-5 operands, (b) the per-launch overhead
of this device runtime (chain of K unfusable fusions), at config-1 scale.

Run on TPU: `timeout 550 python scripts/perf_c1_parts.py`.
"""

import sys
import time

import jax
import jax.numpy as jnp

STEPS = 400
N = 65536


def timed(f, *args):
    out = f(*args)
    jax.tree.map(lambda x: x[..., 0] if x.ndim else x, out)
    float(jnp.asarray(out[0] if isinstance(out, tuple) else out).ravel()[0])
    t0 = time.time()
    out = f(*args)
    float(jnp.asarray(out[0] if isinstance(out, tuple) else out).ravel()[0])
    return (time.time() - t0) / STEPS * 1000


def sort_probe(n_ops):
    @jax.jit
    def run(key, pays):
        def body(c, _):
            key, pays = c
            outs = jax.lax.sort([key] + pays, num_keys=1)
            key = outs[0]
            # consume every output (DCE eats operands otherwise) and
            # perturb so iterations don't fold.
            pays = [p + key for p in outs[1:]]
            key = key ^ (pays[0] if pays else key)
            return (key, pays), ()
        c, _ = jax.lax.scan(body, (key, pays),
                            jnp.arange(STEPS, dtype=jnp.int32))
        return c[0]

    k = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, 1 << 25,
                           dtype=jnp.int32)
    pays = [jax.random.randint(jax.random.PRNGKey(i + 1), (N,), 0, 1 << 30,
                               dtype=jnp.int32) for i in range(n_ops - 1)]
    return timed(run, k, pays)


def launch_probe(k_launches):
    # K dependent reduces: each reduce is its own fusion (reduce roots
    # don't fuse into the next broadcast chain on TPU), so the scan body
    # is ~K launches of trivial size.
    @jax.jit
    def run(x):
        def body(c, _):
            for i in range(k_launches):
                s = jnp.sum(c, axis=0)       # [65536] reduce -> fusion
                c = c + s[None, :] * 1e-30   # broadcast back (fused in next)
            return c, ()
        c, _ = jax.lax.scan(body, x, jnp.arange(STEPS, dtype=jnp.int32))
        return c

    x = jnp.ones((4, N), jnp.float32)
    return timed(run, x)


def main():
    for n_ops in (2, 3, 4, 5):
        ms = sort_probe(n_ops)
        print(f"sort 65k x {n_ops} ops: {ms:7.3f} ms/step", flush=True)
    base = launch_probe(2)
    for k in (6, 14):
        ms = launch_probe(k)
        print(f"launch chain k={k:2d}: {ms:7.3f} ms/step "
              f"(delta vs k=2: {(ms - base) / (k - 2) * 1000:6.1f} "
              "us/launch)", flush=True)
    print(f"launch chain k= 2: {base:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
