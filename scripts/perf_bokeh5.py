"""MXU matmul blur stack vs the cumsum stack, scan-timed at 4K.

`timeout 550 python scripts/perf_bokeh5.py`

The blur stack is a linear operator, so each level is exactly
`A_l @ img @ B_l` with A/B the composed edge-replicated box matrices —
runs on the MXU instead of the VPU's log-shift cumsums. Candidates:
  - f32 matmul stack (exact vs blur_stack up to float assoc)
  - bf16 matmul stack (f32 accumulate)
  - stacked-A single H matmul + batched W einsum
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tendrils_tpu.ops import post  # noqa: E402

H, W = 2160, 3840
C = 6
ITERS = 10
RADII = (2, 6, 16)


def scan_time(label, f, x, iters=ITERS, reps=3):
    @jax.jit
    def run(x0):
        def body(c, _):
            return f(c), ()
        out, _ = jax.lax.scan(body, x0, None, length=iters)
        return out
    run(x)
    float(jax.tree.leaves(run(x))[0].ravel()[0].astype(jnp.float32))
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        float(jax.tree.leaves(run(x))[0].ravel()[0].astype(jnp.float32))
        best = min(best, time.time() - t0)
    ms = best * 1000 / iters
    print(f"{label}: {ms:.2f} ms/iter", flush=True)
    return ms


def box_matrix(n, r):
    """Edge-replicated box blur as an (n, n) matrix: out = M @ x."""
    m = np.zeros((n, n), np.float64)
    idx = np.arange(n)
    for d in range(-r, r + 1):
        j = np.clip(idx + d, 0, n - 1)
        m[idx, j] += 1.0 / (2 * r + 1)
    return m


def level_matrices(n, radii=RADII):
    """Cumulative per-level matrices matching post.blur_stack exactly."""
    mats = []
    cur = np.eye(n)
    prev = 0
    for r in radii:
        rr = max(1, (r - prev) // 2 + 1)
        b = box_matrix(n, rr)
        cur = b @ b @ cur
        mats.append(cur)
        prev = r
    return mats


def main():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (C, H, W), jnp.float32)

    a_np = level_matrices(H)   # H-axis, out = A @ img
    b_np = level_matrices(W)   # W-axis, out = img @ B^T; build as (w, W)
    a32 = [jnp.asarray(m.T, jnp.float32) for m in a_np]   # (h, Hout): img.T? no
    # H pass natural orientation: einsum('Hh,chw->cHw', A, img) — A rows=out.
    a32 = [jnp.asarray(m, jnp.float32) for m in a_np]
    b32 = [jnp.asarray(m.T, jnp.float32) for m in b_np]   # (w, Wout)
    a16 = [m.astype(jnp.bfloat16) for m in a32]
    b16 = [m.astype(jnp.bfloat16) for m in b32]
    a16s = jnp.concatenate(a16, axis=0)                    # (3H, h)
    b16b = jnp.stack(b16)                                  # (3, w, W)

    def stack_mm(x, a_l, b_l, dtype=None):
        xin = x.astype(dtype) if dtype is not None else x
        out = []
        for a, b in zip(a_l, b_l):
            hp = jnp.einsum("Hh,chw->cHw", a, xin,
                            preferred_element_type=jnp.float32)
            hp = hp.astype(dtype) if dtype is not None else hp
            wp = jnp.einsum("chw,wW->chW", hp, b,
                            preferred_element_type=jnp.float32)
            out.append(wp)
        return sum(out) + x

    def stack_mm_batched(x):
        xin = x.astype(jnp.bfloat16)
        hp = jnp.einsum("Hh,chw->cHw", a16s, xin,
                        preferred_element_type=jnp.float32)  # (c, 3H, w)
        hp = hp.reshape(C, 3, H, W).transpose(1, 0, 2, 3).astype(jnp.bfloat16)
        wp = jnp.einsum("lchw,lwW->lchW", hp, b16b,
                        preferred_element_type=jnp.float32)
        return wp.sum(0) + x

    base = scan_time("control (x+1)", lambda x: x + 1.0, img)  # noqa: F841

    def cur_stack(x):
        return sum(post.blur_stack(x, RADII))
    scan_time("CURRENT cumsum stack", cur_stack, img)

    scan_time("matmul stack f32", lambda x: stack_mm(x, a32, b32), img)
    scan_time("matmul stack bf16",
              lambda x: stack_mm(x, a16, b16, jnp.bfloat16), img)
    scan_time("matmul stack bf16 batched", stack_mm_batched, img)

    # Exactness check (f32 matmul vs cumsum stack).
    ref = sum(post.blur_stack(img, RADII))
    got32 = stack_mm(img, a32, b32)
    got16 = stack_mm(img, a16, b16, jnp.bfloat16)
    for name, got in (("f32", got32), ("bf16", got16)):
        err = float(jnp.max(jnp.abs(got - ref)) /
                    jnp.maximum(jnp.max(jnp.abs(ref)), 1e-9))
        print(f"max rel err {name}: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
