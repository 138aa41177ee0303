"""Measure per-frame collective traffic of the two multi-chip layouts
(VERDICT r2 weak #5: the slab mode's ~0.58x ICI claim was paper math).

Lowers `parallel_frame` (replicate+psum) and `spatial_frame` (row slabs,
psum_scatter + 2-channel all-gather) on the 8-virtual-device CPU mesh and
tabulates every collective in the optimised HLO: op kind, operand shape,
and the ICI bytes it moves per device (ring model: all-reduce moves
2*(D-1)/D * bytes, reduce-scatter and all-gather (D-1)/D * bytes).

The BYTES are exact for the compiled graph (XLA's CPU and TPU SPMD
partitioner insert the same collectives for these shardings); only the
per-byte cost differs on real ICI.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/ici_bytes.py [H W]
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
               "f16": 2, "s8": 1, "u8": 1}


def collective_bytes(txt, n_dev):
    """Tabulate collectives in optimised HLO text -> (rows, total_bytes)."""
    rows = []
    total = 0.0
    for line in txt.splitlines():
        m = re.search(
            r"= (.*?) (all-reduce|reduce-scatter|"
            r"all-gather|collective-permute|all-to-all)\(", line)
        if not m:
            continue
        shapes, kind = m.group(1), m.group(2)
        shapes = re.sub(r"/\*.*?\*/", "", shapes)
        nbytes = 0
        for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", shapes):
            if dt not in DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * DTYPE_BYTES[dt]
        # Ring-model bytes per device. HLO prints each op's OUTPUT shape:
        # all-reduce in==out; reduce-scatter's output is the 1/D scattered
        # shard (full input = D * output); all-gather's output is the
        # gathered full array.
        if kind == "all-reduce":
            moved = 2 * (n_dev - 1) / n_dev * nbytes
        elif kind == "reduce-scatter":
            moved = (n_dev - 1) * nbytes
        elif kind == "all-gather":
            moved = (n_dev - 1) / n_dev * nbytes
        else:
            moved = nbytes
        rows.append((kind, nbytes, moved))
        total += moved
    return rows, total


def main():
    import dataclasses

    import numpy as np

    from tendrils_tpu import EngineConfig, Tendrils
    from tendrils_tpu.ops import spawn
    from tendrils_tpu.parallel import (make_mesh, parallel_frame, shard_sim,
                                       shard_sim_spatial, spatial_frame)

    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    root = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    cfg = EngineConfig(root_num=root, view_res=(h, w), flow_samples=2,
                       flow_rows=1, view_samples=2, splat_backend="xla",
                       gather_backend="pallas")
    eng = Tendrils(cfg)
    eng.setup()
    eng.spawn_shader(lambda p, e: spawn.ball(p, e._frag_xy, 0.6, 0.01))
    params = eng.params()
    mesh = make_mesh()
    n_dev = mesh.devices.size
    t, dt = jnp.float32(16.0), jnp.float32(16.0)

    results = {}
    for name, mk, frame in (
            ("replicate+psum", shard_sim, parallel_frame),
            ("row-slab", shard_sim_spatial, spatial_frame)):
        sim = mk(eng.sim, mesh)
        lowered = jax.jit(
            lambda s: frame(s, params, t, dt, cfg, eng._view_size, mesh)
        ).lower(sim)
        txt = lowered.compile().as_text()
        rows, total = collective_bytes(txt, n_dev)
        results[name] = total
        print(f"== {name} ({h}x{w}, {n_dev} devices) ==")
        for kind, nbytes, moved in rows:
            print(f"  {kind:20s} {nbytes/2**20:9.2f} MB shape, "
                  f"{moved/2**20:9.2f} MB moved/device")
        print(f"  TOTAL {total/2**20:.2f} MB moved per device per frame")
    if results.get("replicate+psum"):
        ratio = results["row-slab"] / results["replicate+psum"]
        print(f"\nrow-slab / replicate+psum = {ratio:.3f}x ICI bytes")


if __name__ == "__main__":
    main()
