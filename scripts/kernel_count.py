"""Count device kernels per frame in the headless scan (VERDICT r2 #3).

Lowers `bench._run_scan` for a given config and counts the computations
launched inside the scan body from the optimised HLO: fusions, custom
calls (Pallas kernels / sort), and non-fused array ops. Each launch costs
~0.4 ms through this machine's device runtime regardless of size — at
small N the frame time IS the launch count (CLAUDE.md).

Usage: python scripts/kernel_count.py [root] [H] [W]
"""

import re
import sys

import jax
import jax.numpy as jnp


def main():
    root = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 720
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1280

    sys.path.insert(0, ".")
    import bench

    on_tpu = jax.default_backend() == "tpu"
    eng = bench._engine(root, (h, w), on_tpu)
    eng.state["flowWeight"] = 0.0
    params = eng.params()
    import dataclasses
    if eng.sim.force is not None:
        eng.sim = dataclasses.replace(eng.sim, force=None)

    import os

    from tendrils_tpu.engine import fast_resolve_ok
    fr = (os.environ.get("TT_FR", "auto") == "1"
          or (os.environ.get("TT_FR", "auto") == "auto"
              and fast_resolve_ok(eng.config, eng.state)))
    from tendrils_tpu.engine import flow_force_unused
    lowered = bench._run_scan.lower(eng.sim, params, eng.config,
                                    eng._view_size, jnp.float32(0.0),
                                    1000.0 / 60.0, 8, fast_resolve=fr,
                                    flow_off=flow_force_unused(eng.state))
    txt = lowered.compile().as_text()

    # The scan body is the while-loop body computation: find the while op's
    # body= attribute, then pull that computation's block.
    bm = re.search(r"while\(.*?\).*?body=%?([\w.-]+)", txt)
    if not bm:
        print("no while op found; dumping computation names:")
        for line in txt.splitlines():
            if line.endswith("{") and not line.startswith(" "):
                print("  ", line[:100])
        return
    body_name = bm.group(1)
    blocks = re.split(r"^(?=[%\w].*\{$)", txt, flags=re.M)
    body_blocks = [b for b in blocks
                   if re.match(r"^%?" + re.escape(body_name) + r"[ (]", b)]
    if not body_blocks:
        print(f"body computation {body_name} not found")
        return
    body_txt = max(body_blocks, key=len)
    print("scan body:", body_txt.splitlines()[0][:100])
    launches = []
    for line in body_txt.splitlines()[1:]:
        line = line.strip()
        # Result shapes may be tuples with spaces: `%x = (s32[..], ..) sort(`
        m = re.match(r"%?[\w.-]+ = (\([^)]*\)|\S+) (\w[\w-]*)\(", line)
        if not m:
            continue
        op = m.group(2)
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast", "reshape", "after-all", "add", "subtract",
                  "multiply", "compare", "select", "broadcast", "iota",
                  "convert", "slice", "dynamic-slice",
                  "dynamic-update-slice", "concatenate", "pad", "copy",
                  "transpose", "reduce", "and", "or", "not", "xor"):
            # Cheap scalar/bookkeeping ops usually folded; count the big
            # ones only via fusion/custom-call. But flag unfused array ops
            # on large shapes.
            shape = re.match(r"%?[\w.-]+ = (\([^)]*\)|\S+) ", line).group(1)
            if re.search(r"\d+,\d+", shape) and op in (
                    "copy", "transpose", "concatenate", "pad", "reduce",
                    "dynamic-update-slice"):
                launches.append((op, shape, line[:90]))
            continue
        if op in ("fusion", "custom-call", "sort", "while", "conditional",
                  "call", "all-reduce", "scatter", "gather", "rng",
                  "rng-bit-generator", "cholesky", "fft", "dot",
                  "convolution"):
            target = ""
            tm = re.search(r'custom_call_target="([^"]+)"', line)
            if tm:
                target = tm.group(1)
            shape = re.match(r"%?[\w.-]+ = (\([^)]*\)|\S+) ", line).group(1)
            launches.append((op + (":" + target if target else ""),
                             shape, line[:90]))
    print(f"\n{len(launches)} launch-ish ops in the scan body:")
    for op, shape, line in launches:
        print(f"  {op:34s} {shape[:44]}")


if __name__ == "__main__":
    main()
