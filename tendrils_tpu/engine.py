"""The Tendrils engine — orchestration of step / draw / spawn / resize.

TPU-native re-derivation of `src/index.js:83-458`. Where the reference owns
FBOs and issues GL passes, this engine owns a `SimState` pytree and composes
pure ops into one jitted frame function:

    frame(sim, params, time, dt):
        particles' = logic_step(particles, flow, targets)   # src/index.js:248-272
        flow'      = splat(flow, prev->curr segments, flow payload)
                                                            # src/index.js:296-303
        view'      = fade(view); view' = splat(view', render colours)
                                                            # src/index.js:317-337
ordering invariant preserved: the step reads the flow *before* the new flow is
splatted ("so particles don't respond to their own flow",
`src/index.js:297-298`) — functional dataflow makes this explicit.

All ~20 reference state fields are traced arguments (never recompiled on
change); structural settings (rootNum, resolutions, splat sample counts) are
static config and rebuilding them is `setup()`, like the reference.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from . import state as state_mod
from .const import INERT

from .ops import coords, flow as flow_ops, logic, render, spawn as spawn_ops
from .ops import splat as splat_ops
from .timer import Timer


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Static (shape/compile-affecting) engine configuration."""
    root_num: int = 512
    view_res: tuple[int, int] = (720, 1280)  # (H, W)
    flow_res: tuple[int, int] | None = None  # defaults to view_res
    num_view_buffers: int = 1  # ref demo uses numBuffers: 1
    color_map_res: tuple[int, int] = (1, 1)
    flow_levels: int = 1  # ref compiles levels=1 (src/logic.frag:39)
    # Splat sampling (static): points along each segment and across the line
    # width, per pass.
    flow_samples: int = 4
    flow_rows: int = 3
    view_samples: int = 4
    view_rows: int = 1
    splat_backend: str = "xla"
    gather_backend: str = "xla"
    # Fuse the flow+view splats into one sort+kernel (pallas backend,
    # single-device, flow_res == view_res). Line widths become post-hoc
    # blurs of the accumulation (see ops/draw_pallas.py).
    fused_draw: bool = True
    # Carry the next step's flow force in SimState: the fused draw's segment
    # sort doubles as the flow-gather binning (`draw_pallas` aux stream), so
    # the step pays no gather sort of its own. Active only on the fused
    # single-device pallas path with one flow LOD; invalidated by spawns and
    # external flow edits (the next frame gathers in-step).
    carry_force: bool = True
    # (An in-kernel logic step inside the pack kernel was built TWICE and
    # measured a loss both times: at 1M it is compute-bound and the
    # in-kernel simplex lowers worse under Mosaic than XLA fusion (19.5 vs
    # 17.4 ms/step, round 2); at 65k — the launch-floor hypothesis — it
    # was a wash-to-slight-loss (1.93 vs 1.83 ms scan-timed, round-4
    # battery D): XLA already fuses/overlaps the step chain, so there are
    # no launches to save. Deleted both times; see BENCHMARKS.md.)
    # Resident stream: the exact f32 particle state rides the fused draw's
    # segment sort, so the SORTED order becomes the next frame's row order.
    # The force un-sort (a whole second lax.sort crossing, ~4.7 ms at 1M)
    # and its q15 quantisation disappear — the gather's output order IS row
    # order. Row identity lives in `sim.idx` as before. Hot fused frame
    # path only (step immediately before draw). Default ON: with the
    # stray-key fix (`_pack_core(key_recon=True)`), the p1/q15 in-kernel
    # keyed gathers and the fused `reconstruct_resident` tail it measures
    # 14.6-14.9 vs 17.2-17.6 ms/step at 1M/1080p on v5e (an earlier cut
    # without those measured 19.6 — see BENCHMARKS.md round-3 ledger).
    resident_stream: bool = True
    # Merge reorder: restore the resident stream's sorted row order by
    # merging the ~6-9 %/frame churned rows instead of re-sorting all N
    # (`ops/reorder_pallas.py`; falls back to the flat sort in-frame
    # whenever its guards trip). OFF until the end-to-end measurement
    # lands (BENCHMARKS.md round-5 reorder entries).
    merge_reorder: bool = False

    @property
    def n(self) -> int:
        return self.root_num * self.root_num

    @property
    def flow_shape(self) -> tuple[int, int]:
        return self.flow_res if self.flow_res is not None else self.view_res


def default_params() -> dict[str, Any]:
    """Traced-parameter schema (the reference `defaults().state` minus
    structural fields) — ref `src/index.js:29-66`."""
    st = state_mod.default_state()
    p = state_mod.params_from_state(st)
    # autoClearView / autoFade become traced 0/1 gates so presets can toggle
    # them without recompiling.
    p["autoClearView"] = jnp.float32(0.0)
    p["autoFade"] = jnp.float32(1.0)
    return p


# --- Pure frame functions ---------------------------------------------------


def flow_pyramid(flow_grid, levels):
    """LOD pyramid for multi-level flow sampling (ref
    `flow-at-screen-pos.glsl` levels loop; reference ships with levels=1 and
    mipmaps disabled, `src/index.js:305-312`)."""
    grids = [flow_grid]
    g = flow_grid
    for _ in range(1, levels):
        c, h, w = g.shape
        g = g.reshape(c, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
        grids.append(g)
    return grids


def carry_enabled(cfg: EngineConfig) -> bool:
    """Whether the carried-force fast path is active (see
    `EngineConfig.carry_force`)."""
    return (cfg.carry_force and cfg.fused_draw
            and cfg.splat_backend == "pallas"
            and cfg.gather_backend == "pallas"
            and cfg.flow_levels == 1
            and cfg.flow_shape == cfg.view_res)


def resident_enabled(cfg: EngineConfig) -> bool:
    """Whether the hot frame runs in resident-stream mode (state rides the
    draw sort; see `EngineConfig.resident_stream`)."""
    return carry_enabled(cfg) and cfg.resident_stream


def merge_reorder_enabled(cfg: EngineConfig) -> bool:
    """Whether resident frames restore sortedness via the merge reorder
    (see `EngineConfig.merge_reorder`; size gates mirror
    `fused_draw_accumulate`'s)."""
    return (cfg.merge_reorder and resident_enabled(cfg)
            and cfg.n % 4096 == 0 and cfg.n >= 8192)


def seed_sort_carry(sim: state_mod.SimState,
                    cfg: EngineConfig) -> state_mod.SimState:
    """(Re)seed the merge-reorder carry. The all-MAXKEY previous key
    makes every row count as churned on the next frame, tripping the
    merge's capacity guard into the flat-sort fallback — which then
    re-establishes a valid carry. Structure-stable (arrays, not None), so
    scans and jit caches never see a pytree change."""
    from .ops.draw_pallas import seg_tile_count
    from .ops.reorder_pallas import MAXKEY
    return dataclasses.replace(
        sim, sort_key=jnp.full((cfg.n,), MAXKEY, jnp.int32),
        sort_hist=jnp.zeros((seg_tile_count(cfg.view_res),), jnp.int32))


def fast_resolve_ok(cfg: EngineConfig, src=None) -> bool:
    """Whether the fused Pallas resolve can run: fused pallas draw path, an
    aligned grid, and host-known line widths within the in-kernel budget
    (`src`: the engine's host-side state dict or a concrete params dict —
    traced/abstract values disable the fast path)."""
    from .ops.draw_pallas import KMAX_WIDTH, resolve_eligible
    h, w = cfg.view_res
    if not (cfg.fused_draw and cfg.splat_backend == "pallas"
            and cfg.flow_shape == cfg.view_res
            and resolve_eligible(h, w)):
        return False
    if src is None:
        return False
    try:
        fw = float(src.get("flowWidth", 1.0))
        lw = float(src.get("lineWidth", 1.0))
    except (TypeError, jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError):
        return False
    return max(fw, lw, 1.0) <= KMAX_WIDTH


def flow_force_unused(src) -> bool:
    """Host-known `flowWeight == 0`: the logic's flow-force term is exactly
    zero (parameter variance is multiplicative — `vary(0, ·, ·) == 0`, ref
    `src/logic.frag:41-43`), so the frame skips the flow gather, the
    carried-force machinery and the end-of-frame force gather entirely
    (~0.2 ms of a 1.35 ms frame at config 1's 65k scale). Like
    `fast_resolve_ok`, this is a trace-time policy read from the host-side
    state dict: flipping flowWeight between zero and nonzero retraces once.
    Traced/abstract values keep the general path."""
    if src is None:
        return False
    try:
        return float(src.get("flowWeight", 1.0)) == 0.0
    except (TypeError, ValueError, jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError):
        return False


def force_from_aux(flow, aux, params, read_time, cfg: EngineConfig,
                   unsort=True, n=None, eff=None):
    """Gather the next step's flow force from the CURRENT flow grid using
    the fused draw's segment-sorted aux stream — no sort on the way in (the
    stream is already tile-binned), one 3-operand un-sort on the way out.

    With `unsort=False` (resident-stream mode) the sorted order IS the new
    row order: the gather's exact f32 output is returned directly (pad rows
    sort to the tail and slice off) — no second sort crossing, no q15
    quantisation.

    `read_time` is the next frame's time (fixed-step exact; wall-clock
    timers approximate decay age by one frame — the payload stamps make the
    error `(dt_err · flowDecay · vel)`, far below force scale).

    `n`: row count of the force to return — defaults to `cfg.n`; sharded
    callers pass their LOCAL particle count (aux ids are local rows).

    `eff`: pre-decayed flow `f32[2, H, W]` (the fused Pallas resolve emits
    it at `read_time`) — skips the full-grid decay pass here. Only valid
    when `flow` hasn't been edited since the draw that produced it."""
    from .ops.draw_pallas import HALF, pos_scale_for
    from .ops.gather_pallas import (bilinear_gather_keyed_p1,
                                    bilinear_gather_keyed_q15)

    gidx_s, gkey_s, p1_s = aux
    h, w = cfg.flow_shape
    inv_p = 1.0 / pos_scale_for((h, w))
    if eff is None:
        eff = flow[:2] * jnp.maximum(
            0.0, 1.0 - (read_time - flow[2]) * params["flowDecay"])[None]
    n = cfg.n if n is None else n
    sl = jnp.maximum(params["speedLimit"], 1e-12)
    if unsort:
        # Un-sort with ONE value operand: the two force components ride a
        # 15+15-bit fixed-point word over ±speedLimit (|flow payload| <=
        # speedLimit by construction; quantisation ~3e-5 of the force
        # scale). The keyed gather unpacks p1, CLAMP_TO_EDGEs and q15
        # -packs entirely in-kernel — the packed draw stream goes in, the
        # un-sort's packed operand comes out, nothing else touches HBM.
        packed = bilinear_gather_keyed_q15(eff, p1_s, gkey_s, 1.0 / sl,
                                           inv_p=inv_p)
        # Row ids are unique — no stability needed (a stable sort would
        # add a hidden iota tiebreaker operand).
        _, pk = jax.lax.sort([gidx_s, packed], num_keys=1, is_stable=False)

        def unq(q):
            return (q.astype(jnp.float32) * (2.0 / HALF) - 1.0) * sl

        return jnp.stack([unq(pk[:n] & HALF), unq(pk[:n] >> 15)])
    # Resident-stream mode keeps the exact f32 gather (sorted order IS the
    # new row order — no quantisation on the way back); in-kernel p1
    # unpack, like the q15 path.
    f = bilinear_gather_keyed_p1(eff, p1_s, gkey_s, inv_p=inv_p)
    return f[:, :n]


def initial_force(sim: state_mod.SimState, params, cfg: EngineConfig,
                  view_size, read_time):
    """Standalone flow-force gather at current positions (used to seed the
    carried force before a scan, mirroring the in-step pallas gather)."""
    from .ops.gather_pallas import bilinear_gather
    h, w = cfg.flow_shape
    pos = sim.particles[:2]
    eff = sim.flow[:2] * jnp.maximum(
        0.0, 1.0 - (read_time - sim.flow[2]) * params["flowDecay"])[None]
    u0 = (pos[0] * view_size[0]) * 0.5 + 0.5
    u1 = (pos[1] * view_size[1]) * 0.5 + 0.5
    return bilinear_gather(eff, u0 * w, u1 * h)


def step_sim(sim: state_mod.SimState, params, time, dt, cfg: EngineConfig,
             view_size, flow_off=False):
    """Logic step + ping-pong — ref `src/index.js:248-272` +
    `src/particles.js:123-145`.

    `flow_off=True` (host-known `flowWeight == 0`, see `flow_force_unused`):
    the logic's flow term is exactly zero — parameter variance is
    multiplicative (ref `src/logic.frag:41-43`) — so the flow sampling is
    skipped entirely (no decay pass, no gather)."""
    uv, index01, _ = state_mod.particle_coords_from_idx(sim.idx,
                                                        cfg.root_num)
    if cfg.gather_backend not in ("xla", "pallas"):
        raise ValueError(f"unknown gather backend: {cfg.gather_backend}")
    flow_force_fn = None
    if flow_off:

        def flow_force_fn(pos_screen):
            del pos_screen
            return jnp.float32(0.0)

        flows = None
    elif sim.force is not None:
        # Carried force: pre-gathered at the end of the previous frame from
        # the final flow grid at these exact positions (see `force_from_aux`)
        # — no gather at all here. Consumed once: positions move this step,
        # so the output state carries None until the next draw repopulates.
        force = sim.force

        def flow_force_fn(pos_screen):
            del pos_screen
            return force

        flows = None
    elif cfg.gather_backend == "pallas":
        # Fast path: decay the whole flow grid once (elementwise), then
        # gather only the 2 effective-velocity channels. Decay is linear in
        # the stamp away from the max() clamp, so decay-then-interpolate
        # matches the reference's interpolate-then-decay
        # (`src/flow/get.glsl:3-5`) except at stale/live texel mixes where
        # both are ~0; the XLA backend keeps the exact order.
        from .ops.gather_pallas import bilinear_gather

        eff = sim.flow[:2] * jnp.maximum(
            0.0, 1.0 - (time - sim.flow[2]) * params["flowDecay"])[None]
        eff_pyr = flow_pyramid(eff, cfg.flow_levels)

        def flow_force_fn(pos_screen):
            u = pos_screen * 0.5 + 0.5
            force = 0.0
            total = 0.0
            for level, grid in enumerate(eff_pyr):
                _, h, w = grid.shape
                factor = 1.0 / (level + 1.0)
                force = force + bilinear_gather(
                    grid, u[..., 0] * w, u[..., 1] * h,
                    ) * factor
                total = total + factor
            return force / total

        flows = None
    else:
        flows = flow_pyramid(sim.flow, cfg.flow_levels)

    new_particles = logic.step_particles(
        sim.particles, flows, sim.targets, params, uv, index01, view_size,
        time, dt, sample_fn=None, flow_force_fn=flow_force_fn)
    return dataclasses.replace(sim, particles=new_particles,
                               previous=sim.particles, force=None)


def draw_sim(sim: state_mod.SimState, params, time, cfg: EngineConfig,
             view_size, axis_name=None, want_aux=False, resident=False,
             targets_live=True, stepped=False, fast_resolve=False,
             read_time=None, want_eff=False, want_force=False,
             flow_off=False):
    """Flow + view render passes — ref `src/index.js:278-340`.

    With `axis_name` set (data-parallel shard_map over particles), the splat
    partial sums are `psum`'d across shards before the blend resolve — the
    sim's only collective (SURVEY §2.9).

    `want_aux=True` (fused carry path only) additionally returns the
    flow-gather aux stream `(idx_s, gkey_s, p1_s)`, used by the frame
    functions to pre-gather the next step's flow force AFTER any flow
    injections (`force_from_aux`).

    `stepped=True`: a logic step immediately preceded this draw in the same
    trace, so `p1 = p0 + vel·viewScale` holds exactly — the p0 sort operand
    is dropped and reconstructed in the splat kernel (`derive_p0`), and a
    1x1 colour map moves the whole render colour model in-kernel too
    (`scalar_color`), cutting the hot segment sort from 5 to 3 operands.
    Standalone `draw()` (paused timer, no preceding step) must pass False.

    `fast_resolve=True` (single-device fused path, in-kernel line widths,
    aligned grid — the facade checks `draw_pallas.resolve_eligible` and the
    host-side widths): the whole XLA resolve tail (pad slice, widen,
    composite, autoClear + fade) runs as ONE Pallas pass. With
    `want_eff=True` that pass also emits the decayed flow at `read_time`
    and the return becomes `(sim', aux, eff)` — feed `eff` to
    `force_from_aux` (only valid when nothing injects into the flow before
    the gather).

    `resident=True` (hot frame path only — a step must immediately precede
    this draw): the exact f32 particle state rides the segment sort, and
    the returned sim is permuted into tile-sorted row order — `sim.idx`
    tracks identity, the aux stream (and hence the carried force) comes
    back already row-aligned, and the force un-sort disappears. `previous`
    is reconstructed as `pos - vel` (exact inverse of the step's Euler
    integrate for alive rows, ~1 ulp); its velocity half is approximated by
    the CURRENT velocity — consumed only by the stochastic target-spawn
    scorers, documented deviation. With `targets_live=False` (engine knows
    no targets were ever spawned) the targets buffer doesn't ride and is
    re-emitted as zeros.

    `want_force=True` (resident path only — raises otherwise, so callers
    can't silently lose the carried force, ADVICE r3): the carried flow
    force is gathered INSIDE the draw by one fused Pallas pass
    (`gather_reconstruct_p1` — keyed gather + state reassembly over the
    same sorted streams) and returned already set on `sim.force`; the
    return is always `(sim', aux)` and the caller skips `force_from_aux`.
    Works under shard_map: the gather reads the replicated post-psum flow
    with this shard's local streams."""
    pos = sim.particles[:2]
    vel = sim.particles[2:]
    prev_pos = sim.previous[:2]
    _, _, colormap_uv = state_mod.particle_coords_from_idx(sim.idx,
                                                           cfg.root_num)

    alive = ((pos[0] != INERT) | (pos[1] != INERT)) & \
            ((prev_pos[0] != INERT) | (prev_pos[1] != INERT))
    live = alive.astype(jnp.float32)

    def psum(parts):
        if axis_name is None:
            return parts
        return jax.lax.psum(parts, axis_name)

    # Segment endpoints in window pixels of each target grid.
    p_clip0 = jnp.stack([prev_pos[0] * view_size[0],
                         prev_pos[1] * view_size[1]], axis=-1)
    p_clip1 = jnp.stack([pos[0] * view_size[0], pos[1] * view_size[1]],
                        axis=-1)

    # Fused fast path: both passes in one sort + one Pallas kernel. Under
    # shard_map the per-shard accumulated parts are psum'd before the
    # resolve (the deposit channels are order-independent sums).
    if (cfg.fused_draw and cfg.splat_backend == "pallas"
            and cfg.flow_shape == cfg.view_res):
        from .ops import sample
        from .ops.draw_pallas import fused_draw
        h, w = cfg.view_res
        # Colour-map lookup (XLA side; the rest of the render colour model
        # runs inside the pack kernel). When a step immediately preceded
        # this draw (`stepped`/resident), the p0 operand is derived
        # in-kernel; a 1x1 map then also skips the per-particle lookup —
        # the splat kernel gets the four scalars and computes colours
        # in-kernel (two fewer sort operands on the hot path).
        resident = resident and want_aux
        if want_force and not resident:
            raise ValueError(
                "want_force requires the resident fused path (resident=True"
                " with want_aux) — the caller would otherwise silently get"
                " sim.force=None (ADVICE r3)")
        # (A TT_DERIVE flag once enabled derive_p0 + in-kernel colours on
        # the CLASSIC path too; measured 2026-08-19 with key_recon keys:
        # 14.94 ms vs resident 13.63 ms at 1M/1080p — resident strictly
        # wins, flag deleted per VERDICT r3 #6.)
        derive = resident
        scalar_map = derive and cfg.color_map_res == (1, 1)
        mapped = None
        mapped_scalar = None
        if scalar_map:
            mapped_scalar = sim.color_map[:, 0, 0] * params["colorMapAlpha"]
        else:
            mapped = sample.sample_uv(sim.color_map, colormap_uv.T) \
                * params["colorMapAlpha"]
        p0 = coords.clip_to_pixel(p_clip0, (w, h))
        p1 = coords.clip_to_pixel(p_clip1, (w, h))

        # The Pallas resolve applies autoClear + fade IN-KERNEL; the XLA
        # tail pre-applies them here. Under shard_map the RAW accumulator
        # is psum'd before the fused resolve (see `fused_draw`), so the
        # sharded frame runs the same fast resolve.
        presolve = fast_resolve
        view0 = sim.view[0]
        if not presolve:
            view0 = view0 * (1.0 - params["autoClearView"])
            view0 = render.fade_fill(view0, params["fadeColor"]
                                     * params["autoFade"])
        # The aux id is the ROW number (not sim.idx — rows may be resident
        # -permuted): the carried force must realign to current row order.
        # In resident mode the aux id is sim.idx itself (the sorted ids
        # BECOME the new sim.idx) and no realignment happens at all.
        n_local = pos.shape[1]
        ride = None
        idx_arg = None
        reorder_arg = None
        if resident and sim.sort_key is not None:
            # Merge-reorder carry: the key stream the CURRENT row order is
            # sorted by + its tile histogram (seeded MAXKEY -> first frame
            # flat-sorts and establishes it; see `seed_sort_carry`).
            reorder_arg = (sim.sort_key, sim.sort_hist)
        if resident:
            # Only the exact f32 POSITIONS ride the sort; the new velocity
            # is reconstructed from the splat stream's q15 fields (the same
            # quantisation the classic path's carried force crossed), and
            # inert targets don't ride at all (the buffer passes through
            # loop-invariant). Keeps the hot sort at 5 operands (the
            # quantised p1 word is recomputed post-sort from the riding
            # positions, `_bin_and_splat(p1_from_ride=...)`).
            idx_arg = sim.idx
            ride = [sim.particles[0], sim.particles[1]]
            if targets_live:
                ride += [sim.targets[0], sim.targets[1]]
        elif want_aux:
            idx_arg = jnp.arange(n_local, dtype=jnp.int32)
        want_eff = want_eff and presolve and want_aux
        out = fused_draw(
            sim.flow, view0, p0, p1, vel, pos, mapped, live, params, time,
            grid_hw=(h, w), samples=cfg.view_samples,
            idx=idx_arg, ride=ride,
            # Resident rows carry GLOBAL ids (a sharded frame's local
            # stream may hold ids up to cfg.n) — bound them explicitly so
            # the combined 20-bit key packing stays sound.
            idx_bound=(cfg.n if resident else None),
            derive_p0=derive, view_size=(view_size if derive
                                         else None),
            mapped_scalar=mapped_scalar,
            resolve=("pallas" if presolve else "xla"),
            read_time=read_time, want_eff=want_eff, flow_off=flow_off,
            reorder=reorder_arg,
            psum=(None if axis_name is None
                  else functools.partial(jax.lax.psum,
                                         axis_name=axis_name)))
        carry_out = None
        if reorder_arg is not None:
            carry_out = out[-1]
            out = out[:-1]
            if carry_out is None:
                # The accumulate-level gate rejected the merge (pads /
                # non-tile-prefixed keys) — re-seed so the carry's pytree
                # structure stays fixed and the next frame falls back.
                from .ops.reorder_pallas import MAXKEY
                carry_out = (jnp.full_like(sim.sort_key, MAXKEY),
                             jnp.zeros_like(sim.sort_hist))
        eff = out[-1] if want_eff else None
        new_flow, view0 = out[:2]
        if resident:
            from .ops.draw_pallas import pos_scale_for, reconstruct_resident
            aux, ride_s = out[2], out[3]
            n = n_local
            # One-pass state reassembly: new velocity from the sorted splat
            # stream's q15 fields (quantisation ~3e-5 of speedLimit — the
            # scale the classic carried force already crossed; the live bit
            # rides bit 30), prev = pos - vel for live rows.
            sl = jnp.maximum(params["speedLimit"], 1e-12)
            force = None
            if want_force:
                # Fused frame tail: the keyed carried-force gather and the
                # reconstruction walk the SAME sorted streams — one Pallas
                # pass does both (launch + one HBM crossing of the streams
                # saved; `force_from_aux` never runs). Valid under
                # shard_map too: `eff`/`new_flow` are replicated
                # (post-psum), and the gather walks this shard's LOCAL
                # sorted streams.
                from .ops.gather_pallas import gather_reconstruct_p1
                assert read_time is not None
                if eff is None:
                    eff = new_flow[:2] * jnp.maximum(
                        0.0, 1.0 - (read_time - new_flow[2])
                        * params["flowDecay"])[None]
                rec = gather_reconstruct_p1(
                    eff, aux[2], aux[1], ride_s[0], ride_s[1], ride_s[-1],
                    sl, *((ride_s[2], ride_s[3]) if targets_live
                          else (None, None)),
                    inv_p=1.0 / pos_scale_for((h, w)))
                force = rec[0][:, :n]
                rec = rec[1:]
            else:
                rec = reconstruct_resident(
                    ride_s[0], ride_s[1], ride_s[-1], sl,
                    *((ride_s[2], ride_s[3]) if targets_live
                      else (None, None)))
            particles = rec[0][:, :n]
            prev = rec[1][:, :n]
            if targets_live:
                targets = rec[2][:, :n]
            else:
                # Inert targets: pass through untouched (all-zero content
                # is permutation-invariant, and a loop-invariant carry
                # costs nothing under lax.scan).
                targets = sim.targets
            new_sim = dataclasses.replace(
                sim, particles=particles, previous=prev, targets=targets,
                idx=aux[0][:n], flow=new_flow,
                view=sim.view.at[0].set(view0))
            if carry_out is not None:
                new_sim = dataclasses.replace(
                    new_sim, sort_key=carry_out[0],
                    sort_hist=carry_out[1])
            if force is not None:
                return dataclasses.replace(new_sim, force=force), aux
            if want_eff:
                return new_sim, aux, eff
            return new_sim, aux
        new_sim = dataclasses.replace(sim, flow=new_flow,
                                      view=sim.view.at[0].set(view0))
        if want_eff:
            return new_sim, out[2], eff
        if want_aux:
            return new_sim, out[2]
        return new_sim

    # --- Flow pass (ref src/index.js:296-303): payload alpha-blended into
    # the flow grid, which is NOT cleared (accumulates, decays on read).
    fh, fw = cfg.flow_shape
    payload = flow_ops.flow_payload(vel, time, params["speedLimit"])  # [4,N]
    f0 = coords.clip_to_pixel(p_clip0, (fw, fh))
    f1 = coords.clip_to_pixel(p_clip1, (fw, fh))
    flow_parts = splat_ops.splat_segments_accumulate(
        f0, f1, payload, payload[3] * live,
        grid_hw=(fh, fw), width=params["flowWidth"],
        samples=cfg.flow_samples, rows=cfg.flow_rows,
        backend=cfg.splat_backend)
    new_flow = splat_ops.composite_over(sim.flow, *psum(flow_parts))

    # --- View pass (ref src/index.js:317-337): optional clear, fade, then
    # particle render colours alpha-blended into view buffer 0.
    h, w = cfg.view_res
    view0 = sim.view[0]
    view0 = view0 * (1.0 - params["autoClearView"])
    fade_color = params["fadeColor"] * params["autoFade"]
    view0 = render.fade_fill(view0, fade_color)

    colors = render.particle_colors(pos, vel, colormap_uv, sim.color_map,
                                    params, time)
    v0 = coords.clip_to_pixel(p_clip0, (w, h))
    v1 = coords.clip_to_pixel(p_clip1, (w, h))
    view_parts = splat_ops.splat_segments_accumulate(
        v0, v1, colors, colors[3] * live,
        grid_hw=(h, w), width=params["lineWidth"],
        samples=cfg.view_samples, rows=cfg.view_rows,
        backend=cfg.splat_backend)
    view0 = splat_ops.composite_over(view0, *psum(view_parts))

    new_view = sim.view.at[0].set(view0)
    return dataclasses.replace(sim, flow=new_flow, view=new_view)


# --- Stateful engine --------------------------------------------------------


class Tendrils:
    """Stateful engine facade mirroring the reference class API
    (`src/index.js:83`): `setup/reset/restart/step/draw/spawn/spawnShader/
    clear*/drawFade/resize` — with a functional jitted core underneath."""

    def __init__(self, config: EngineConfig | None = None, *,
                 timer: Timer | None = None, seed: int = 0, **overrides):
        self.config = config or EngineConfig(**overrides)
        # Live-tweakable parameter dict (host-side mirror of
        # `defaults().state`); converted to traced f32 leaves per call.
        self.state = state_mod.default_state()
        self.timer = timer or Timer()
        if timer is None:
            self.timer.step = 1000.0 / 60.0  # ref src/index.js:67
        self.seed = seed
        self.sim: state_mod.SimState | None = None
        self._pcache = {}  # params() device-scalar cache (see params())
        self._setup_static()

    # -- setup / teardown

    def _setup_static(self):
        cfg = self.config
        h, w = cfg.view_res
        self._view_size = jnp.asarray(coords.cover_aspect((w, h)),
                                      jnp.float32)
        # Whether the targets buffer may hold live data (a target spawn ran
        # since setup). While False, the resident-stream frame skips riding
        # the targets rows through the segment sort entirely.
        self._targets_live = False

    # Per-particle constants derive from the (possibly resident-sorted) row
    # permutation `sim.idx` — see `state.particle_coords_from_idx`.
    @property
    def _uv(self):
        return state_mod.particle_coords_from_idx(
            self.sim.idx, self.config.root_num)[0]

    @property
    def _index01(self):
        return state_mod.particle_coords_from_idx(
            self.sim.idx, self.config.root_num)[1]

    @property
    def _colormap_uv(self):
        return state_mod.particle_coords_from_idx(
            self.sim.idx, self.config.root_num)[2]

    @property
    def _frag_xy(self):
        return self._uv * self.config.root_num  # texel-centre frag coords

    def _check_force_params(self):
        """Invalidate the carried flow force if the params it baked
        (flowDecay and the speedLimit q15 clamp — see `force_from_aux`)
        changed host-side since it was gathered (ADVICE r2: param edits
        were applied one frame late and could clip the force)."""
        key = (float(self.state.get("flowDecay", 0.0)),
               float(self.state.get("speedLimit", 0.0)))
        if self.sim is not None and self.sim.force is not None \
                and key != getattr(self, "_force_key", key):
            self.sim = dataclasses.replace(self.sim, force=None)
        self._force_key = key

    def setup(self, root_num: int | None = None):
        """(Re)allocate particle + grid state — ref `src/index.js:149-154`."""
        if root_num is not None and root_num != self.config.root_num:
            self.config = dataclasses.replace(self.config,
                                              root_num=int(root_num))
            self.state["rootNum"] = int(root_num)
            self._setup_static()
        cfg = self.config
        self.sim = state_mod.make_state(
            cfg.root_num, cfg.view_res, cfg.num_view_buffers,
            cfg.color_map_res, self.seed, cfg.flow_shape)
        self.reseed_derived()
        self.reset()
        return self

    def reset(self):
        """Respawn all-inert — ref `src/index.js:156-160`."""
        return self.spawn()

    def reseed_derived(self):
        """Re-seed derived SimState caches after an external state swap
        (setup, resize, checkpoint load): the merge-reorder carry gets its
        MAXKEY seed (next frame flat-sorts and re-establishes it); the
        carried force stays as-is/None. Keeps the carry's tile-count in
        sync with the view geometry."""
        if self.sim is not None:
            if merge_reorder_enabled(self.config):
                self.sim = seed_sort_carry(self.sim, self.config)
            elif self.sim.sort_key is not None:
                self.sim = dataclasses.replace(self.sim, sort_key=None,
                                               sort_hist=None)
        return self

    def restart(self):
        """Clear + reset — ref `src/index.js:241-246`."""
        self.clear()
        return self.reset()

    # -- clears (ref src/index.js:215-239)

    def clear(self):
        return self.clear_view().clear_flow()

    def clear_view(self):
        self.sim = dataclasses.replace(self.sim,
                                       view=jnp.zeros_like(self.sim.view))
        return self

    def clear_flow(self):
        self.sim = dataclasses.replace(self.sim,
                                       flow=jnp.zeros_like(self.sim.flow),
                                       force=None)
        return self

    # -- parameters

    def params(self):
        """Traced-parameter view of `state`, with per-key device caching.

        Each `jnp.asarray` is a device put — ~1.8 ms of host time EACH
        through the axon tunnel, so converting all ~24 params every frame
        cost ~42 ms/frame of pure dispatch overhead on every interactive
        path (measured 2026-08-19; the scan paths convert once and never
        saw it). Keep the converted scalar per key and re-upload only
        when the host value changed (keyed on value bytes, so in-place
        list mutation is caught)."""
        cache = self._pcache
        out = {}
        for k, v in self.state.items():
            if k in state_mod._STATIC_KEYS:
                continue
            hv = np.asarray(v, np.float32)
            hk = (hv.shape, hv.tobytes())
            ent = cache.get(k)
            if ent is None or ent[0] != hk:
                ent = (hk, jnp.asarray(hv))
                cache[k] = ent
            out[k] = ent[1]
        acv = 1.0 if self.state.get("autoClearView") else 0.0
        afd = 1.0 if self.state.get("autoFade", True) else 0.0
        for k, val in (("autoClearView", acv), ("autoFade", afd)):
            ent = cache.get(k)
            if ent is None or ent[0] != val:
                ent = (val, jnp.float32(val))
                cache[k] = ent
            out[k] = ent[1]
        return out

    def _cached_scalars(self, key, vals):
        """Device-cached tuple of f32 scalars (same rationale as
        `params()` — each fresh `jnp.float32` is a tunnel put)."""
        tv = tuple(float(v) for v in vals)
        ent = self._pcache.get(key)
        if ent is None or ent[0] != tv:
            ent = (tv, tuple(jnp.float32(v) for v in tv))
            self._pcache[key] = ent
        return ent[1]

    def _blur_mats(self, radii):
        """Device-cached MXU blur-stack operators for the current view res
        (`post.blur_stack_matrices`). They ride the io frame as jit
        ARGUMENTS: embedded as constants the 3840² literal (~59 MB at 4K)
        overflows the axon tunnel's remote_compile upload (HTTP 413)."""
        from .ops import post as post_ops
        key = ("_bmats", self.config.view_res, tuple(radii))
        ent = self._pcache.get(key)
        if ent is None:
            ent = post_ops.blur_stack_matrices(self.config.view_res,
                                               tuple(radii))
            self._pcache[key] = ent
        return ent

    # -- per-frame API

    def step(self):
        """Ref `src/index.js:248-272` (honours timer pause)."""
        self._check_force_params()
        if not self.timer.paused:
            self.sim = _step_jit(self.sim, self.params(),
                                 jnp.float32(self.timer.time),
                                 jnp.float32(self.timer.dt), self.config,
                                 self._view_size,
                                 flow_off=flow_force_unused(self.state))
        return self

    def draw(self):
        """Ref `src/index.js:278-340`."""
        self.sim = _draw_jit(self.sim, self.params(),
                             jnp.float32(self.timer.time),
                             jnp.float32(self.timer.dt), self.config,
                             self._view_size,
                             flow_off=flow_force_unused(self.state))
        return self

    def step_draw(self):
        """step + draw in ONE device dispatch (no timer tick) — for hosts
        that tick timers themselves (the demo loop); halves per-frame
        dispatch latency on remote devices."""
        self._check_force_params()
        if self.timer.paused:
            return self.draw()
        self.sim = _frame_jit(self.sim, self.params(),
                              jnp.float32(self.timer.time),
                              self._cached_scalars(
                                  "_dt", (self.timer.dt,))[0], self.config,
                              self._view_size,
                              targets_live=self._targets_live,
                              fast_resolve=fast_resolve_ok(self.config,
                                                           self.state),
                              flow_off=flow_force_unused(self.state))
        return self

    def frame(self):
        """tick + step + draw — one fused jitted frame (the hot loop)."""
        self.timer.tick()
        self._check_force_params()
        if self.timer.paused:
            return self.draw()
        self.sim = _frame_jit(self.sim, self.params(),
                              jnp.float32(self.timer.time),
                              self._cached_scalars(
                                  "_dt", (self.timer.dt,))[0], self.config,
                              self._view_size,
                              targets_live=self._targets_live,
                              fast_resolve=fast_resolve_ok(self.config,
                                                           self.state),
                              flow_off=flow_force_unused(self.state))
        return self

    # -- spawning

    def spawn(self, spawner=None):
        """CPU-spawner equivalent: replace both ping-pong buffers — ref
        `src/index.js:425-429` + `src/particles.js:94-117`. `spawner` is a
        pure `f32[4, N] -> f32[4, N]` function (default: all-inert init)."""
        fn = spawner or spawn_ops.init
        particles = fn(self.sim.particles)
        self.sim = dataclasses.replace(self.sim, particles=particles,
                                       previous=particles, force=None)
        return self

    def spawn_shader(self, op, target=None):
        """GPU-respawn equivalent — ref `src/index.js:432-457`.

        `op(prev_particles, engine) -> f32[4, N]` is a pure spawn op. With no
        `target`, rotates the ping-pong and replaces the current state
        (reading the pre-spawn current, like the rotated `buffers[1]` bind in
        `src/particles.js:128-143`); with `target="targets"` writes the
        targets buffer without rotating (reading `previous`, the un-rotated
        `buffers[1]`)."""
        self.timer.tick()
        if target is None:
            new = op(self.sim.particles, self)
            self.sim = dataclasses.replace(self.sim, particles=new,
                                           previous=self.sim.particles,
                                           force=None)
        elif target == "targets":
            new = op(self.sim.previous, self)
            self.sim = dataclasses.replace(self.sim, targets=new)
            self._targets_live = True
        else:
            raise ValueError(f"unknown spawn target: {target}")
        return self

    # -- flow injection (flow lines, optical flow)

    @staticmethod
    def _bucket_segments(p0_pix, p1_pix, vel):
        """Pad the segment count to a power-of-2 bucket so a growing pointer
        path doesn't recompile every frame (pad segments are zero-velocity
        -> zero payload weight -> no deposit). Floor of 256 keeps typical
        pointer paths (with crest-row expansion) to one compilation."""
        n = int(np.shape(p0_pix)[0])
        bucket = 1 << max(8, (n - 1).bit_length())
        pad = bucket - n
        p0_pix = np.pad(np.asarray(p0_pix, np.float32), ((0, pad), (0, 0)))
        p1_pix = np.pad(np.asarray(p1_pix, np.float32), ((0, pad), (0, 0)))
        vel = np.pad(np.asarray(vel, np.float32), ((0, 0), (0, pad)))
        return p0_pix, p1_pix, vel

    def inject_flow_segments(self, p0_pix, p1_pix, vel, width_px,
                             samples=None):
        """Splat velocity-painting segments into the flow grid — the TPU
        equivalent of drawing FlowLine ribbons into the flow FBO
        (`demo.main.js:1107-1122`). `vel`: `f32[2, S]` velocities in the
        flow-payload convention."""
        if int(np.shape(p0_pix)[0]) == 0:
            return self
        p0_pix, p1_pix, vel = self._bucket_segments(p0_pix, p1_pix, vel)
        new_flow = _inject_flow(
            self.sim.flow, jnp.asarray(p0_pix), jnp.asarray(p1_pix),
            jnp.asarray(vel), jnp.float32(max(width_px, 1.0)),
            self.params(), jnp.float32(self.timer.time), self.config,
            samples=samples or self.config.flow_samples)
        # The carried force (if any) predates this flow edit.
        self.sim = dataclasses.replace(self.sim, flow=new_flow, force=None)
        return self

    def step_draw_io(self, *, color_maps=None, color_alphas=None,
                     segments=None, of_frames=None, of_uniforms=None,
                     blur=None, bokeh=None):
        """The whole interactive frame in ONE device dispatch (no timer
        tick, like `step_draw`): optional colour-map blend, step + draw,
        optional pointer flow-line injection, optional optical-flow
        composite, optional vignette-blur post. This is the reference's full
        per-frame stack (`demo.main.js:1024-1161`) as a single jit —
        on a remote-tunnelled device the latency win is ~24 ms per avoided
        dispatch.

        `color_maps`: sequence of `f32[4, h, w]` grids blended into the
        colour map with `color_alphas` weights (ref `demo.main.js:1070-1079`);
        `segments`: `(p0_pix, p1_pix, vel, width_px)` pointer ribbons;
        `of_frames`: `(current, last)` optical-flow frame grids with
        `of_uniforms` dict (offset/lambda/speed); `blur`: `(radius, limit)`;
        `bokeh`: `(radius, amount)` — the reference's other screen pass
        (`src/screen/bokeh.frag`), applied after `blur` when both are set.
        Returns the post-processed screen image (or None without a post
        stage).

        While the timer is paused only the STEP stage is skipped — colour
        maps, pointer flow segments and optical-flow frames still land (the
        reference keeps drawing flow-line/optical-flow input into the flow
        FBO every frame, `demo.main.js:1107-1160`; ADVICE r2).
        """
        self._check_force_params()
        cm = None
        if color_maps is not None:
            cm = tuple(jnp.asarray(g, jnp.float32) for g in color_maps)
            target = max((g.shape for g in cm),
                         key=lambda sh: sh[1] * sh[2])
            if target != self.sim.color_map.shape:
                self.config = dataclasses.replace(self.config,
                                                  color_map_res=target[1:])
            color_alphas = jnp.asarray(color_alphas, jnp.float32)

        seg = None
        if segments is not None and int(np.shape(segments[0])[0]):
            p0, p1, vel = self._bucket_segments(*segments[:3])
            seg = (jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(vel),
                   jnp.float32(max(segments[3], 1.0)))

        of = None
        if of_frames is not None:
            u = dict({"offset": 1.0, "lambda": 0.001, "speed": 1.0},
                     **(of_uniforms or {}))
            # Frames keep their dtype across the upload (uint8 camera
            # frames are 4x cheaper through the host→device pipe); the
            # optical-flow op normalises on device.
            of = (jnp.asarray(of_frames[0]), jnp.asarray(of_frames[1]),
                  *self._cached_scalars(
                      "_of_u", (u["offset"], u["lambda"], u["speed"])))

        blur_t = None
        if blur is not None:
            blur_t = (*self._cached_scalars("_blur", blur),
                      self._blur_mats((1, 3, 8)))
        bokeh_t = None
        if bokeh is not None:
            bokeh_t = (*self._cached_scalars("_bokeh", bokeh),
                       self._blur_mats((2, 6, 16)))

        paused = bool(self.timer.paused)
        self.sim, screen = _frame_io_jit(
            self.sim, self.params(), jnp.float32(self.timer.time),
            self._cached_scalars("_dt", (self.timer.dt,))[0],
            self.config, self._view_size,
            cm, color_alphas, seg, of, blur_t, bokeh_t,
            stepping=not paused, targets_live=self._targets_live,
            fast_resolve=fast_resolve_ok(self.config, self.state),
            flow_off=flow_force_unused(self.state))
        return screen

    def composite_flow(self, payload_grid):
        """Alpha-blend a full-screen flow payload (e.g. optical flow) over
        the flow grid — ref `demo.main.js:1150-1156`."""
        from .ops.optical_flow import composite_flow as _composite
        fh, fw = self.config.flow_shape
        payload_grid = jnp.asarray(payload_grid, jnp.float32)
        if payload_grid.shape[1:] != (fh, fw):
            import jax.image
            payload_grid = jax.image.resize(payload_grid, (4, fh, fw),
                                            "bilinear")
        self.sim = dataclasses.replace(
            self.sim, flow=_composite(self.sim.flow, payload_grid),
            force=None)
        return self

    # -- view helpers (ref src/index.js:342-391)

    def draw_fade(self):
        p = self.params()
        view0 = render.fade_fill(self.sim.view[0], p["fadeColor"])
        self.sim = dataclasses.replace(self.sim,
                                       view=self.sim.view.at[0].set(view0))
        return self

    def copy_buffer(self, index=0):
        """Composite a view buffer's contents over the current screen output
        — ref `src/index.js:370-383` (`copyBuffer` blits buffer `index` into
        the bound target). Returns the composited `f32[4, H, W]` image (the
        headless 'screen')."""
        if index < self.config.num_view_buffers:
            return self.sim.view[index]
        return jnp.zeros_like(self.sim.view[0])

    def draw_buffer(self, index=0):
        """`drawBuffer`: copy a buffer to the screen then rotate the ring —
        ref `src/index.js:358-367`. Returns the screen image."""
        out = self.copy_buffer(index)
        self.step_buffers()
        return out

    def step_buffers(self):
        """Ring-rotate view buffers — ref `src/index.js:385-391` +
        `src/utils/index.js:1-7`."""
        if self.config.num_view_buffers > 1:
            self.sim = dataclasses.replace(
                self.sim, view=jnp.roll(self.sim.view, 1, axis=0))
        return self

    def resize(self, view_res, flow_res=None):
        """Reallocate view/flow grids — ref `src/index.js:393-408` (state
        content is not preserved across resize, same as FBO reshape)."""
        self.config = dataclasses.replace(self.config,
                                          view_res=tuple(view_res),
                                          flow_res=flow_res)
        self._setup_static()
        cfg = self.config
        h, w = cfg.view_res
        fh, fw = cfg.flow_shape
        self.sim = dataclasses.replace(
            self.sim,
            view=jnp.zeros((cfg.num_view_buffers, 4, h, w), jnp.float32),
            flow=jnp.zeros((4, fh, fw), jnp.float32),
            force=None, sort_key=None, sort_hist=None)
        self.reseed_derived()
        return self

    def set_color_map(self, color_map):
        """Replace the colour-map grid (`f32[4, h, w]`), reallocating if the
        shape changed — ref colorMap FBO `src/index.js:94-96`."""
        color_map = jnp.asarray(color_map, jnp.float32)
        if color_map.shape != self.sim.color_map.shape:
            self.config = dataclasses.replace(
                self.config, color_map_res=color_map.shape[1:])
        self.sim = dataclasses.replace(self.sim, color_map=color_map)
        return self

    @property
    def view_image(self):
        """Current view buffer as `f32[H, W, 4]`, row 0 at top (display)."""
        return jnp.transpose(self.sim.view[0], (1, 2, 0))[::-1]


# --- jitted cores -----------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "flow_off"),
                   donate_argnums=(0,))
def _step_jit(sim, params, time, dt, cfg, view_size, flow_off=False):
    return step_sim(sim, params, time, dt, cfg, view_size,
                    flow_off=flow_off)


@functools.partial(jax.jit, static_argnames=("cfg", "flow_off"),
                   donate_argnums=(0,))
def _draw_jit(sim, params, time, dt, cfg, view_size, flow_off=False):
    if not carry_enabled(cfg) or flow_off:
        if sim.force is not None:
            sim = dataclasses.replace(sim, force=None)
        return draw_sim(sim, params, time, cfg, view_size)
    sim, aux = draw_sim(sim, params, time, cfg, view_size, want_aux=True)
    force = force_from_aux(sim.flow, aux, params, time + dt, cfg)
    return dataclasses.replace(sim, force=force)


@functools.partial(jax.jit, static_argnames=("cfg", "targets_live",
                                             "fast_resolve", "flow_off"),
                   donate_argnums=(0,))
def _frame_jit(sim, params, time, dt, cfg, view_size,
               targets_live=True, fast_resolve=False, flow_off=False):
    if not carry_enabled(cfg):
        sim = step_sim(sim, params, time, dt, cfg, view_size,
                       flow_off=flow_off)
        return draw_sim(sim, params, time, cfg, view_size, stepped=True,
                        fast_resolve=fast_resolve, flow_off=flow_off)
    resident = resident_enabled(cfg)
    sim = step_sim(sim, params, time, dt, cfg, view_size, flow_off=flow_off)
    if flow_off and not resident:
        # Nothing consumes the flow force (`flow_force_unused`) — skip the
        # aux stream and the force gather outright.
        return draw_sim(sim, params, time, cfg, view_size, stepped=True,
                        fast_resolve=fast_resolve, flow_off=True)
    out = draw_sim(sim, params, time, cfg, view_size,
                   want_aux=True, resident=resident,
                   targets_live=targets_live, stepped=True,
                   fast_resolve=fast_resolve, read_time=time + dt,
                   want_eff=fast_resolve and not flow_off,
                   want_force=resident and not flow_off,
                   flow_off=flow_off)
    if resident:
        # Fused gather+reconstruct set sim.force in the draw (or, with
        # flow_off, the frame legitimately carries no force — the next
        # step skips the flow term entirely).
        return out[0]
    sim, aux = out[:2]
    eff = out[2] if len(out) > 2 else None
    force = force_from_aux(sim.flow, aux, params, time + dt, cfg,
                           unsort=not resident, eff=eff)
    return dataclasses.replace(sim, force=force)


def _inject_flow(flow, p0_pix, p1_pix, vel, width, params, time, cfg,
                 samples=None):
    """Pure flow-line segment injection core (ref `demo.main.js:1107-1122`);
    shared by the facade method and the fused io-frame."""
    payload = flow_ops.flow_payload(vel, time, params["speedLimit"])
    return splat_ops.splat_segments(
        flow, p0_pix, p1_pix, payload, payload[3],
        grid_hw=cfg.flow_shape, width=width,
        samples=samples or cfg.flow_samples, rows=max(1, cfg.flow_rows),
        backend=cfg.splat_backend)


@functools.partial(jax.jit, static_argnames=("cfg", "stepping",
                                             "targets_live",
                                             "fast_resolve", "flow_off"),
                   donate_argnums=(0,))
def _frame_io_jit(sim, params, time, dt, cfg, view_size, cm, cm_alphas,
                  seg, of, blur, bokeh=None, stepping=True,
                  targets_live=True, fast_resolve=False, flow_off=False):
    """One-dispatch interactive frame: [colormap blend] + step + draw +
    [flow-line inject] + [optical flow] + [vignette blur]. Optional stages
    are `None` (absence is part of the jit cache key via the pytree
    structure). Ref per-frame stack: `demo.main.js:1024-1161`.

    `stepping=False` (paused timer) skips only the logic step — the draw
    and every io stage still land, like the reference's paused loop."""
    carry = carry_enabled(cfg) and stepping and not flow_off
    if not carry and sim.force is not None:
        sim = dataclasses.replace(sim, force=None)

    if cm is not None:
        # Blend colour maps (ref demo.main.js:1070-1079); shapes are static
        # at trace time — resize to the largest.
        import jax.image
        from .ops import post as post_ops
        target = max((g.shape for g in cm), key=lambda sh: sh[1] * sh[2])
        views = [g if g.shape == target
                 else jax.image.resize(g, target, "bilinear") for g in cm]
        sim = dataclasses.replace(sim,
                                  color_map=post_ops.blend(views, cm_alphas))

    aux = None
    eff = None
    resident = resident_enabled(cfg) and stepping
    # The fused resolve may pre-compute the decayed flow for the gather
    # only when nothing edits the flow between this draw and the gather;
    # the same condition lets the resident frame fuse the gather into the
    # draw outright (`want_force` — sim.force comes back already set).
    want_eff = fast_resolve and seg is None and of is None and not flow_off
    want_force = resident and seg is None and of is None and not flow_off
    if not stepping:
        sim = draw_sim(sim, params, time, cfg, view_size)
    elif carry or (resident and flow_off):
        # (resident + flow_off: no force is gathered, but the state still
        # rides the draw's segment sort so rows stay tile-ordered.)
        sim = step_sim(sim, params, time, dt, cfg, view_size,
                       flow_off=flow_off)
        out = draw_sim(sim, params, time, cfg, view_size,
                       want_aux=True, resident=resident,
                       targets_live=targets_live, stepped=True,
                       fast_resolve=fast_resolve, read_time=time + dt,
                       want_eff=want_eff, want_force=want_force,
                       flow_off=flow_off and seg is None and of is None)
        sim, aux = out[:2]
        eff = out[2] if len(out) > 2 else None
        if want_force or flow_off:
            aux = None  # the fused draw already set sim.force (or none
            # is needed — `flow_force_unused`)
    else:
        sim = step_sim(sim, params, time, dt, cfg, view_size,
                       flow_off=flow_off)
        sim = draw_sim(sim, params, time, cfg, view_size, stepped=True,
                       fast_resolve=fast_resolve,
                       flow_off=flow_off and seg is None and of is None)

    if seg is not None:
        p0, p1, vel, width = seg
        sim = dataclasses.replace(
            sim, flow=_inject_flow(sim.flow, p0, p1, vel, width, params,
                                   time, cfg))

    if of is not None:
        import jax.image
        from .ops.optical_flow import composite_flow, optical_flow
        cur, last, offset, lam, speed = of
        payload = optical_flow(cur, last, time, offset=offset, lambda_=lam,
                               speed=speed, speed_limit=params["speedLimit"])
        fh, fw = cfg.flow_shape
        if payload.shape[1:] != (fh, fw):
            payload = jax.image.resize(payload, (4, fh, fw), "bilinear")
        sim = dataclasses.replace(sim,
                                  flow=composite_flow(sim.flow, payload))

    if aux is not None:
        # Pre-gather the next step's flow force from the FINAL flow grid
        # (after injections — the reference's logic pass sees flow lines and
        # optical flow written this frame, `demo.main.js:1107-1160`).
        force = force_from_aux(sim.flow, aux, params, time + dt, cfg,
                               unsort=not resident, eff=eff)
        sim = dataclasses.replace(sim, force=force)

    screen = None
    if blur is not None:
        from .ops import post as post_ops
        screen = post_ops.vignette_blur(
            sim.view[0], blur[0], blur[1],
            mats=blur[2] if len(blur) > 2 else None)
    if bokeh is not None:
        from .ops import post as post_ops
        screen = post_ops.bokeh(
            sim.view[0] if screen is None else screen, bokeh[0], bokeh[1],
            mats=bokeh[2] if len(bokeh) > 2 else None)
    return sim, screen


def run_headless(sim, params, cfg: EngineConfig, view_size, t0, dt, steps,
                 targets_live=True, fast_resolve=None, flow_off=False):
    """Fixed-step headless run under `lax.scan` (SURVEY §7 pillar 2).

    Only the leaves a frame actually mutates ride the scan carry —
    particles / previous / flow / view (+ the carried force); the rest
    close over the body. This
    matters beyond hygiene: this machine's device runtime degrades
    pathologically (~200x) when a scan carries more buffers than the sim's
    base eight, so the carry is kept minimal. The carried flow force (if
    enabled) is seeded with a standalone gather so the carry structure is
    scan-stable. Returns the final state.
    """
    carry = carry_enabled(cfg) and not flow_off
    if carry and sim.force is None:
        sim = dataclasses.replace(
            sim, force=initial_force(sim, params, cfg, view_size, t0 + dt))
    elif not carry and sim.force is not None:
        sim = dataclasses.replace(sim, force=None)
    mr = merge_reorder_enabled(cfg)
    if mr and sim.sort_key is None:
        sim = seed_sort_carry(sim, cfg)
    elif not mr and sim.sort_key is not None:
        sim = dataclasses.replace(sim, sort_key=None, sort_hist=None)

    resident = resident_enabled(cfg)
    if fast_resolve is None:
        fast_resolve = fast_resolve_ok(cfg, params)

    def body(sim, i):
        time = t0 + dt * (i + 1)
        if carry or (resident and flow_off):
            sim = step_sim(sim, params, time, dt, cfg, view_size,
                           flow_off=flow_off)
            out = draw_sim(sim, params, time, cfg, view_size,
                           want_aux=True, resident=resident,
                           targets_live=targets_live, stepped=True,
                           fast_resolve=fast_resolve, read_time=time + dt,
                           want_eff=fast_resolve and not flow_off,
                           want_force=resident and not flow_off,
                           flow_off=flow_off)
            if resident:
                # Fused gather+reconstruct set sim.force (or flow_off
                # legitimately carries none — the step skips the flow term).
                return out[0], ()
            sim, aux = out[:2]
            eff = out[2] if len(out) > 2 else None
            force = force_from_aux(sim.flow, aux, params, time + dt, cfg,
                                   unsort=not resident, eff=eff)
            sim = dataclasses.replace(sim, force=force)
        else:
            sim = step_sim(sim, params, time, dt, cfg, view_size,
                           flow_off=flow_off)
            sim = draw_sim(sim, params, time, cfg, view_size, stepped=True,
                           fast_resolve=fast_resolve, flow_off=flow_off)
        return sim, ()

    sim, _ = jax.lax.scan(body, sim, jnp.arange(steps, dtype=jnp.float32))
    return sim
