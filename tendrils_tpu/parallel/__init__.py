"""Multi-chip scale-out (SURVEY §2.9).

The reference has no distributed execution — its only parallelism is the
WebGL rasteriser's implicit SIMD over fragments. The TPU-native scaling axis
is particle count × grid resolution:

  - particles are pure data-parallel (the logic step has no cross-particle
    dependency — each one only reads replicated grids), sharded over an ICI
    mesh with zero collectives in the map phase;
  - the flow/view grids are replicated, and each shard's splat partial sums
    are reduced with one `psum` per pass — the TPU equivalent of the
    rasteriser's blending acting as scatter-reduce;
  - at high resolution the grids shard by ROW SLABS instead
    (`parallel.spatial`): splat partials are `psum_scatter`'d so each
    device resolves and stores only its slab, and the step's flow read
    all-gathers just the 2 pre-decayed force channels — ~0.58x the ICI
    bytes and 1/D the grid memory of replicate+psum.

Multi-host mapping (design note; this machine exposes one host): the mesh
extends to `(hosts, chips)` via `jax.distributed.initialize` +
`jax.make_mesh`. Particles shard over the flattened axis (collective-free
map phase, so DP crosses DCN harmlessly); the grid reduction should keep
its heavy traffic on ICI by reducing per-host first — `psum` over the
chip axis, then the (much smaller, already-reduced) partials over the host
axis — which XLA does automatically for a `psum` over both axes of a
`(hosts, chips)` mesh since the ICI axis is innermost. The slab layout
additionally wants slabs assigned host-contiguously so the step's
all-gather of the force channels rides ICI within a host before one
DCN hop.
"""

from .sharding import make_mesh, parallel_frame, shard_sim
from .spatial import shard_sim_spatial, spatial_frame

__all__ = ["make_mesh", "parallel_frame", "shard_sim",
           "shard_sim_spatial", "spatial_frame"]
