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
"""

from .sharding import make_mesh, parallel_frame, shard_sim
from .spatial import shard_sim_spatial, spatial_frame

__all__ = ["make_mesh", "parallel_frame", "shard_sim",
           "shard_sim_spatial", "spatial_frame"]
