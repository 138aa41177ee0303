"""Multi-chip scale-out (SURVEY §2.9).

The reference has no distributed execution — its only parallelism is the
WebGL rasteriser's implicit SIMD over fragments. The TPU-native scaling axis
is particle count × grid resolution:

  - particles are pure data-parallel (the logic step has no cross-particle
    dependency — each one only reads replicated grids), sharded over an ICI
    mesh with zero collectives in the map phase;
  - the flow/view grids are replicated, and each shard's splat partial sums
    are reduced with one `psum` per pass — the TPU equivalent of the
    rasteriser's blending acting as scatter-reduce.
"""

from .sharding import make_mesh, parallel_frame, shard_sim

__all__ = ["make_mesh", "parallel_frame", "shard_sim"]
