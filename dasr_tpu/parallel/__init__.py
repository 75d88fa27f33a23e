"""Parallelism surface, re-exported for discoverability.

The reference has no distributed backend (SURVEY.md §2.4); here everything
rides XLA collectives over a named mesh:

  * data parallelism  — ``core.mesh`` (Mesh construction, batch sharding)
  * spatial           — ``ops.tiled`` (sharded tile fan-out) and
                        ``ops.spatial_shard`` (ppermute halo exchange)
"""

from dasr_tpu.core.mesh import (  # noqa: F401
    DATA_AXIS,
    SPATIAL_AXIS,
    MeshContext,
    batch_sharding,
    make_mesh,
    make_mesh_for_batch,
    replicate,
    replicated,
    shard_batch,
    spatial_sharding,
)
from dasr_tpu.ops.spatial_shard import spatially_sharded_apply  # noqa: F401
from dasr_tpu.ops.tiled import tiled_apply  # noqa: F401
