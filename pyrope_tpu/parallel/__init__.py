"""Multi-chip execution: mesh helpers, sharded scans, sharded k-means.

The reference is a single-node server with no distribution layer (SURVEY
§2.1 note, §5.8) — this package is the new surface the TPU build adds:
corpus rows sharded over a 1-D device mesh, per-shard top-k, ICI all-gather
merge ("sequence parallelism over the database axis", SURVEY §5.7).
"""

from pyrope_tpu.parallel.mesh import default_mesh, make_mesh
from pyrope_tpu.parallel.sharded_flat import ShardedFlatIndex, sharded_kmeans_step
from pyrope_tpu.parallel.sharded_ivf import ShardedIvfFlatIndex
from pyrope_tpu.parallel.sharded_ivf_pq import ShardedIvfPqIndex

__all__ = [
    "default_mesh",
    "make_mesh",
    "ShardedFlatIndex",
    "ShardedIvfFlatIndex",
    "ShardedIvfPqIndex",
    "sharded_kmeans_step",
]
