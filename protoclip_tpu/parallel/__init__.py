"""Multi-chip execution: device meshes and batch-sharded jit programs.

The reference is strictly single-GPU (SURVEY.md §2 parallelism census); the
TPU-native scale-out story is data parallelism over ICI — the N*K support
images, the 1024-image eval batches, and the Q^T train batches shard over a
1-D ``data`` mesh axis, with XLA inserting the (few) collectives: metric
``psum`` and the feature all-gather back to host.
"""

from protoclip_tpu.parallel.mesh import make_mesh, local_device_count, init_distributed
from protoclip_tpu.parallel.sharding import (
    batch_sharding,
    replicated,
    shard_batch,
    make_sharded_encode,
    shard_qt_step,
)

__all__ = [
    "make_mesh",
    "init_distributed",
    "local_device_count",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "make_sharded_encode",
    "shard_qt_step",
]
