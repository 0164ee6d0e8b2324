from raw_image_pipeline_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    batch_sharding,
    spatial_sharding,
)
from raw_image_pipeline_tpu.parallel.multihost import initialize_multihost

__all__ = [
    "make_mesh",
    "shard_batch",
    "batch_sharding",
    "spatial_sharding",
    "initialize_multihost",
]
