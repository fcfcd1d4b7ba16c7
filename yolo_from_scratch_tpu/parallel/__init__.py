from yolo_from_scratch_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    batch_sharding,
    image_sharding,
    target_sharding,
    replicated_sharding,
    shard_batch,
    pad_batch_to_multiple,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "batch_sharding",
    "image_sharding",
    "target_sharding",
    "replicated_sharding",
    "shard_batch",
    "pad_batch_to_multiple",
]
