from .mesh import IMAGE_AXIS, image_sharding, make_mesh, pad_group, shard_group_arrays

__all__ = [
    "IMAGE_AXIS",
    "image_sharding",
    "make_mesh",
    "pad_group",
    "shard_group_arrays",
]
