"""Device-mesh sharding for the groupwise optimizer.

The distribution axis for this workload is the *image* axis (SURVEY.md
§2.5): every ``GroupArrays`` field has leading dimension N, so the whole
optimizer state shards with ``PartitionSpec('i', ...)`` over a 1-D mesh.
Cross-image dependencies are exactly two:

* the link-destination gather ``xyz2.reshape(N*P, 3)[link_dst]`` — XLA
  lowers this to an all-gather of the (N, P, 3) positions (~240 KB per
  image at FROG's default 20k points), riding ICI;
* the deformable grid mean-subtraction and the scalar energy sums — these
  become all-reduces.

Everything else (segment sums, EM E-steps, B-spline scatter) is local to
an image shard, so scaling is embarrassingly parallel between those two
collectives.  No shard_map is needed: the kernels are pure array programs
and GSPMD inserts the collectives from the sharding annotations.
"""
from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_group_arrays", "image_sharding"]

IMAGE_AXIS = "i"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (IMAGE_AXIS,))


def image_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (image) axis, replicate the rest."""
    return NamedSharding(mesh, P(IMAGE_AXIS, *([None] * (ndim - 1))))


def shard_group_arrays(arrays, mesh: Mesh):
    """Place every field of a GroupArrays on the mesh, image-sharded.

    The image count must be divisible by the mesh size (pad the group with
    empty images otherwise; ``pad_group`` below does this).
    """

    def place(x):
        return jax.device_put(x, image_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(place, arrays)


def pad_group(arrays, multiple: int):
    """Pad the image axis to a multiple of the mesh size with empty images
    (no valid points or links, identity transforms)."""
    import jax.numpy as jnp

    n = arrays.n_images
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return arrays, n

    def pad_field(x, fill=0):
        pad = [(0, target - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad, constant_values=fill)

    eye = jnp.broadcast_to(jnp.eye(4, dtype=arrays.affine.dtype), (target - n, 4, 4))
    padded = dataclasses.replace(
        arrays,
        xyz=pad_field(arrays.xyz),
        xyz2=pad_field(arrays.xyz2),
        point_valid=pad_field(arrays.point_valid),
        link_dst=pad_field(arrays.link_dst),
        link_valid=pad_field(arrays.link_valid),
        hard_dst=pad_field(arrays.hard_dst),
        hard_valid=pad_field(arrays.hard_valid),
        em=jnp.concatenate(
            [arrays.em, jnp.tile(jnp.asarray([[10.0, 300.0, 0.5]]), (target - n, 1))]
        ),
        affine=jnp.concatenate([arrays.affine, eye]),
    )
    return padded, n
