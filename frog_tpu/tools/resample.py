"""Volume resampling through a transform chain — VolumeTransform equivalent
(tools/VolumeTransform.cxx).

Semantics match vtkImageReslice: the output grid is the reference volume's
grid, and for each output voxel at world position y, the source volume is
sampled at ``resliceTransform(y)``.  With ``-t`` the reference loads the
transform and *inverts* it (VolumeTransform.cxx:53-57) because the saved
FROG transforms map source -> common space while reslice needs the
output -> input map; ``-ti`` uses the chain directly.

The chain inverse is an iterative fixed point ``x <- y - d(x)`` over the
chain's total displacement (converges for the diffeomorphic chains this
framework produces), computed chunk-wise on the device.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..io.volume import Volume
from ..ops.surf3d.resample import trilinear_sample
from ..transforms.chain import TransformChain

__all__ = ["resample_volume", "invert_points"]


def invert_points(chain: TransformChain, points: jax.Array, iterations: int = 15):
    """Solve T(x) = y for each row of ``points`` via displacement fixed
    point: x_{k+1} = y - (T(x_k) - x_k)."""

    def body(_, x):
        return points - (chain(x) - x)

    return jax.lax.fori_loop(0, iterations, body, points)


def resample_volume(
    source: Volume,
    reference: Volume,
    chain: TransformChain | None = None,
    inverse: bool = True,
    interpolation: str = "linear",
    background: float | None = None,
    flip_x: bool = False,
    chunk: int = 1 << 18,
) -> Volume:
    """Resample ``source`` onto ``reference``'s grid through ``chain``.

    ``inverse=True`` corresponds to the reference's ``-t`` flag (chain maps
    source -> common; invert per voxel); ``inverse=False`` to ``-ti``.
    Background level defaults to the source minimum
    (VolumeTransform.cxx:126).
    """
    data = jnp.asarray(source.data, jnp.float32)
    if background is None:
        background = float(np.min(source.data))

    dims = reference.shape
    grids = [
        reference.origin[k] + reference.spacing[k] * np.arange(dims[k])
        for k in range(3)
    ]
    cx, cy, cz = np.meshgrid(*grids, indexing="ij")
    world = np.stack([cx, cy, cz], axis=-1).reshape(-1, 3).astype(np.float32)

    src_origin = jnp.asarray(source.origin, jnp.float32)
    src_spacing = jnp.asarray(source.spacing, jnp.float32)
    src_dims = np.asarray(source.shape)

    nearest = interpolation in ("nearest", "0", 0)

    @jax.jit
    def process(pts):
        if chain is not None:
            x = invert_points(chain, pts) if inverse else chain(pts)
        else:
            x = pts
        idx = (x - src_origin) / src_spacing
        inside = jnp.all(
            (idx >= 0) & (idx <= jnp.asarray(src_dims - 1, jnp.float32)), axis=-1
        )
        if nearest:
            ii = jnp.clip(
                jnp.round(idx).astype(jnp.int32), 0, jnp.asarray(src_dims - 1)
            )
            vals = data[ii[:, 0], ii[:, 1], ii[:, 2]]
        else:
            vals = trilinear_sample(data, idx)
        return jnp.where(inside, vals, jnp.float32(background))

    out = np.empty(world.shape[0], np.float32)
    for start in range(0, world.shape[0], chunk):
        block = world[start : start + chunk]
        pad = 0
        if block.shape[0] < chunk and world.shape[0] > chunk:
            pad = chunk - block.shape[0]
            block = np.pad(block, ((0, pad), (0, 0)))
        vals = np.asarray(process(jnp.asarray(block)))
        out[start : start + chunk] = vals[: chunk - pad if pad else None][
            : world.shape[0] - start
        ]

    result = out.reshape(dims)
    if flip_x:
        result = result[::-1]
    return Volume(data=result, origin=reference.origin, spacing=reference.spacing)
