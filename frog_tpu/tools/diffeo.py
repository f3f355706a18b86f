"""Diffeomorphism check: negative-Jacobian census over an image grid —
CheckDiffeomorphism equivalent (tools/CheckDiffeomorphism.cxx:67-91).

The reference evaluates VTK's InternalTransformDerivative per voxel;
autodiff (jacfwd through the whole chain) gives the same 3x3 spatial
derivative here, evaluated in chunks on the device.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..io.volume import Volume
from ..transforms.chain import TransformChain

__all__ = ["check_diffeomorphism"]


def check_diffeomorphism(
    chain: TransformChain,
    grid: Volume | tuple,
    spacing: float | None = None,
    chunk: int = 1 << 16,
):
    """Count negative Jacobian determinants over a sampling grid.

    ``grid`` is a Volume (its grid is used) or (origin, spacing, dims).
    ``spacing`` optionally resamples the grid isotropically, like the
    reference's optional third argument (CheckDiffeomorphism.cxx:39-55).
    Returns (n_negative, n_total).
    """
    if isinstance(grid, Volume):
        origin = grid.origin
        sp = grid.spacing
        dims = np.asarray(grid.shape)
    else:
        origin, sp, dims = grid
        origin = np.asarray(origin, np.float64)
        sp = np.asarray(sp, np.float64)
        dims = np.asarray(dims)
    if spacing is not None and spacing > 0:
        length = sp * (dims - 1)
        dims = np.maximum((length / spacing).astype(int) + 1, 1)
        sp = np.full(3, spacing)

    grids = [origin[k] + sp[k] * np.arange(dims[k]) for k in range(3)]
    cx, cy, cz = np.meshgrid(*grids, indexing="ij")
    pts = np.stack([cx, cy, cz], axis=-1).reshape(-1, 3).astype(np.float32)

    @jax.jit
    def count_neg(block):
        jac = chain.jacobian(block)
        dets = jnp.linalg.det(jac)
        return jnp.sum(dets < 0)

    n_neg = 0
    total = pts.shape[0]
    for start in range(0, total, chunk):
        block = pts[start : start + chunk]
        if block.shape[0] < chunk and total > chunk:
            block = np.pad(block, ((0, chunk - block.shape[0]), (0, 0)))
            n_pad = chunk - (total - start)
        else:
            n_pad = 0
        # padded points replicate the last row; their dets only overcount
        # if negative there, so evaluate exactly instead when padded
        if n_pad:
            block = pts[start:total]
        n_neg += int(count_neg(jnp.asarray(block)))
    return n_neg, int(total)
