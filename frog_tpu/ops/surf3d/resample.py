"""Volume preprocessing for keypoint extraction: isotropic resampling,
intensity clamping, mirror padding, masking.

Covers the surf3d CLI preprocessing options (-s spacing, -cmin/-cmax,
-pad, -m mask; option schema frog.json:352-428, driver FROG.py:40-46,
196-207).  The resampler is a vectorized trilinear gather under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...io.volume import Volume

__all__ = ["resample_isotropic", "trilinear_sample", "mirror_pad", "clamp"]


def trilinear_sample(data: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample ``data`` (X, Y, Z) at fractional voxel ``coords`` (..., 3).

    Out-of-range coordinates clamp to the border (VTK reslice's default
    border handling for in-bounds output grids).
    """
    shape = jnp.asarray(data.shape, jnp.float32)
    c = jnp.clip(coords, 0.0, shape - 1.0)
    i0 = jnp.floor(c).astype(jnp.int32)
    i0 = jnp.minimum(i0, jnp.asarray(data.shape, jnp.int32) - 2)
    i0 = jnp.maximum(i0, 0)
    f = c - i0

    def at(dx, dy, dz):
        return data[i0[..., 0] + dx, i0[..., 1] + dy, i0[..., 2] + dz]

    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    c00 = at(0, 0, 0) * (1 - fx) + at(1, 0, 0) * fx
    c10 = at(0, 1, 0) * (1 - fx) + at(1, 1, 0) * fx
    c01 = at(0, 0, 1) * (1 - fx) + at(1, 0, 1) * fx
    c11 = at(0, 1, 1) * (1 - fx) + at(1, 1, 1) * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def resample_isotropic(vol: Volume, spacing: float) -> Volume:
    """Resample to isotropic ``spacing`` over the same physical extent."""
    lo, hi = vol.bounds
    dims = np.maximum(np.floor((hi - lo) / spacing).astype(int) + 1, 1)
    data = jnp.asarray(vol.data, jnp.float32)

    grids = [
        (lo[k] + spacing * np.arange(dims[k]) - vol.origin[k]) / vol.spacing[k]
        for k in range(3)
    ]
    cx, cy, cz = jnp.meshgrid(
        jnp.asarray(grids[0], jnp.float32),
        jnp.asarray(grids[1], jnp.float32),
        jnp.asarray(grids[2], jnp.float32),
        indexing="ij",
    )
    coords = jnp.stack([cx, cy, cz], axis=-1)
    out = jax.jit(trilinear_sample)(data, coords)
    return Volume(
        data=np.asarray(out),
        origin=lo,
        spacing=np.full(3, float(spacing)),
    )


def clamp(vol: Volume, cmin: float | None, cmax: float | None) -> Volume:
    if cmin is None and cmax is None:
        return vol
    data = vol.data
    lo = cmin if cmin is not None else -np.inf
    hi = cmax if cmax is not None else np.inf
    return Volume(np.clip(data, lo, hi), vol.origin, vol.spacing)


def mirror_pad(vol: Volume, pad_mm: float) -> Volume:
    """Mirror padding by ``pad_mm`` physical units on every face
    (surf3d -pad)."""
    if pad_mm <= 0:
        return vol
    n = np.maximum((pad_mm / vol.spacing).astype(int), 0)
    data = np.pad(
        vol.data, [(k, k) for k in n], mode="reflect"
    )
    return Volume(data, vol.origin - n * vol.spacing, vol.spacing)
