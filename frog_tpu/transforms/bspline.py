"""Cubic B-spline free-form deformation grid as a JAX pytree.

TPU-native re-design of the reference's ``vtkBSplineTransform`` usage
(reference: registration/imageGroup.cxx:159-232 for grid construction and
basis weights, tools/transformIO.h:192-243 for serialization metadata).

Conventions (kept bit-compatible with the reference grids so transform files
interoperate):

* The control grid covers an axis-aligned box.  For a target region
  ``[lo, hi]`` split into ``n`` cells of size ``spacing``, the grid has
  ``dims = n + 3`` control points per axis and ``origin = lo - spacing``
  (reference: imageGroup.cxx:170-179).  A point at ``lo`` therefore maps to
  grid coordinate ``u = 1``.
* Displacement at point p: ``d(p) = sum_{a,b,c in 0..3} Fx[a] Fy[b] Fz[c]
  * C[i-1+a, j-1+b, k-1+c]`` where ``u = (p - origin)/spacing``,
  ``(i,j,k) = floor(u)`` and F are the uniform cubic B-spline basis weights
  of the fractional part (reference: imageGroup.cxx:221-232).
* Zero border mode: control points outside the grid contribute nothing
  (reference: imageGroup.cxx:205 ``SetBorderModeToZero``).
* The transform maps ``p -> p + d(p)``.

``coeffs`` is stored indexed ``[ix, iy, iz, 3]`` (xyz displacement
components last).  File I/O transposes to the reference's x-fastest memory
layout at the boundary (see transforms/io.py).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = [
    "BSpline",
    "bspline_weights",
    "bspline_displacement",
    "zero_bspline",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSpline:
    coeffs: jax.Array  # (Dx, Dy, Dz, 3) float32 displacement coefficients
    origin: jax.Array  # (3,)
    spacing: jax.Array  # (3,)

    def __call__(self, points: jax.Array) -> jax.Array:
        return points + self.displacement(points)

    def displacement(self, points: jax.Array) -> jax.Array:
        return bspline_displacement(self.coeffs, self.origin, self.spacing, points)

    @property
    def dims(self) -> tuple[int, int, int]:
        return self.coeffs.shape[:3]


def bspline_weights(f: jax.Array) -> jax.Array:
    """Uniform cubic B-spline basis weights of fractional offsets.

    Matches the closed form used by the reference's scatter
    (imageGroup.cxx:221-232, itself lifted from vtkBSplineTransform):
      F3 = f^3/6, F0 = (f^2-f)/2 - F3 + 1/6, F2 = f + F0 - 2 F3,
      F1 = 1 - F0 - F2 - F3
    which equals the textbook basis (B0..B3 evaluated at f).

    f: (...,) in [0, 1).  Returns (..., 4).
    """
    f2 = f * f
    w3 = f2 * f * (1.0 / 6.0)
    w0 = (f2 - f) * 0.5 - w3 + 1.0 / 6.0
    w2 = f + w0 - 2.0 * w3
    w1 = 1.0 - w0 - w2 - w3
    return jnp.stack([w0, w1, w2, w3], axis=-1)


def _grid_coords(origin, spacing, points):
    """Grid-space coordinates, base control index and basis weights.

    Returns (base, weights) with base (..., 3) int32 = floor(u) - 1 (index of
    the first of the 4 support control points per axis) and weights
    (..., 3, 4).
    """
    u = (points - origin) / spacing
    iu = jnp.floor(u)
    frac = u - iu
    base = iu.astype(jnp.int32) - 1
    weights = bspline_weights(frac)  # (..., 3, 4): per-axis stacked below
    return base, weights


def bspline_displacement(coeffs, origin, spacing, points):
    """Evaluate the displacement field at ``points`` (..., 3).

    Implemented as a dense 64-tap gather: for each point, gather the 4x4x4
    support control vectors and contract with the separable basis weights.
    XLA lowers the gathers to efficient dynamic-slices; the tensor
    contraction is fully vectorized (no Python loop over points).
    """
    dims = coeffs.shape[:3]
    base, w = _grid_coords(origin, spacing, points)  # base (...,3), w (...,3,4)

    offs = jnp.arange(4, dtype=jnp.int32)
    # Per-axis absolute control indices: (..., 4)
    ix = base[..., 0:1] + offs
    iy = base[..., 1:2] + offs
    iz = base[..., 2:3] + offs

    # Zero border: out-of-range control points contribute 0.
    vx = (ix >= 0) & (ix < dims[0])
    vy = (iy >= 0) & (iy < dims[1])
    vz = (iz >= 0) & (iz < dims[2])
    cx = jnp.clip(ix, 0, dims[0] - 1)
    cy = jnp.clip(iy, 0, dims[1] - 1)
    cz = jnp.clip(iz, 0, dims[2] - 1)

    wx = jnp.where(vx, w[..., 0, :], 0.0)  # (..., 4)
    wy = jnp.where(vy, w[..., 1, :], 0.0)
    wz = jnp.where(vz, w[..., 2, :], 0.0)

    # Gather the 4x4x4 neighborhood: (..., 4, 4, 4, 3)
    nbhd = coeffs[
        cx[..., :, None, None],
        cy[..., None, :, None],
        cz[..., None, None, :],
    ]
    # Separable contraction, kept in f32 on the VPU (HIGHEST avoids the
    # default bf16 matmul path, which would quantize displacements).
    out = jnp.einsum(
        "...a,...b,...c,...abcd->...d",
        wx,
        wy,
        wz,
        nbhd,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out


def zero_bspline(dims: tuple[int, int, int], origin, spacing, dtype=jnp.float32) -> BSpline:
    return BSpline(
        coeffs=jnp.zeros((*dims, 3), dtype=dtype),
        origin=jnp.asarray(origin, dtype=dtype),
        spacing=jnp.asarray(spacing, dtype=dtype),
    )


def grid_from_bbox(bbox_min, bbox_max, cell_size: float, margin: float = 0.0):
    """Compute (dims, origin, spacing) for a new control grid over a bbox.

    Mirrors the reference's grid sizing (imageGroup.cxx:161-179): the box is
    scaled about its center by ``1 + 2*margin``; per axis the number of cells
    is ``round(length / cell_size)`` (>= 1), spacing divides the length
    exactly, origin sits one spacing before the box and dims gets +3 control
    points.

    Static Python computation (shapes must be concrete for XLA).
    """
    import numpy as np

    lo = np.asarray(bbox_min, dtype=np.float64)
    hi = np.asarray(bbox_max, dtype=np.float64)
    center = (lo + hi) / 2
    half = (hi - lo) / 2 * (1 + 2 * margin)
    lo = center - half
    hi = center + half
    length = hi - lo
    n = np.maximum(np.round(length / cell_size).astype(int), 1)
    spacing = length / n
    origin = lo - spacing
    dims = tuple(int(d) for d in (n + 3))
    return dims, origin, spacing
