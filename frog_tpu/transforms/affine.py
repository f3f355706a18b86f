"""Affine (4x4 homogeneous) transform as a JAX pytree.

TPU-native equivalent of the reference's ``vtkMatrixToLinearTransform`` usage
(reference: registration/imageGroup.cxx:806-848, tools/transformIO.h:175-190).
The groupwise optimizer only ever uses axis-aligned similarity matrices
(diagonal scale + translation), but the container is a general 4x4 so that
RANSAC similarity fits and external transforms round-trip losslessly.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["Affine", "identity_affine"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Affine:
    """Homogeneous 4x4 transform, applied to row-vectors of xyz points.

    ``matrix`` follows the usual convention: ``y = M[:3, :3] @ x + M[:3, 3]``.
    """

    matrix: jax.Array  # (4, 4) float32

    def __call__(self, points: jax.Array) -> jax.Array:
        return apply_affine(self.matrix, points)

    @property
    def translation(self) -> jax.Array:
        return self.matrix[:3, 3]

    @property
    def diagonal_scale(self) -> jax.Array:
        return jnp.diagonal(self.matrix)[:3]


def identity_affine(dtype=jnp.float32) -> Affine:
    return Affine(matrix=jnp.eye(4, dtype=dtype))


def apply_affine(matrix: jax.Array, points: jax.Array) -> jax.Array:
    """Apply a homogeneous 4x4 to points of shape (..., 3).

    Written as a broadcast multiply-sum rather than a matmul: a (N,3)x(3,3)
    contraction would be routed to the MXU in low (bf16) precision by
    default, which destroys sub-voxel accuracy; the VPU form stays f32.
    """
    rot = matrix[:3, :3]
    trans = matrix[:3, 3]
    return (points[..., None, :] * rot).sum(-1) + trans


def similarity_from_params(translation: jax.Array, scale: jax.Array) -> Affine:
    """Axis-aligned similarity: diag(scale) then +translation.

    This is the parameterization the linear groupwise stage updates
    (reference: registration/imageGroup.cxx:1124-1141 writes M[k][k] and
    M[k][3] only).
    """
    m = jnp.eye(4, dtype=jnp.result_type(translation, scale, jnp.float32))
    m = m.at[jnp.arange(3), jnp.arange(3)].set(scale)
    m = m.at[:3, 3].set(translation)
    return Affine(matrix=m)
