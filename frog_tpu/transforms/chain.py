"""Post-multiplied transform chain: one affine followed by K B-spline grids.

TPU-native equivalent of the reference's ``vtkGeneralTransform`` in
PostMultiply mode (reference: registration/imageGroup.cxx:835-837,
tools/transformIO.h:367-468).  ``transforms[0]`` is applied first; each
subsequent element is applied to the output of the previous one — exactly
the order the FROG JSON format lists them in.

The chain is a host-side Python tuple (its length changes when the optimizer
stacks new grids), while every element's parameters are device arrays.  All
evaluation helpers are jit-compatible for a fixed chain structure.
"""
from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp

from .affine import Affine
from .bspline import BSpline

__all__ = ["TransformChain", "Transform"]

Transform = Union[Affine, BSpline]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TransformChain:
    transforms: tuple  # tuple[Transform, ...]

    def __call__(self, points: jax.Array) -> jax.Array:
        out = points
        for t in self.transforms:
            out = t(out)
        return out

    def append(self, t: Transform) -> "TransformChain":
        return TransformChain(transforms=(*self.transforms, t))

    def __len__(self) -> int:
        return len(self.transforms)

    def jacobian(self, points: jax.Array) -> jax.Array:
        """Spatial Jacobian d T / d p at each point (..., 3, 3).

        The reference evaluates this through VTK's InternalTransformDerivative
        for the diffeomorphism check (tools/CheckDiffeomorphism.cxx:67-85);
        here autodiff gives it for free.
        """
        jac = jax.vmap(jax.jacfwd(lambda p: self(p)))
        flat = points.reshape(-1, 3)
        return jac(flat).reshape(*points.shape[:-1], 3, 3)

    def inverse(self, points: jax.Array, iterations: int = 20) -> jax.Array:
        """Iterative inverse: solve T(x) = y for each y in ``points``.

        VTK inverts general transforms with a Newton iteration per query
        point (used by the resampler, tools/VolumeTransform.cxx:53-57).  We
        use a damped fixed-point/Newton hybrid: start from x = y and update
        with the full 3x3 Jacobian solve, which converges quadratically for
        the diffeomorphic chains this framework produces.
        """

        def body(_, x):
            r = self(x) - points
            jac = self.jacobian(x)
            dx = jnp.linalg.solve(jac, r[..., None])[..., 0]
            return x - dx

        return jax.lax.fori_loop(0, iterations, body, points)
