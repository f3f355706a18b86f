from .affine import Affine, identity_affine, similarity_from_params
from .bspline import BSpline, bspline_displacement, bspline_weights, grid_from_bbox, zero_bspline
from .chain import Transform, TransformChain
from .io import read_frog_json, read_tfm, read_transform, write_frog_json, write_tfm

__all__ = [
    "Affine",
    "BSpline",
    "Transform",
    "TransformChain",
    "bspline_displacement",
    "bspline_weights",
    "grid_from_bbox",
    "identity_affine",
    "read_frog_json",
    "read_tfm",
    "read_transform",
    "similarity_from_params",
    "write_frog_json",
    "write_tfm",
    "zero_bspline",
]
