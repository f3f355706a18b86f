"""Mesh and point transformation tools — MeshTransform / PointsTransform /
transformPoints.py equivalents (tools/MeshTransform.cxx,
tools/PointsTransform.cxx, tools/transformPoints.py).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..io.polydata import PolyData, read_polydata, write_polydata
from ..tools.resample import invert_points
from ..transforms.chain import TransformChain

__all__ = ["transform_mesh", "transform_points", "transform_point_file"]


def transform_points(
    chain: TransformChain, points: np.ndarray, inverse: bool = False
) -> np.ndarray:
    pts = jnp.asarray(np.asarray(points, np.float32))
    out = invert_points(chain, pts) if inverse else chain(pts)
    return np.asarray(out)


def transform_mesh(
    chain: TransformChain, mesh: PolyData, inverse: bool = False
) -> PolyData:
    return PolyData(
        points=transform_points(chain, mesh.points, inverse=inverse),
        faces=mesh.faces,
    )


def transform_mesh_file(chain, src_path, dst_path, inverse: bool = False):
    mesh = read_polydata(src_path)
    write_polydata(dst_path, transform_mesh(chain, mesh, inverse=inverse))


def transform_point_file(chain, csv_path, out_path, inverse: bool = False):
    """Apply a chain to a CSV point list, writing x y z lines
    (tools/transformPoints.py semantics)."""
    pts = []
    with open(csv_path) as f:
        for line in f:
            vals = line.replace(",", " ").split()
            if len(vals) >= 3:
                try:
                    pts.append([float(v) for v in vals[:3]])
                except ValueError:
                    continue
    out = transform_points(chain, np.asarray(pts, np.float32), inverse=inverse)
    with open(out_path, "w") as f:
        for p in out:
            f.write(f"{p[0]:.7g} {p[1]:.7g} {p[2]:.7g}\n")
