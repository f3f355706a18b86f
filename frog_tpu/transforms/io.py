"""FROG transform serialization: JSON (inline / compact-NIfTI) and .tfm.

Formats kept byte-compatible with the reference so transform files
interoperate in both directions:

* JSON (reference writer tools/transformIO.h:163-258, reader :367-468):
  ``{"transforms": [{"type": "vtkMatrixToLinearTransform", "matrix": [16]},
  {"type": "vtkBSplineTransform", "dimensions": [3], "origin": [3],
  "spacing": [3], "coeffs": [3*prod(dims)]} | {..., "file": "x.nii.gz"}]}``.
  Coefficients are flattened x-fastest with the 3 vector components fastest
  of all (VTK memory order); list order = application order.
* TFM text (reference :102-161 / :260-365): first line
  ``tx ty tz -123456 sx sy sz``; per grid a line ``nx ny nz x0 x1 y0 y1 z0
  z1`` (interior cell counts + interior bbox) followed by one
  ``dx dy dz -123456 -123456`` line per control point.
"""
from __future__ import annotations

import json
import os

import numpy as np

from ..io.volume import Volume
from .affine import Affine
from .bspline import BSpline
from .chain import TransformChain

__all__ = ["read_transform", "write_frog_json", "read_frog_json", "write_tfm", "read_tfm"]


def _coeffs_to_vtk_order(coeffs: np.ndarray) -> np.ndarray:
    """(Dx,Dy,Dz,3) array -> flat VTK memory order (x fastest, comp fastest)."""
    return np.ascontiguousarray(coeffs.transpose(2, 1, 0, 3)).ravel()


def _coeffs_from_vtk_order(flat: np.ndarray, dims) -> np.ndarray:
    dx, dy, dz = dims
    return np.ascontiguousarray(
        flat.reshape(dz, dy, dx, 3).transpose(2, 1, 0, 3)
    )


def write_frog_json(chain: TransformChain, filename: str, compact: bool = True) -> None:
    """Write a chain to FROG JSON.  ``compact`` stores each coefficient grid
    as an external ``<filename>.<k>.nii.gz`` (the reference's default,
    transformIO.h:196-208)."""
    from ..io.nifti import write_nifti

    transforms = []
    nii_counter = 0
    for t in chain.transforms:
        if isinstance(t, Affine):
            transforms.append(
                {
                    "type": "vtkMatrixToLinearTransform",
                    "matrix": [float(v) for v in np.asarray(t.matrix).ravel()],
                }
            )
        elif isinstance(t, BSpline):
            coeffs = np.asarray(t.coeffs)
            entry: dict = {"type": "vtkBSplineTransform"}
            if compact:
                name = f"{filename}.{nii_counter}.nii.gz"
                nii_counter += 1
                vol = Volume(
                    data=coeffs.astype(np.float32),
                    origin=np.asarray(t.origin, dtype=np.float64),
                    spacing=np.asarray(t.spacing, dtype=np.float64),
                )
                write_nifti(name, vol)
                entry["file"] = os.path.basename(name)
            else:
                entry["dimensions"] = [int(d) for d in coeffs.shape[:3]]
                entry["origin"] = [float(v) for v in np.asarray(t.origin)]
                entry["spacing"] = [float(v) for v in np.asarray(t.spacing)]
                entry["coeffs"] = [float(v) for v in _coeffs_to_vtk_order(coeffs)]
            transforms.append(entry)
        else:
            raise TypeError(f"cannot serialize transform {type(t)}")

    with open(filename, "w") as f:
        json.dump({"transforms": transforms}, f)


def read_frog_json(filename: str) -> TransformChain:
    import jax.numpy as jnp

    from ..io.nifti import read_nifti

    with open(filename) as f:
        root = json.load(f)

    if "transforms" not in root:
        # Legacy rigid format {"scale": s, "translation": [3]}
        # (transformIO.h:480-497): scale applied first, then translation.
        s = float(root["scale"])
        t = np.asarray(root["translation"], dtype=np.float64)
        m = np.diag([s, s, s, 1.0])
        m[:3, 3] = t
        return TransformChain(
            transforms=(Affine(matrix=jnp.asarray(m, dtype=jnp.float32)),)
        )

    out = []
    for entry in root["transforms"]:
        typ = entry["type"]
        if typ == "vtkMatrixToLinearTransform":
            m = np.asarray(entry["matrix"], dtype=np.float64).reshape(4, 4)
            out.append(Affine(matrix=jnp.asarray(m, dtype=jnp.float32)))
        elif typ == "vtkBSplineTransform":
            if "file" in entry and entry["file"]:
                nii = os.path.join(os.path.dirname(filename) or ".", entry["file"])
                vol = read_nifti(nii, reorient_to_ras=False)
                coeffs = vol.data
                if coeffs.ndim != 4 or coeffs.shape[3] != 3:
                    raise ValueError(f"{nii}: expected 3-component coefficients")
                origin, spacing = vol.origin, vol.spacing
            else:
                dims = [int(d) for d in entry["dimensions"]]
                origin = np.asarray(entry["origin"], dtype=np.float64)
                spacing = np.asarray(entry["spacing"], dtype=np.float64)
                flat = np.asarray(entry["coeffs"], dtype=np.float32)
                coeffs = _coeffs_from_vtk_order(flat, dims)
            out.append(
                BSpline(
                    coeffs=jnp.asarray(coeffs, dtype=jnp.float32),
                    origin=jnp.asarray(origin, dtype=jnp.float32),
                    spacing=jnp.asarray(spacing, dtype=jnp.float32),
                )
            )
        else:
            raise ValueError(f"unknown transform type {typ}")
    return TransformChain(transforms=tuple(out))


def write_tfm(chain: TransformChain, filename: str) -> None:
    lines = []
    first = chain.transforms[0]
    if not isinstance(first, Affine):
        raise TypeError("TFM requires the chain to start with an affine")
    m = np.asarray(first.matrix)
    t = m[:3, 3]
    s = np.diagonal(m)[:3]
    lines.append(
        f"{_fmt(t[0])} {_fmt(t[1])} {_fmt(t[2])} -123456 "
        f"{_fmt(s[0])} {_fmt(s[1])} {_fmt(s[2])}"
    )
    for tr in chain.transforms[1:]:
        if not isinstance(tr, BSpline):
            raise TypeError("TFM chains are affine + B-spline grids only")
        coeffs = np.asarray(tr.coeffs)
        dims = coeffs.shape[:3]
        origin = np.asarray(tr.origin, dtype=np.float64)
        spacing = np.asarray(tr.spacing, dtype=np.float64)
        header = [str(d - 3) for d in dims]
        for k in range(3):
            header.append(_fmt(origin[k] + spacing[k]))
            header.append(_fmt(origin[k] + spacing[k] * (dims[k] - 2)))
        lines.append(" ".join(header))
        flat = _coeffs_to_vtk_order(coeffs).reshape(-1, 3)
        for row in flat:
            lines.append(f"{_fmt(row[0])} {_fmt(row[1])} {_fmt(row[2])} -123456 -123456")
    with open(filename, "w") as f:
        f.write("\n".join(lines) + "\n")


def _fmt(v: float) -> str:
    return f"{float(v):.9g}"


def read_tfm(filename: str) -> TransformChain:
    import jax.numpy as jnp

    with open(filename) as f:
        tokens = f.read().split()
    pos = 0

    def take(n):
        nonlocal pos
        vals = [float(tokens[pos + i]) for i in range(n)]
        pos += n
        return vals

    t = take(3)
    magic = take(1)[0]
    scale = take(3) if magic == -123456 else [1.0, 1.0, 1.0]
    m = np.diag([scale[0], scale[1], scale[2], 1.0])
    m[:3, 3] = t
    out = [Affine(matrix=jnp.asarray(m, dtype=jnp.float32))]

    while pos < len(tokens):
        n = [int(float(tokens[pos + i])) for i in range(3)]
        pos += 3
        origin = np.zeros(3)
        spacing = np.zeros(3)
        dims = []
        for k in range(3):
            lo, hi = take(2)
            spacing[k] = (hi - lo) / n[k]
            origin[k] = lo - spacing[k]
            dims.append(n[k] + 3)
        nvals = dims[0] * dims[1] * dims[2]
        flat = np.empty((nvals, 3), dtype=np.float32)
        for i in range(nvals):
            flat[i] = take(3)
            take(2)  # -123456 -123456 sentinels
        out.append(
            BSpline(
                coeffs=jnp.asarray(_coeffs_from_vtk_order(flat.ravel(), dims)),
                origin=jnp.asarray(origin, dtype=jnp.float32),
                spacing=jnp.asarray(spacing, dtype=jnp.float32),
            )
        )
    return TransformChain(transforms=tuple(out))


def read_transform(filename: str) -> TransformChain:
    """Dispatch by extension, as the reference does (transformIO.h:512-529)."""
    if str(filename).lower().endswith(".json"):
        return read_frog_json(filename)
    return read_tfm(filename)
