"""3D volume container with physical-space metadata.

Replaces the VTK image plumbing the reference leans on (vtkImageData +
vtkRobustImageReader).  Data is indexed ``[ix, iy, iz]`` (x first, matching
the NIfTI on-disk axis order); ``origin``/``spacing`` are xyz physical
coordinates so that voxel (i,j,k) sits at ``origin + spacing * (i,j,k)``
under an axis-aligned direction matrix (the only case the reference's
pipeline handles — it reorients inputs to RAS first, FROG.py:70-103).
"""
from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["Volume"]


@dataclasses.dataclass
class Volume:
    data: np.ndarray  # (nx, ny, nz) or (nx, ny, nz, ncomp)
    origin: np.ndarray  # (3,) float64, xyz
    spacing: np.ndarray  # (3,) float64, xyz

    def __post_init__(self):
        self.origin = np.asarray(self.origin, dtype=np.float64)
        self.spacing = np.asarray(self.spacing, dtype=np.float64)

    @property
    def shape(self):
        return self.data.shape[:3]

    @property
    def ncomp(self) -> int:
        return 1 if self.data.ndim == 3 else self.data.shape[3]

    @property
    def bounds(self):
        """(min_xyz, max_xyz) of the voxel-center bounding box."""
        lo = self.origin
        hi = self.origin + self.spacing * (np.array(self.shape) - 1)
        return lo, hi

    def index_to_physical(self, idx):
        return self.origin + self.spacing * np.asarray(idx)

    def physical_to_index(self, xyz):
        return (np.asarray(xyz) - self.origin) / self.spacing

    def astype(self, dtype) -> "Volume":
        return Volume(self.data.astype(dtype), self.origin, self.spacing)
