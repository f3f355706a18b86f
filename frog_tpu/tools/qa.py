"""Visual-QA volume generators and transform utilities.

Equivalents of the reference's SimpleITK helpers and small transform
tools:

* ``checkerboard_volume`` — tools/checkerBoard.py: a grey/white checker
  pattern on an image's grid (~30 mm cells, full-thickness x slabs).
* ``grid_volume`` — tools/grid.py: a fine-spacing volume with bright
  gridlines every ~30 mm (for visualizing deformations).
* ``label_contour`` — tools/labelContour.py: label-boundary voxels.
* ``trim_transform`` — tools/trimTransform.py: keep the first n chain
  entries of a transform JSON.
* ``register_two_volumes`` — tools/register2volumes.py: pairwise wrapper
  that registers two volumes and resamples the first onto the second.
"""
from __future__ import annotations

import json

import numpy as np

from ..io.volume import Volume

__all__ = [
    "checkerboard_volume",
    "grid_volume",
    "label_contour",
    "trim_transform",
    "register_two_volumes",
]


def checkerboard_volume(ref: Volume, cell_mm: float = 30.0) -> Volume:
    """Grey(50)/white(100) checkerboard on ``ref``'s grid; the x axis is a
    single slab, matching checkerBoard.py:25-31."""
    dims = ref.shape
    pattern = [1, 1, 1]
    for i in (1, 2):
        pattern[i] = max(int(dims[i] * ref.spacing[i] / cell_mm), 1)
    idx = [np.arange(dims[k]) // max(dims[k] // pattern[k], 1) for k in range(3)]
    parity = (
        idx[0][:, None, None] + idx[1][None, :, None] + idx[2][None, None, :]
    ) % 2
    data = np.where(parity == 0, 50, 100).astype(np.uint8)
    return Volume(data, ref.origin, ref.spacing)


def grid_volume(
    ref: Volume, line_mm: float = 30.0, spacing: float = 0.5, sigma: float = 0.5
) -> Volume:
    """Bright gridlines every ``line_mm`` on a fine isotropic grid covering
    ``ref`` (grid.py semantics: Gaussian line profile of width sigma)."""
    lo, hi = ref.bounds
    dims = np.maximum(np.round((hi - lo) / spacing).astype(int) + 1, 1)
    profiles = []
    for k in range(3):
        x = lo[k] + spacing * np.arange(dims[k])
        d = np.abs(((x - lo[k]) + line_mm / 2) % line_mm - line_mm / 2)
        profiles.append(np.exp(-(d**2) / (2 * sigma**2)))
    data = (
        profiles[0][:, None, None]
        + profiles[1][None, :, None]
        + profiles[2][None, None, :]
    )
    return Volume(
        np.clip(data, 0, 1).astype(np.float32), lo, np.full(3, spacing)
    )


def label_contour(vol: Volume) -> Volume:
    """Keep only voxels whose 6-neighborhood contains a different label
    (labelContour.py); interior and background become 0."""
    data = vol.data
    edge = np.zeros_like(data, dtype=bool)
    for ax in range(3):
        d = np.diff(data, axis=ax) != 0
        sl_lo = [slice(None)] * 3
        sl_hi = [slice(None)] * 3
        sl_lo[ax] = slice(0, -1)
        sl_hi[ax] = slice(1, None)
        edge[tuple(sl_lo)] |= d
        edge[tuple(sl_hi)] |= d
    return Volume(np.where(edge, data, 0), vol.origin, vol.spacing)


def trim_transform(input_json: str, n: int, output_json: str = "output.json"):
    with open(input_json) as f:
        data = json.load(f)
    with open(output_json, "w") as f:
        json.dump({"transforms": data["transforms"][:n]}, f)


def register_two_volumes(
    vol1: str,
    vol2: str,
    output: str = "registered.nii.gz",
    out_dir: str = ".",
    masks: tuple | None = None,
    **pipeline_kwargs,
):
    """Register two volumes groupwise, then resample vol1 onto vol2's grid
    through transform0 forward and transform1 inverse
    (register2volumes.py:105-110)."""
    import os

    from ..io.mhd import read_volume, write_volume
    from ..pipeline import run_pipeline
    from ..tools.resample import invert_points, resample_volume
    from ..transforms.io import read_transform

    list_file = os.path.join(out_dir, "register2_volumes.txt")
    with open(list_file, "w") as f:
        f.write(os.path.abspath(vol1) + "\n" + os.path.abspath(vol2) + "\n")
    run_pipeline(list_file, output_dir=out_dir, **pipeline_kwargs)
    t0 = read_transform(os.path.join(out_dir, "transforms", "0.json"))
    t1 = read_transform(os.path.join(out_dir, "transforms", "1.json"))
    src = read_volume(vol1)
    ref = read_volume(vol2)

    # Reslice map (output voxel y in vol2 space -> source voxel):
    # y --t1--> common space --t0^{-1}--> vol1 space, the composition of
    # the reference's "-t transforms/0.json -ti transforms/1.json".
    class _ResliceMap:
        def __call__(self, pts):
            return invert_points(t0, t1(pts))

    out = resample_volume(src, ref, chain=_ResliceMap(), inverse=False)
    write_volume(os.path.join(out_dir, output), out)
    return out
