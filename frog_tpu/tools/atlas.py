"""Atlas construction helpers: average/stdev volumes and the common-space
sampling grid.

* ``average_volumes`` — AverageVolumes equivalent (tools/AverageVolumes.cxx
  :53-81): streaming mean and standard deviation over equally-gridded
  volumes.  (The reference has an accumulator-initialization bug at :35-36
  that only works by accident; not reproduced.)
* ``dummy_volume`` — DummyVolumeGenerator equivalent (tools/
  DummyVolumeGenerator.cxx:42-71): empty float volume spanning a bbox.json
  bounding box at a given spacing, defining the common-space grid.
"""
from __future__ import annotations

import json

import numpy as np

from ..io.volume import Volume

__all__ = ["average_volumes", "dummy_volume"]


def average_volumes(volumes) -> tuple[Volume, Volume]:
    """Mean and stdev of volumes sharing one grid.  ``volumes`` is an
    iterable of Volume (or paths)."""
    from ..io.mhd import read_volume

    mean = None
    m2 = None
    count = 0
    first = None
    for v in volumes:
        if not isinstance(v, Volume):
            v = read_volume(v)
        if first is None:
            first = v
            mean = np.zeros(v.shape, np.float64)
            m2 = np.zeros(v.shape, np.float64)
        count += 1
        delta = v.data.astype(np.float64) - mean
        mean += delta / count
        m2 += delta * (v.data.astype(np.float64) - mean)
    if count == 0:
        raise ValueError("no volumes")
    std = np.sqrt(m2 / count)
    return (
        Volume(mean.astype(np.float32), first.origin, first.spacing),
        Volume(std.astype(np.float32), first.origin, first.spacing),
    )


def dummy_volume(bbox, spacing: float) -> Volume:
    """Empty float volume over ``bbox`` = (min_xyz, max_xyz) or a bbox.json
    path, dims = ceil(length / spacing) per axis."""
    if isinstance(bbox, str):
        with open(bbox) as f:
            record = json.load(f)
        lo, hi = record["bbox"]
    else:
        lo, hi = bbox
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    dims = np.maximum(np.ceil((hi - lo) / spacing).astype(int), 1)
    return Volume(
        data=np.zeros(tuple(dims), np.float32),
        origin=lo,
        spacing=np.full(3, float(spacing)),
    )
