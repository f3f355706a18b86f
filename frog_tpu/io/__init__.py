from .mhd import read_mhd, read_volume, write_mhd, write_volume
from .nifti import read_nifti, write_nifti
from .volume import Volume

__all__ = [
    "Volume",
    "read_mhd",
    "read_nifti",
    "read_volume",
    "write_mhd",
    "write_nifti",
    "write_volume",
]
