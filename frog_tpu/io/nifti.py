"""Minimal NIfTI-1 reader/writer (.nii / .nii.gz), no external dependencies.

Covers what the pipeline needs — scalar and 3-component float volumes with
axis-aligned orientation — replacing the reference's use of
vtkNIFTIImageReader/Writer (tools/transformIO.h:204-207, 441-454) and
nibabel (FROG.py:70-103).  Arbitrary-orientation inputs are reoriented to
RAS on load (axis permutations + flips derived from the affine), which is
exactly the reference driver's ``flipAndSaveToRAS`` semantics.
"""
from __future__ import annotations

import gzip
import struct

import numpy as np

from .volume import Volume

__all__ = ["read_nifti", "write_nifti"]

_DTYPES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    256: np.int8,
    512: np.uint16,
    768: np.uint32,
}
_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


def _open(path, mode="rb"):
    p = str(path)
    if p.endswith(".gz"):
        return gzip.open(p, mode)
    return open(p, mode)


def _read_all_bytes(path) -> bytes:
    """Whole file, gunzipped if .gz — through the native libdeflate codec
    when available (~3x python gzip on ~20 MB volume payloads), falling
    back to the gzip module."""
    p = str(path)
    if p.endswith(".gz"):
        from .native import read_file_bytes

        raw = read_file_bytes(p)
        if raw is not None:
            return raw
    with _open(p) as f:
        return f.read()


def _write_all_bytes(path, data: bytes) -> None:
    """Whole-file write, gzipping .gz paths — native level-1 gzip when
    available (~20x python gzip's default level 9 on volume payloads;
    artifacts are latency-, not size-bound), else the gzip module."""
    p = str(path)
    if p.endswith(".gz"):
        from .native import write_file_bytes

        if write_file_bytes(p, data):
            return
        with gzip.open(p, "wb", compresslevel=1) as f:
            f.write(data)
        return
    with open(p, "wb") as f:
        f.write(data)


def _quaternion_to_matrix(b, c, d):
    a2 = 1.0 - (b * b + c * c + d * d)
    a = np.sqrt(max(a2, 0.0))
    return np.array(
        [
            [a * a + b * b - c * c - d * d, 2 * (b * c - a * d), 2 * (b * d + a * c)],
            [2 * (b * c + a * d), a * a + c * c - b * b - d * d, 2 * (c * d - a * b)],
            [2 * (b * d - a * c), 2 * (c * d + a * b), a * a + d * d - b * b - c * c],
        ]
    )


def read_nifti(path, reorient_to_ras: bool = True) -> Volume:
    """Read a .nii/.nii.gz file into a Volume.

    Multi-component images (dim[0] == 5, e.g. VTK-written B-spline
    coefficient grids) come back with shape (nx, ny, nz, ncomp).
    """
    raw = _read_all_bytes(path)

    hdr = raw[:348]
    (sizeof_hdr,) = struct.unpack_from("<i", hdr, 0)
    if sizeof_hdr != 348:
        raise ValueError(f"{path}: not a little-endian NIfTI-1 file")
    dim = struct.unpack_from("<8h", hdr, 40)
    (datatype,) = struct.unpack_from("<h", hdr, 70)
    pixdim = struct.unpack_from("<8f", hdr, 76)
    (vox_offset,) = struct.unpack_from("<f", hdr, 108)
    (scl_slope,) = struct.unpack_from("<f", hdr, 112)
    (scl_inter,) = struct.unpack_from("<f", hdr, 116)
    (qform_code,) = struct.unpack_from("<h", hdr, 252)
    (sform_code,) = struct.unpack_from("<h", hdr, 254)
    quatern = struct.unpack_from("<3f", hdr, 256)
    qoffset = struct.unpack_from("<3f", hdr, 268)
    srow = np.array(struct.unpack_from("<12f", hdr, 280)).reshape(3, 4)
    magic = hdr[344:348]
    if magic[:3] not in (b"n+1", b"ni1"):
        raise ValueError(f"{path}: bad NIfTI magic {magic!r}")

    ndim = dim[0]
    nx, ny, nz = (max(dim[1], 1), max(dim[2], 1), max(dim[3], 1))
    ncomp = max(dim[5], 1) if ndim >= 5 else 1
    dt = np.dtype(_DTYPES[datatype])

    count = nx * ny * nz * ncomp
    data = np.frombuffer(raw, dtype=dt, count=count, offset=int(vox_offset))
    # NIfTI stores x fastest; component dim (dim5) is slowest of the spatial
    # block (t=1 assumed).
    data = data.reshape((ncomp, nz, ny, nx)).transpose(3, 2, 1, 0)
    if ncomp == 1:
        data = data[..., 0]

    if scl_slope not in (0.0, 1.0) or scl_inter != 0.0:
        slope = scl_slope if scl_slope != 0 else 1.0
        data = data.astype(np.float32) * slope + scl_inter

    # Build the affine: prefer sform, then qform, then pixdim only.
    if sform_code > 0:
        affine = np.eye(4)
        affine[:3, :] = srow
    elif qform_code > 0:
        rot = _quaternion_to_matrix(*quatern)
        qfac = -1.0 if pixdim[0] < 0 else 1.0
        scales = np.array([pixdim[1], pixdim[2], pixdim[3] * qfac])
        affine = np.eye(4)
        affine[:3, :3] = rot * scales
        affine[:3, 3] = qoffset
    else:
        affine = np.diag([pixdim[1], pixdim[2], pixdim[3], 1.0])

    data = np.ascontiguousarray(data)
    if reorient_to_ras:
        data, affine = _to_ras(data, affine)

    spacing = np.linalg.norm(affine[:3, :3], axis=0)
    origin = affine[:3, 3]
    return Volume(data=data, origin=origin, spacing=spacing)


def _to_ras(data: np.ndarray, affine: np.ndarray):
    """Reorient so the affine becomes axis-aligned with positive spacing.

    Equivalent to nibabel's ``as_closest_canonical`` for orthogonal
    orientations (the reference pipeline's assumption, FROG.py:70-103).
    """
    rot = affine[:3, :3]
    # For each voxel axis find the dominant world axis and its sign.
    perm = np.argmax(np.abs(rot), axis=0)  # world axis of each voxel axis
    if len(set(perm.tolist())) != 3:
        return data, affine  # degenerate; leave untouched
    signs = np.sign(rot[perm, np.arange(3)])

    # Flip axes with negative direction.
    slicer = tuple(slice(None, None, -1) if s < 0 else slice(None) for s in signs)
    nd = data[slicer]
    new_affine = affine.copy()
    shape = np.array(data.shape[:3])
    for ax, s in enumerate(signs):
        if s < 0:
            new_affine[:3, 3] = new_affine[:3, 3] + new_affine[:3, ax] * (shape[ax] - 1)
            new_affine[:3, ax] = -new_affine[:3, ax]

    # Permute voxel axes so voxel axis i maps to world axis i.
    inv = np.argsort(perm)
    order = tuple(inv) + tuple(range(3, data.ndim))
    nd = nd.transpose(order)
    pa = np.eye(4)
    pa[:3, :3] = new_affine[:3, :3][:, inv]
    pa[:3, 3] = new_affine[:3, 3]
    return np.ascontiguousarray(nd), pa


def write_nifti(path, vol: Volume, dtype=None) -> None:
    """Write a Volume to .nii or .nii.gz (RAS axis-aligned sform+qform)."""
    data = vol.data if dtype is None else vol.data.astype(dtype)
    if data.ndim == 3:
        nx, ny, nz = data.shape
        ncomp = 1
    else:
        nx, ny, nz, ncomp = data.shape
    dt = np.dtype(data.dtype)
    if dt not in _CODES:
        data = data.astype(np.float32)
        dt = np.dtype(np.float32)
    code = _CODES[dt]

    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    ndim = 3 if ncomp == 1 else 5
    dim = [ndim, nx, ny, nz, 1, ncomp, 1, 1]
    struct.pack_into("<8h", hdr, 40, *dim)
    if ncomp > 1:
        struct.pack_into("<h", hdr, 68, 1007)  # NIFTI_INTENT_VECTOR
    struct.pack_into("<h", hdr, 70, code)
    struct.pack_into("<h", hdr, 72, dt.itemsize * 8)
    sp = vol.spacing
    struct.pack_into("<8f", hdr, 76, 1.0, sp[0], sp[1], sp[2], 1.0, 1.0, 1.0, 1.0)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)  # scl_slope
    struct.pack_into("<b", hdr, 123, 2)  # xyzt_units: mm
    struct.pack_into("<h", hdr, 252, 1)  # qform_code
    struct.pack_into("<h", hdr, 254, 1)  # sform_code
    # Identity quaternion; offsets = origin.
    struct.pack_into("<3f", hdr, 256, 0.0, 0.0, 0.0)
    struct.pack_into("<3f", hdr, 268, *vol.origin)
    srow = np.zeros((3, 4), dtype=np.float32)
    srow[0, 0], srow[1, 1], srow[2, 2] = sp
    srow[:, 3] = vol.origin
    struct.pack_into("<12f", hdr, 280, *srow.ravel())
    hdr[344:348] = b"n+1\x00"

    if ncomp == 1:
        payload = data.transpose(2, 1, 0)  # x fastest
    else:
        payload = data.transpose(3, 2, 1, 0)
    _write_all_bytes(
        path,
        bytes(hdr) + b"\x00" * 4 + np.ascontiguousarray(payload).tobytes(),
    )
