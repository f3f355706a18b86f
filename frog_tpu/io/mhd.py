"""MetaImage (.mhd/.mha, .raw/.zraw) reader/writer.

The reference reads/writes MHD through VTK (tools/VolumeTransform.cxx:146-162,
tools/DummyVolumeGenerator.cxx:58-66); this is a dependency-free equivalent
supporting the subset the pipeline produces: 3D volumes, optional zlib
compression, local or external data files.
"""
from __future__ import annotations

import os
import zlib

import numpy as np

from .volume import Volume

__all__ = ["read_mhd", "write_mhd"]

_MET_TYPES = {
    "MET_UCHAR": np.uint8,
    "MET_CHAR": np.int8,
    "MET_USHORT": np.uint16,
    "MET_SHORT": np.int16,
    "MET_UINT": np.uint32,
    "MET_INT": np.int32,
    "MET_FLOAT": np.float32,
    "MET_DOUBLE": np.float64,
}
_MET_NAMES = {np.dtype(v): k for k, v in _MET_TYPES.items()}


def read_mhd(path) -> Volume:
    path = str(path)
    header: dict[str, str] = {}
    data_start = None
    with open(path, "rb") as f:
        while True:
            line = f.readline()
            if not line:
                break
            text = line.decode("latin-1").strip()
            if "=" not in text:
                continue
            key, _, value = text.partition("=")
            header[key.strip()] = value.strip()
            if key.strip() == "ElementDataFile":
                data_start = f.tell()
                break

    dims = [int(x) for x in header["DimSize"].split()]
    dtype = np.dtype(_MET_TYPES[header.get("ElementType", "MET_FLOAT")])
    ncomp = int(header.get("ElementNumberOfChannels", "1"))
    spacing = [
        float(x)
        for x in header.get(
            "ElementSpacing", header.get("ElementSize", "1 1 1")
        ).split()
    ]
    origin = [
        float(x)
        for x in header.get(
            "Offset", header.get("Origin", header.get("Position", "0 0 0"))
        ).split()
    ]
    compressed = header.get("CompressedData", "False").lower() == "true"

    datafile = header["ElementDataFile"]
    if datafile.upper() == "LOCAL":
        with open(path, "rb") as f:
            f.seek(data_start)
            payload = f.read()
    else:
        if not os.path.isabs(datafile):
            datafile = os.path.join(os.path.dirname(path), datafile)
        with open(datafile, "rb") as f:
            payload = f.read()

    if compressed:
        payload = zlib.decompress(payload)

    count = int(np.prod(dims)) * ncomp
    data = np.frombuffer(payload, dtype=dtype, count=count)
    # MHD data is x-fastest: shape on disk is (z, y, x[, comp]).
    if ncomp == 1:
        data = data.reshape(dims[::-1]).transpose(2, 1, 0)
    else:
        data = data.reshape((*dims[::-1], ncomp)).transpose(2, 1, 0, 3)
    return Volume(
        data=np.ascontiguousarray(data),
        origin=np.array(origin[:3]),
        spacing=np.array(spacing[:3]),
    )


def write_mhd(path, vol: Volume, compressed: bool | None = None) -> None:
    """Write .mhd + .raw/.zraw (or a single .mha with LOCAL data)."""
    path = str(path)
    data = vol.data
    dims = data.shape[:3]
    ncomp = vol.ncomp
    dt = np.dtype(data.dtype)
    if dt not in _MET_NAMES:
        data = data.astype(np.float32)
        dt = np.dtype(np.float32)

    if ncomp == 1:
        payload = np.ascontiguousarray(data.transpose(2, 1, 0)).tobytes()
    else:
        payload = np.ascontiguousarray(data.transpose(2, 1, 0, 3)).tobytes()

    is_mha = path.endswith(".mha")
    if compressed is None:
        compressed = not is_mha
    if compressed:
        payload = zlib.compress(payload)

    lines = [
        "ObjectType = Image",
        "NDims = 3",
        "BinaryData = True",
        "BinaryDataByteOrderMSB = False",
        f"CompressedData = {compressed}",
        "TransformMatrix = 1 0 0 0 1 0 0 0 1",
        f"Offset = {vol.origin[0]} {vol.origin[1]} {vol.origin[2]}",
        "CenterOfRotation = 0 0 0",
        "AnatomicalOrientation = RAI",
        f"ElementSpacing = {vol.spacing[0]} {vol.spacing[1]} {vol.spacing[2]}",
        f"DimSize = {dims[0]} {dims[1]} {dims[2]}",
        f"ElementType = {_MET_NAMES[dt]}",
    ]
    if ncomp > 1:
        lines.append(f"ElementNumberOfChannels = {ncomp}")

    if is_mha:
        lines.append("ElementDataFile = LOCAL")
        with open(path, "wb") as f:
            f.write(("\n".join(lines) + "\n").encode())
            f.write(payload)
    else:
        dataname = os.path.basename(path)[:-4] + (".zraw" if compressed else ".raw")
        lines.append(f"ElementDataFile = {dataname}")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        with open(os.path.join(os.path.dirname(path) or ".", dataname), "wb") as f:
            f.write(payload)


def read_volume(path, reorient_to_ras: bool = True) -> Volume:
    """Dispatch on extension (.nii/.nii.gz/.mhd/.mha)."""
    from .nifti import read_nifti

    p = str(path)
    if p.endswith((".nii", ".nii.gz")):
        return read_nifti(p, reorient_to_ras=reorient_to_ras)
    if p.endswith((".mhd", ".mha")):
        return read_mhd(p)
    raise ValueError(f"unsupported volume format: {p}")


def write_volume(path, vol: Volume, dtype=None) -> None:
    from .nifti import write_nifti

    p = str(path)
    if p.endswith((".nii", ".nii.gz")):
        write_nifti(p, vol, dtype=dtype)
    elif p.endswith((".mhd", ".mha")):
        write_mhd(p, vol if dtype is None else vol.astype(dtype))
    else:
        raise ValueError(f"unsupported volume format: {p}")
