"""Minimal polygonal mesh IO: PLY / OBJ / STL / legacy-VTK / VTP.

Replaces the reference's VTK readers/writers (tools/transformIO.h:29-100)
for the mesh-transform tool.  Covers triangle/polygon meshes with float
vertices — the subset the pipeline touches.
"""
from __future__ import annotations

import dataclasses
import struct

import numpy as np

__all__ = ["PolyData", "read_polydata", "write_polydata"]


@dataclasses.dataclass
class PolyData:
    points: np.ndarray  # (N, 3) float32
    faces: list  # list of index lists


def read_polydata(path) -> PolyData:
    p = str(path).lower()
    if p.endswith(".ply"):
        return _read_ply(path)
    if p.endswith(".obj"):
        return _read_obj(path)
    if p.endswith(".stl"):
        return _read_stl(path)
    if p.endswith(".vtk"):
        return _read_vtk(path)
    raise ValueError(f"unsupported mesh format: {path}")


def write_polydata(path, mesh: PolyData) -> None:
    p = str(path).lower()
    if p.endswith(".ply"):
        _write_ply(path, mesh)
    elif p.endswith(".obj"):
        _write_obj(path, mesh)
    elif p.endswith(".stl"):
        _write_stl(path, mesh)
    elif p.endswith(".vtk"):
        _write_vtk(path, mesh)
    elif p.endswith(".vtp"):
        _write_vtp(path, mesh)
    else:
        raise ValueError(f"unsupported mesh format: {path}")


# ---------------------------------------------------------------------- PLY

def _read_ply(path) -> PolyData:
    with open(path, "rb") as f:
        raw = f.read()
    header_end = raw.find(b"end_header\n") + len(b"end_header\n")
    header = raw[:header_end].decode("latin-1").splitlines()
    fmt = "ascii"
    n_verts = n_faces = 0
    vert_props: list[str] = []
    in_vertex = False
    for line in header:
        t = line.split()
        if not t:
            continue
        if t[0] == "format":
            fmt = t[1]
        elif t[0] == "element":
            in_vertex = t[1] == "vertex"
            if t[1] == "vertex":
                n_verts = int(t[2])
            elif t[1] == "face":
                n_faces = int(t[2])
        elif t[0] == "property" and in_vertex:
            vert_props.append(t[-1])

    if fmt == "ascii":
        body = raw[header_end:].decode("latin-1").split()
        nv = len(vert_props)
        vals = np.asarray(body[: n_verts * nv], np.float32).reshape(n_verts, nv)
        idx = [vert_props.index(c) for c in ("x", "y", "z")]
        pts = vals[:, idx]
        pos = n_verts * nv
        faces = []
        for _ in range(n_faces):
            k = int(body[pos])
            faces.append([int(v) for v in body[pos + 1 : pos + 1 + k]])
            pos += 1 + k
        return PolyData(points=pts.astype(np.float32), faces=faces)

    # binary little endian
    off = header_end
    nv = len(vert_props)
    vals = np.frombuffer(raw, "<f4", count=n_verts * nv, offset=off).reshape(
        n_verts, nv
    )
    idx = [vert_props.index(c) for c in ("x", "y", "z")]
    pts = np.ascontiguousarray(vals[:, idx])
    off += n_verts * nv * 4
    faces = []
    for _ in range(n_faces):
        (k,) = struct.unpack_from("<B", raw, off)
        off += 1
        faces.append(list(np.frombuffer(raw, "<i4", count=k, offset=off)))
        off += 4 * k
    return PolyData(points=pts, faces=faces)


def _write_ply(path, mesh: PolyData) -> None:
    with open(path, "wb") as f:
        f.write(
            (
                "ply\nformat binary_little_endian 1.0\n"
                f"element vertex {len(mesh.points)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                f"element face {len(mesh.faces)}\n"
                "property list uchar int vertex_indices\nend_header\n"
            ).encode()
        )
        f.write(np.asarray(mesh.points, "<f4").tobytes())
        for face in mesh.faces:
            f.write(struct.pack("<B", len(face)))
            f.write(np.asarray(face, "<i4").tobytes())


# ---------------------------------------------------------------------- OBJ

def _read_obj(path) -> PolyData:
    pts = []
    faces = []
    with open(path) as f:
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                pts.append([float(v) for v in t[1:4]])
            elif t[0] == "f":
                faces.append([int(v.split("/")[0]) - 1 for v in t[1:]])
    return PolyData(points=np.asarray(pts, np.float32), faces=faces)


def _write_obj(path, mesh: PolyData) -> None:
    with open(path, "w") as f:
        for p in mesh.points:
            f.write(f"v {p[0]:.7g} {p[1]:.7g} {p[2]:.7g}\n")
        for face in mesh.faces:
            f.write("f " + " ".join(str(int(v) + 1) for v in face) + "\n")


# ---------------------------------------------------------------------- STL

def _read_stl(path) -> PolyData:
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:5] == b"solid" and b"facet" in raw[:500]:
        # ascii
        pts = []
        for line in raw.decode("latin-1").splitlines():
            t = line.split()
            if t and t[0] == "vertex":
                pts.append([float(v) for v in t[1:4]])
        pts = np.asarray(pts, np.float32)
    else:
        (n,) = struct.unpack_from("<I", raw, 80)
        tri = np.frombuffer(raw, np.uint8, count=n * 50, offset=84).reshape(n, 50)
        vert_bytes = tri[:, 12:48].copy()
        pts = vert_bytes.view("<f4").reshape(n * 3, 3)
    faces = [[3 * i, 3 * i + 1, 3 * i + 2] for i in range(len(pts) // 3)]
    return PolyData(points=np.ascontiguousarray(pts), faces=faces)


def _write_stl(path, mesh: PolyData) -> None:
    tris = [f for f in mesh.faces if len(f) == 3]
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for face in tris:
            a, b, c = (mesh.points[i] for i in face)
            n = np.cross(b - a, c - a)
            nn = np.linalg.norm(n)
            n = n / nn if nn > 0 else n
            f.write(np.asarray(n, "<f4").tobytes())
            f.write(np.asarray([a, b, c], "<f4").tobytes())
            f.write(b"\0\0")


# ---------------------------------------------------------------------- VTK

def _read_vtk(path) -> PolyData:
    with open(path, "rb") as f:
        raw = f.read().decode("latin-1", errors="replace")
    tokens = raw.split()
    i = tokens.index("POINTS")
    n = int(tokens[i + 1])
    vals = np.asarray(tokens[i + 3 : i + 3 + 3 * n], np.float32).reshape(n, 3)
    faces = []
    if "POLYGONS" in tokens:
        j = tokens.index("POLYGONS")
        n_faces = int(tokens[j + 1])
        pos = j + 3
        for _ in range(n_faces):
            k = int(tokens[pos])
            faces.append([int(v) for v in tokens[pos + 1 : pos + 1 + k]])
            pos += 1 + k
    return PolyData(points=vals, faces=faces)


def _write_vtk(path, mesh: PolyData) -> None:
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\nfrog_tpu mesh\nASCII\n")
        f.write("DATASET POLYDATA\n")
        f.write(f"POINTS {len(mesh.points)} float\n")
        for p in mesh.points:
            f.write(f"{p[0]:.7g} {p[1]:.7g} {p[2]:.7g}\n")
        total = sum(len(f) + 1 for f in mesh.faces)
        f.write(f"POLYGONS {len(mesh.faces)} {total}\n")
        for face in mesh.faces:
            f.write(f"{len(face)} " + " ".join(str(int(v)) for v in face) + "\n")


def _write_vtp(path, mesh: PolyData) -> None:
    tris = mesh.faces
    conn = " ".join(str(int(v)) for face in tris for v in face)
    offs = []
    acc = 0
    for face in tris:
        acc += len(face)
        offs.append(acc)
    pts = " ".join(f"{v:.7g}" for v in np.asarray(mesh.points).ravel())
    with open(path, "w") as f:
        f.write(
            '<?xml version="1.0"?>\n'
            '<VTKFile type="PolyData" version="0.1" byte_order="LittleEndian">\n'
            "<PolyData>\n"
            f'<Piece NumberOfPoints="{len(mesh.points)}" NumberOfPolys="{len(tris)}">\n'
            '<Points><DataArray type="Float32" NumberOfComponents="3" '
            f'format="ascii">{pts}</DataArray></Points>\n'
            '<Polys><DataArray type="Int32" Name="connectivity" '
            f'format="ascii">{conn}</DataArray>\n'
            '<DataArray type="Int32" Name="offsets" format="ascii">'
            f"{' '.join(map(str, offs))}</DataArray></Polys>\n"
            "</Piece>\n</PolyData>\n</VTKFile>\n"
        )
