"""pairs.bin — the match-graph interchange format.

Binary layout kept bit-compatible with the reference (writer
match/match.cpp:675-744, reader registration/imageGroup.cxx:1353-1417):

    uint16 nImages
    per image:
        uint16 nameLength; char[nameLength] name
        float64[3] refTranslation
        pointId nPoints
        nPoints x float32[6]  (x, y, z, scale, laplacianSign, response)
    repeated pair blocks until EOF:
        uint16 imageA; uint16 imageB; uint32 nMatches
        nMatches x (pointId pA, pointId pB)

``pointId`` is uint32 by default (tools/pointIdType.h with INT_PTIDS on —
the reference build default) and uint16 otherwise.
"""
from __future__ import annotations

import dataclasses
import struct

import numpy as np

__all__ = ["ImagePoints", "PairGraph", "read_pairs", "write_pairs",
           "merge_pairs"]


@dataclasses.dataclass
class ImagePoints:
    name: str
    ref_translation: np.ndarray  # (3,) float64
    xyz: np.ndarray  # (P, 3) float32
    other: np.ndarray  # (P, 3) float32: scale, laplacianSign, response


@dataclasses.dataclass
class PairGraph:
    images: list  # list[ImagePoints]
    matches: dict  # (i, j) -> (M, 2) int64 array of (pointInI, pointInJ)

    @property
    def n_images(self) -> int:
        return len(self.images)

    @property
    def n_matches(self) -> int:
        return sum(int(m.shape[0]) for m in self.matches.values())


def read_pairs(path, point_id_dtype=np.uint32) -> PairGraph:
    with open(path, "rb") as f:
        raw = f.read()
    pos = 0
    (n_images,) = struct.unpack_from("<H", raw, pos)
    pos += 2
    pid = np.dtype(point_id_dtype)
    images = []
    for _ in range(n_images):
        (name_len,) = struct.unpack_from("<H", raw, pos)
        pos += 2
        name = raw[pos : pos + name_len].decode("latin-1")
        pos += name_len
        ref = np.frombuffer(raw, dtype="<f8", count=3, offset=pos).copy()
        pos += 24
        n_points = int(np.frombuffer(raw, dtype=pid, count=1, offset=pos)[0])
        pos += pid.itemsize
        pts = np.frombuffer(raw, dtype="<f4", count=n_points * 6, offset=pos)
        pts = pts.reshape(n_points, 6).copy()
        pos += n_points * 24
        images.append(
            ImagePoints(
                name=name,
                ref_translation=ref,
                xyz=np.ascontiguousarray(pts[:, :3]),
                other=np.ascontiguousarray(pts[:, 3:]),
            )
        )

    matches: dict = {}
    while pos + 8 <= len(raw):
        i, j = struct.unpack_from("<HH", raw, pos)
        pos += 4
        (size,) = struct.unpack_from("<I", raw, pos)
        pos += 4
        if size == 0:
            raise ValueError("pairs.bin: zero-size pair block")
        m = np.frombuffer(raw, dtype=pid, count=size * 2, offset=pos)
        pos += size * 2 * pid.itemsize
        block = m.reshape(size, 2).astype(np.int64)
        if (i, j) in matches:
            matches[(i, j)] = np.concatenate([matches[(i, j)], block])
        else:
            matches[(i, j)] = block
    return PairGraph(images=images, matches=matches)


def write_pairs(path, graph: PairGraph, point_id_dtype=np.uint32) -> None:
    pid = np.dtype(point_id_dtype)
    out = bytearray()
    out += struct.pack("<H", len(graph.images))
    for img in graph.images:
        name = img.name.encode("latin-1")
        out += struct.pack("<H", len(name))
        out += name
        out += np.asarray(img.ref_translation, dtype="<f8").tobytes()
        n = img.xyz.shape[0]
        out += np.asarray([n], dtype=pid).tobytes()
        block = np.concatenate(
            [np.asarray(img.xyz, np.float32), np.asarray(img.other, np.float32)],
            axis=1,
        )
        out += np.ascontiguousarray(block, dtype="<f4").tobytes()
    for (i, j), m in sorted(graph.matches.items()):
        if m.shape[0] == 0:
            continue
        out += struct.pack("<HHI", i, j, m.shape[0])
        out += np.ascontiguousarray(m, dtype=pid).tobytes()
    with open(path, "wb") as f:
        f.write(bytes(out))


def merge_pairs(a: PairGraph, b: PairGraph) -> PairGraph:
    """Union of two match graphs over the SAME volume list — the
    reference's mergePairs desk action, used when matches come from two
    extractors (e.g. SURF + RAW subvolumes, js/lib/FROG.js:162-171).

    Each image's point list is the concatenation of the two sets, with
    the second graph's match indices offset past the first's points.
    """
    if len(a.images) != len(b.images):
        raise ValueError(
            f"graphs cover {len(a.images)} vs {len(b.images)} images"
        )
    images = []
    offsets = []
    for ia, ib in zip(a.images, b.images):
        offsets.append(ia.xyz.shape[0])
        images.append(
            ImagePoints(
                name=ia.name,
                ref_translation=ia.ref_translation,
                xyz=np.concatenate([ia.xyz, ib.xyz]),
                other=np.concatenate([ia.other, ib.other]),
            )
        )
    matches: dict = {}
    for (i, j), m in a.matches.items():
        matches[(i, j)] = np.asarray(m, np.int64)
    for (i, j), m in b.matches.items():
        shifted = np.asarray(m, np.int64) + np.asarray(
            [[offsets[i], offsets[j]]], np.int64
        )
        if (i, j) in matches:
            matches[(i, j)] = np.concatenate([matches[(i, j)], shifted])
        else:
            matches[(i, j)] = shifted
    return PairGraph(images=images, matches=matches)
