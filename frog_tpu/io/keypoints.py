"""Keypoint file formats: csv / csv.gz / bin.

Byte/column-compatible with the reference's formats (readers
match/match.cpp:51-208, writer :94-134): each row is
``x, y, z, scale, laplacianSign, response`` followed by the descriptor
floats (48 for 3D-SURF).  The binary format is the same row as raw float32.
"""
from __future__ import annotations

import dataclasses
import gzip

import numpy as np

__all__ = ["Keypoints", "read_keypoints", "write_keypoints"]


@dataclasses.dataclass
class Keypoints:
    xyz: np.ndarray  # (P, 3) float32
    scale: np.ndarray  # (P,) float32
    laplacian: np.ndarray  # (P,) float32 (sign: -1/0/1 as written by surf3d)
    response: np.ndarray  # (P,) float32
    desc: np.ndarray  # (P, D) float32

    def __len__(self) -> int:
        return self.xyz.shape[0]

    @property
    def ndesc(self) -> int:
        return self.desc.shape[1]

    def select(self, idx) -> "Keypoints":
        return Keypoints(
            xyz=self.xyz[idx],
            scale=self.scale[idx],
            laplacian=self.laplacian[idx],
            response=self.response[idx],
            desc=self.desc[idx],
        )

    def top_by_response(self, n: int, min_response: float = 0.0) -> "Keypoints":
        """Response pruning + top-n, as match does before pairing
        (match.cpp:579-609)."""
        keep = np.flatnonzero(self.response >= min_response)
        if len(keep) > n:
            order = np.argsort(-self.response[keep], kind="stable")
            keep = keep[order[:n]]
        return self.select(keep)

    @staticmethod
    def from_matrix(mat: np.ndarray) -> "Keypoints":
        mat = np.asarray(mat, dtype=np.float32)
        return Keypoints(
            xyz=np.ascontiguousarray(mat[:, 0:3]),
            scale=np.ascontiguousarray(mat[:, 3]),
            laplacian=np.ascontiguousarray(mat[:, 4]),
            response=np.ascontiguousarray(mat[:, 5]),
            desc=np.ascontiguousarray(mat[:, 6:]),
        )

    def to_matrix(self) -> np.ndarray:
        return np.concatenate(
            [
                self.xyz,
                self.scale[:, None],
                self.laplacian[:, None],
                self.response[:, None],
                self.desc,
            ],
            axis=1,
        ).astype(np.float32)


def read_keypoints(path, ndesc: int = 48) -> Keypoints:
    p = str(path)
    if p.endswith(".bin"):
        raw = np.fromfile(p, dtype=np.float32)
        ncols = 6 + ndesc
        n = raw.size // ncols
        return Keypoints.from_matrix(raw[: n * ncols].reshape(n, ncols))
    if p.endswith(".json"):
        import json

        with open(p) as f:
            doc = json.load(f)
        rows = doc["points"] if isinstance(doc, dict) else doc
        width = 6 + ndesc
        if not rows:
            return Keypoints.from_matrix(np.zeros((0, width), np.float32))
        return Keypoints.from_matrix(np.asarray(rows, np.float32))
    cols = _peek_columns(p)
    if cols and cols >= 7:
        from . import native

        mat = native.read_csv_matrix(p, cols)
        if mat is not None:
            return Keypoints.from_matrix(mat)
    try:  # pandas C parser fallback
        import pandas as pd

        mat = pd.read_csv(p, header=None, dtype=np.float32).to_numpy()
        return Keypoints.from_matrix(mat)
    except ImportError:
        pass
    if p.endswith(".gz"):
        with gzip.open(p, "rt") as f:
            text = f.read()
    else:
        with open(p) as f:
            text = f.read()
    rows = []
    for line in text.splitlines():
        line = line.strip().rstrip(",")
        if not line:
            continue
        vals = line.split(",")
        if len(vals) < 7:
            continue
        rows.append([float(v) for v in vals])
    if not rows:
        width = 6 + ndesc
        return Keypoints.from_matrix(np.zeros((0, width), np.float32))
    return Keypoints.from_matrix(np.asarray(rows, dtype=np.float32))


def _peek_columns(path: str) -> int | None:
    try:
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt") as f:
            line = f.readline().strip().rstrip(",")
        return len(line.split(",")) if line else None
    except OSError:
        return None


def write_keypoints(path, kp: Keypoints) -> None:
    p = str(path)
    if p.endswith(".bin"):
        kp.to_matrix().tofile(p)
        return
    if p.endswith(".json"):
        # surf3d's -json writer option (reference option schema
        # frog.json:354): same row layout as the CSV, wrapped in a record
        import json

        mat = kp.to_matrix()
        with open(p, "w") as f:
            json.dump(
                {
                    "nbPoints": int(mat.shape[0]),
                    "descriptorLength": int(kp.ndesc),
                    "points": [[round(float(v), 9) for v in row]
                               for row in mat],
                },
                f,
            )
        return
    mat = kp.to_matrix()
    from . import native

    if native.write_csv_matrix(p, mat):
        return
    lines = [",".join(_fmt(v) for v in row) for row in mat]
    body = "\n".join(lines) + "\n"
    if p.endswith(".gz"):
        with gzip.open(p, "wt") as f:
            f.write(body)
    else:
        with open(p, "w") as f:
            f.write(body)


def _fmt(v: float) -> str:
    return f"{v:.9g}"
