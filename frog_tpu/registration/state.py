"""Device-side groupwise-registration state: padded point/link arrays.

The reference keeps a pointer-chasing link graph (registration/point.h:19-32,
image.h:10-28): per image a vector of points, each with a ragged vector of
links into other images' point vectors.  On TPU that becomes dense padded
arrays so every kernel is a fixed-shape vectorized op:

* ``xyz``            (N, P, 3)  current (baked) coordinates
* ``xyz2``           (N, P, 3)  transformed coordinates
* ``point_valid``    (N, P)     padding mask
* half-links, grouped per owning image and padded to L:
  ``link_src`` (N, L) source point index, ``link_dst`` (N, L) flattened
  destination ``dst_image * P + dst_point``, ``link_valid`` (N, L)
* hard (landmark-constraint) links with the same layout, padded to H
* ``em``             (N, 3)     chi-mixture parameters (c1, c2, ratio)
* ``affine``         (N, 4, 4)  linear stage transform

Each match (i, pA, j, pB) read from pairs.bin contributes one half-link to
image i and one to image j, exactly as the reference's readPairs does
(imageGroup.cxx:1400-1408).  N images shard over the device mesh; the only
cross-image data a kernel needs is ``xyz2`` of link destinations, which is
an all-gather of (N, P, 3).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..io.pairs import PairGraph

__all__ = ["GroupArrays", "GroupMeta", "build_group_state"]

EM_INIT = (10.0, 300.0, 0.5)  # reference stats.h:94


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GroupArrays:
    xyz: jax.Array  # (N, P, 3) f32
    xyz2: jax.Array  # (N, P, 3) f32
    point_valid: jax.Array  # (N, P) bool
    link_src: jax.Array  # (N, L) i32, sorted ascending per image
    link_dst: jax.Array  # (N, L) i32, flattened img*P + pt
    link_valid: jax.Array  # (N, L) bool
    link_bnd: jax.Array  # (N, P+1) i32 segment boundaries into link_src
    hard_src: jax.Array  # (N, H) i32, sorted ascending per image
    hard_dst: jax.Array  # (N, H) i32
    hard_valid: jax.Array  # (N, H) bool
    hard_bnd: jax.Array  # (N, P+1) i32
    em: jax.Array  # (N, 3) f32
    affine: jax.Array  # (N, 4, 4) f32

    @property
    def n_images(self) -> int:
        return self.xyz.shape[0]

    @property
    def points_per_image(self) -> int:
        return self.xyz.shape[1]


@dataclasses.dataclass
class GroupMeta:
    """Host-side metadata that never touches the device."""

    names: list
    n_points: np.ndarray  # (N,) true point counts (incl. landmark points)
    n_keypoints: np.ndarray  # (N,) counts excluding landmark points
    n_fixed: int
    movable: np.ndarray  # (N,) bool mask (i >= n_fixed)
    landmarks: dict  # name -> list[(image, point_index)]


def build_group_state(
    graph: PairGraph,
    n_fixed: int = 0,
    landmarks: dict | None = None,
    constraint_landmarks: dict | None = None,
    pad_multiple: int = 128,
) -> tuple[GroupArrays, GroupMeta]:
    """Build padded device arrays from a match graph.

    ``landmarks`` maps name -> list of (image, xyz) entries; landmark
    positions are appended as extra (link-less) points, mirroring
    imageGroup.cxx:1161-1226.  Entries in ``constraint_landmarks``
    additionally produce hard links between every same-name pair
    (the -lc path, :1208-1225); plain ``landmarks`` (-l) are evaluation
    only.
    """
    n = graph.n_images
    pts = [np.asarray(img.xyz, np.float32) for img in graph.images]

    landmark_registry: dict = {}
    hard_links: list = [[] for _ in range(n)]

    def place(entries):
        placed = []
        for image, xyz in entries:
            if image >= n:
                continue
            idx = pts[image].shape[0]
            pts[image] = np.concatenate(
                [pts[image], np.asarray(xyz, np.float32)[None]], axis=0
            )
            placed.append((image, idx))
        return placed

    for name, entries in (landmarks or {}).items():
        landmark_registry[name] = place(entries)
    for name, entries in (constraint_landmarks or {}).items():
        placed = place(entries)
        landmark_registry.setdefault(name, []).extend(placed)
        for a_img, a_pt in placed:
            for b_img, b_pt in placed:
                if (a_img, a_pt) != (b_img, b_pt):
                    hard_links[a_img].append((a_pt, b_img, b_pt))

    n_points = np.array([p.shape[0] for p in pts], dtype=np.int64)
    n_keypoints = np.array([img.xyz.shape[0] for img in graph.images], dtype=np.int64)
    p_pad = _round_up(max(int(n_points.max()), 1), pad_multiple)

    xyz = np.zeros((n, p_pad, 3), np.float32)
    point_valid = np.zeros((n, p_pad), bool)
    for i, p in enumerate(pts):
        xyz[i, : p.shape[0]] = p
        point_valid[i, : p.shape[0]] = True

    # Half-links.
    half: list = [[] for _ in range(n)]
    for (i, j), m in graph.matches.items():
        if m.shape[0] == 0:
            continue
        half[i].append(
            np.stack([m[:, 0], j * p_pad + m[:, 1]], axis=1).astype(np.int64)
        )
        half[j].append(
            np.stack([m[:, 1], i * p_pad + m[:, 0]], axis=1).astype(np.int64)
        )
    counts = [int(sum(b.shape[0] for b in blocks)) for blocks in half]
    l_pad = _round_up(max(max(counts), 1), pad_multiple)
    # Links are sorted by source point so segment sums can run as cumsum +
    # static boundary differences (kernels.segment_sum_sorted).  Padding
    # rows carry src = p_pad - 1 to keep the array sorted; their payloads
    # are zeroed upstream (link_valid -> weight 0), so the last segment
    # stays correct.
    link_src = np.zeros((n, l_pad), np.int32)
    link_dst = np.zeros((n, l_pad), np.int32)
    link_valid = np.zeros((n, l_pad), bool)
    link_bnd = np.zeros((n, p_pad + 1), np.int32)
    for i, blocks in enumerate(half):
        if not blocks:
            continue
        cat = np.concatenate(blocks, axis=0)
        order = np.argsort(cat[:, 0], kind="stable")
        cat = cat[order]
        link_src[i, : cat.shape[0]] = cat[:, 0]
        link_src[i, cat.shape[0] :] = p_pad - 1  # padding sorts last
        link_dst[i, : cat.shape[0]] = cat[:, 1]
        link_valid[i, : cat.shape[0]] = True
        link_bnd[i] = np.searchsorted(link_src[i], np.arange(p_pad + 1))

    h_counts = [len(h) for h in hard_links]
    h_pad = _round_up(max(max(h_counts), 1), 8) if max(h_counts) else 1
    hard_src = np.zeros((n, h_pad), np.int32)
    hard_dst = np.zeros((n, h_pad), np.int32)
    hard_valid = np.zeros((n, h_pad), bool)
    hard_bnd = np.zeros((n, p_pad + 1), np.int32)
    for i, entries in enumerate(hard_links):
        entries = sorted(entries)
        for k, (src, dst_img, dst_pt) in enumerate(entries):
            hard_src[i, k] = src
            hard_dst[i, k] = dst_img * p_pad + dst_pt
            hard_valid[i, k] = True
        if entries:
            hard_src[i, len(entries) :] = p_pad - 1
        hard_bnd[i] = np.searchsorted(hard_src[i], np.arange(p_pad + 1))

    em = np.tile(np.asarray(EM_INIT, np.float32), (n, 1))
    affine = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))

    arrays = GroupArrays(
        xyz=jnp.asarray(xyz),
        xyz2=jnp.asarray(xyz),
        point_valid=jnp.asarray(point_valid),
        link_src=jnp.asarray(link_src),
        link_dst=jnp.asarray(link_dst),
        link_valid=jnp.asarray(link_valid),
        link_bnd=jnp.asarray(link_bnd),
        hard_src=jnp.asarray(hard_src),
        hard_dst=jnp.asarray(hard_dst),
        hard_valid=jnp.asarray(hard_valid),
        hard_bnd=jnp.asarray(hard_bnd),
        em=jnp.asarray(em),
        affine=jnp.asarray(affine),
    )
    movable = np.arange(n) >= n_fixed
    meta = GroupMeta(
        names=[img.name for img in graph.images],
        n_points=n_points,
        n_keypoints=n_keypoints,
        n_fixed=n_fixed,
        movable=movable,
        landmarks=landmark_registry,
    )
    return arrays, meta


def bounding_box(arrays: GroupArrays, image_mask: np.ndarray | jax.Array):
    """Axis-aligned bbox over the *current* (baked) coordinates of the
    selected images (imageGroup.cxx:1513-1527)."""
    mask = jnp.asarray(image_mask)[:, None] & arrays.point_valid
    big = jnp.float32(1e30)
    xyz = arrays.xyz
    lo = jnp.min(jnp.where(mask[..., None], xyz, big), axis=(0, 1))
    hi = jnp.max(jnp.where(mask[..., None], xyz, -big), axis=(0, 1))
    return np.asarray(lo, np.float64), np.asarray(hi, np.float64)
