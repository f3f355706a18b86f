"""Device-side groupwise-registration state: padded point/link arrays.

The reference keeps a pointer-chasing link graph (registration/point.h:19-32,
image.h:10-28): per image a vector of points, each with a ragged vector of
links into other images' point vectors.  On TPU that becomes dense padded
arrays so every kernel is a fixed-shape vectorized op:

* ``xyz``            (N, P, 3)  current (baked) coordinates
* ``xyz2``           (N, P, 3)  transformed coordinates
* ``point_valid``    (N, P)     padding mask
* half-links as a **padded per-point table**: ``link_dst`` (N, P, K) holds
  flattened destinations ``dst_image * P + dst_point`` of the up-to-K links
  of each source point, ``link_valid`` (N, P, K) the padding mask.  The
  source point is implicit in the row — so link->point reductions are a
  dense sum over the K axis (no scatter, no segment boundaries) and the
  only remaining gather is the destination-position lookup.  (Profiled on
  the TPU: this layout runs the link pass ~3x faster than a sorted-CSR +
  cumsum segment sum.)
* **virtual rows**: the link-count distribution has a long tail (measured
  at reference scale: median 18, p99 22, max 39 links/point), and a TPU
  gather fetches one full tile per index whether or not the slot is valid
  — so padding every point's row to the global max wastes most of the
  dominant per-iteration HBM traffic.  Instead K is chosen near the knee
  of the distribution and a high-degree point's surplus links spill into
  extra rows that DUPLICATE its coordinates.  Because every per-point
  quantity the optimizer derives is either a per-link sum (E, EM, census)
  or flows through position-determined weights (the B-spline basis row of
  a duplicate position is identical, so its grid scatter lands in the same
  cells; an affine transforms duplicates identically), virtual rows are
  algebraically equivalent to wider rows — no kernel changes, ~2x fewer
  gather tiles at reference scale.  ``GroupMeta.row_src`` maps rows back
  to true point indices for outputs that report source point ids.
* hard (landmark-constraint) links with the same layout, (N, P, KH)
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
    link_dst: jax.Array  # (N, P, K) i32, flattened img*P + pt
    link_valid: jax.Array  # (N, P, K) bool
    hard_dst: jax.Array  # (N, P, KH) i32
    hard_valid: jax.Array  # (N, P, KH) bool
    em: jax.Array  # (N, 3) f32
    affine: jax.Array  # (N, 4, 4) f32

    @property
    def n_images(self) -> int:
        return self.xyz.shape[0]

    @property
    def points_per_image(self) -> int:
        return self.xyz.shape[1]

    @property
    def links_per_point(self) -> int:
        return self.link_dst.shape[2]


@dataclasses.dataclass
class GroupMeta:
    """Host-side metadata that never touches the device."""

    names: list
    n_points: np.ndarray  # (N,) true point counts (incl. landmark points)
    n_keypoints: np.ndarray  # (N,) counts excluding landmark points
    n_fixed: int
    movable: np.ndarray  # (N,) bool mask (i >= n_fixed)
    landmarks: dict  # name -> list[(image, point_index)]
    # Host mirrors of the initial padded coordinates/mask — keep the linear
    # anchor setup (imageGroup.cxx:806-848) free of device readbacks (each
    # costs a network RTT on a remote-attached TPU).
    xyz_host: np.ndarray | None = None  # (N, P, 3) f32
    point_valid_host: np.ndarray | None = None  # (N, P) bool
    has_constraints: bool = False  # any hard (-lc) links present
    # (N, P) i32: true point index of each row (virtual rows map to the
    # point whose surplus links they carry; real/padding rows map to
    # themselves).  Outputs that report SOURCE point ids (pairs.csv.gz)
    # translate through this; kernels never need it.
    row_src: np.ndarray | None = None


@jax.jit
def _jit_decode_links(enc):
    """Split the wire-encoded link table (valid -> dst + 1, invalid -> 0)
    back into (link_dst, link_valid) on device."""
    return jnp.maximum(enc - 1, 0), enc > 0


def _pack_table(per_image_links: list, n: int, p_pad: int, k_multiple: int = 8):
    """Pack per-image (src, dst_flat) link lists into a (N, P, K) table."""
    counts = np.zeros((n, p_pad), np.int64)
    for i, links in enumerate(per_image_links):
        if len(links):
            src = np.asarray([l[0] for l in links], np.int64)
            np.add.at(counts[i], src, 1)
    k_max = int(counts.max()) if counts.size else 0
    k_pad = max(_round_up(max(k_max, 1), k_multiple), k_multiple)
    dst = np.zeros((n, p_pad, k_pad), np.int32)
    valid = np.zeros((n, p_pad, k_pad), bool)
    fill = np.zeros((n, p_pad), np.int64)
    for i, links in enumerate(per_image_links):
        for src, dflat in links:
            k = fill[i, src]
            dst[i, src, k] = dflat
            valid[i, src, k] = True
            fill[i, src] = k + 1
    return dst, valid


def build_group_state(
    graph: PairGraph,
    n_fixed: int = 0,
    landmarks: dict | None = None,
    constraint_landmarks: dict | None = None,
    pad_multiple: int = 128,
    links_per_row: int | None = None,
) -> tuple[GroupArrays, GroupMeta]:
    """Build padded device arrays from a match graph.

    ``landmarks`` maps name -> list of (image, xyz) entries; landmark
    positions are appended as extra (link-less) points, mirroring
    imageGroup.cxx:1161-1226.  Entries in ``constraint_landmarks``
    additionally produce hard links between every same-name pair
    (the -lc path, :1208-1225); plain ``landmarks`` (-l) are evaluation
    only.

    ``links_per_row`` forces the K-table row width (surplus links spill
    into virtual rows); None picks the tile-count-minimizing width.
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

    # Per-image half-link lists (src point, dst image, dst point), sorted
    # by source with a per-source slot rank (vectorized).
    half_src: list = [[] for _ in range(n)]
    half_di: list = [[] for _ in range(n)]
    half_dp: list = [[] for _ in range(n)]
    for (i, j), m in graph.matches.items():
        if m.shape[0] == 0:
            continue
        half_src[i].append(m[:, 0])
        half_di[i].append(np.full(m.shape[0], j, np.int64))
        half_dp[i].append(m[:, 1])
        half_src[j].append(m[:, 1])
        half_di[j].append(np.full(m.shape[0], i, np.int64))
        half_dp[j].append(m[:, 0])

    def _pack_one(i):
        if not half_src[i]:
            return None, np.zeros(int(n_points[i]), np.int64)
        src = np.concatenate(half_src[i]).astype(np.int32)
        di = np.concatenate(half_di[i]).astype(np.int32)
        dp = np.concatenate(half_dp[i]).astype(np.int32)
        order = np.argsort(src, kind="stable")
        src, di, dp = src[order], di[order], dp[order]
        # slot within the point's row = rank among equal srcs; the
        # row-start table comes from one bincount (cheaper than a
        # 300k-element searchsorted)
        cnt = np.bincount(src, minlength=int(n_points[i]))
        starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        slot = np.arange(src.shape[0]) - starts[src]
        return (src, di, dp, slot), cnt

    # the per-image packing (sorts + bincounts over ~300k links each) is
    # independent and numpy releases the GIL: a tiny pool halves it
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        results = list(pool.map(_pack_one, range(n)))
    packed = [r[0] for r in results]
    counts = [r[1] for r in results]
    k_max = max(
        (int(e[3].max()) + 1 for e in packed if e is not None and e[0].shape[0]),
        default=1,
    )

    # Choose the row width K: a TPU gather fetches one full tile per index
    # whether or not the slot is valid, so the per-iteration link pass
    # costs P_pad * K tiles.  Surplus links of points with more than K
    # links spill into VIRTUAL ROWS duplicating the point's coordinates
    # (see module docstring) — pick the K minimizing the tile count, with
    # a cap on row growth (coordinate/basis arrays scale with P_pad).
    def layout(k1):
        rows = [
            int(n_points[i] + np.maximum(-(-counts[i] // k1) - 1, 0).sum())
            for i in range(n)
        ]
        p = _round_up(max(max(rows), 1), pad_multiple)
        return p, rows

    if links_per_row is not None:
        k_pad = max(int(links_per_row), 1)
        p_pad, _ = layout(k_pad)
    else:
        k_full = _round_up(k_max, 8)
        p_full, _ = layout(k_full)  # no surplus at k_full >= k_max

        # Per-iteration HBM model in gather-tile units: one tile per table
        # slot, plus ~2 tile-equivalents per ROW for the row-proportional
        # work (separable-basis matmul reads, coordinate/weight passes) —
        # splitting must not win the gather while losing the basis.
        def cost(p, k):
            return p * (k + 2)

        k_pad, p_pad = k_full, p_full
        best = cost(p_full, k_full)
        for cand in range(4, k_full, 4):
            p_c, _ = layout(cand)
            if p_c > 1.5 * p_full:
                continue
            if cost(p_c, cand) < best:
                best, k_pad, p_pad = cost(p_c, cand), cand, p_c
        if best > 0.9 * cost(p_full, k_full):  # not worth a layout change
            k_pad, p_pad = k_full, p_full

    xyz = np.zeros((n, p_pad, 3), np.float32)
    point_valid = np.zeros((n, p_pad), bool)
    row_src = np.tile(np.arange(p_pad, dtype=np.int32), (n, 1))
    for i, p in enumerate(pts):
        xyz[i, : p.shape[0]] = p
        point_valid[i, : p.shape[0]] = True

    link_dst = np.zeros((n, p_pad, k_pad), np.int32)
    link_valid = np.zeros((n, p_pad, k_pad), bool)

    def _fill_one(i):
        entry = packed[i]
        if entry is None:
            return
        src, di, dp, slot = entry
        dstf = di * p_pad + dp
        block = slot // k_pad
        # virtual-row start offsets: exclusive cumsum of each point's
        # surplus row count, appended after the image's true points
        extra = np.maximum(-(-counts[i] // k_pad) - 1, 0)
        starts = int(n_points[i]) + np.concatenate(
            [[0], np.cumsum(extra)[:-1]]
        ).astype(np.int64)
        row = np.where(block == 0, src, starts[src] + block - 1)
        link_dst[i, row, slot % k_pad] = dstf
        link_valid[i, row, slot % k_pad] = True
        vrows = row[block > 0]
        if vrows.size:
            vsrc = src[block > 0]
            xyz[i, vrows] = xyz[i, vsrc]
            point_valid[i, vrows] = True
            row_src[i, vrows] = vsrc.astype(np.int32)

    with ThreadPoolExecutor(max_workers=2) as pool:
        list(pool.map(_fill_one, range(n)))

    has_constraints = any(len(h) for h in hard_links)
    if has_constraints:
        hard_dst, hard_valid = _pack_table(
            [[(s, di * p_pad + dp) for (s, di, dp) in h] for h in hard_links],
            n,
            p_pad,
        )
    else:
        # zero-width: ships no bytes, and every consumer reduces over the
        # (empty) KH axis to exact zeros
        hard_dst = np.zeros((n, p_pad, 0), np.int32)
        hard_valid = np.zeros((n, p_pad, 0), bool)

    em = np.tile(np.asarray(EM_INIT, np.float32), (n, 1))
    affine = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))

    # Host->device slimming (the remote tunnel runs ~35 MB/s, and the
    # link tables are the register stage's largest upload): the validity
    # mask rides inside the destination index (valid -> dst + 1,
    # invalid -> 0) so ONE i32 array ships and a device-side decode
    # rebuilds both; xyz2 aliases the xyz buffer (immutable).
    enc = np.where(link_valid, link_dst + 1, 0).astype(np.int32)
    link_dst_d, link_valid_d = _jit_decode_links(jnp.asarray(enc))
    xyz_d = jnp.asarray(xyz)

    arrays = GroupArrays(
        xyz=xyz_d,
        xyz2=xyz_d,
        point_valid=jnp.asarray(point_valid),
        link_dst=link_dst_d,
        link_valid=link_valid_d,
        hard_dst=jnp.asarray(hard_dst),
        hard_valid=jnp.asarray(hard_valid),
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
        xyz_host=xyz,
        point_valid_host=point_valid,
        has_constraints=any(len(h) for h in hard_links),
        row_src=row_src,
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
