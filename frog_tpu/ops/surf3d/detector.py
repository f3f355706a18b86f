"""3D-SURF blob detector: Hessian-determinant of box-filter second
derivatives over a scale stack.

TPU-native design of the detector inside the (absent) vtkOpenSURF3D
submodule (reference component C1, SURVEY.md §2.1): the classic SURF
integral-image box filters generalized to 3D.  Instead of gathering
integral-volume corners per voxel (memory-scattered) or chaining
cumsum/shift passes (VPU-bound, one materialized volume per pass), every
separable box/stencil filter runs as ONE banded-matrix contraction per
axis on the MXU: the (n, n) band matrix encodes box sum, second
derivative, or quadrant difference including border truncation, and the
contraction streams the whole volume through the systolic array.
Measured ~2x faster than the cumsum formulation at 192^3 x 8 lobes.

For filter size L = 3*m (m odd lobe width):

* second derivative along x:  Dxx = B(x-m) - 2 B(x) + B(x+m) where B is
  the (m, 2m-1, 2m-1) box mean; likewise Dyy, Dzz — i.e. a 3-segment
  band (+1, -2, +1) composed with the m-wide box along x, and plain
  (2m-1)-wide boxes along y and z;
* cross derivative Dxy: four (m, m, 2m-1) quadrant boxes with weights
  +1/-1/-1/+1 at offsets ±(m+1)/2 — separable: (shift(-h) - shift(+h))
  composed with the m-box along BOTH probed axes, a (2m-1)-box along the
  third;
* responses are normalized by the filter volume so scales are comparable;
* detector response = det(H); "laplacian" channel = sign(tr(H)).

Border semantics: band matrices truncate at the volume edge (out-of-range
taps contribute zero), which differs from shifted-truncated-box exactly
and only within the (3m)//2+1 border band that ``detect`` zeroes anyway.

Scale semantics follow SURF: sigma = 1.2 * L / 9 voxels.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hessian_response", "scale_stack_sizes", "detect",
    "band_matrix", "apply_band",
]


def band_matrix(n: int, segments) -> jax.Array:
    """(n, n) banded filter matrix: out[i] = sum_j M[i, j] v[j] with
    M[i, j] = sum over (a, b, w) segments of w * [a <= j - i <= b].
    Out-of-range taps are simply absent (zero border contribution).

    Built from iotas ON DEVICE (traceable, negligible FLOPs) rather than
    as a host constant: dozens of these appear per detect executable, and
    embedding them as literals bloats the HLO this backend ships to its
    REMOTE compile service by ~10 MB."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    r = j - i
    m = jnp.zeros((n, n), jnp.float32)
    for (a, b, w) in segments:
        m = m + jnp.float32(w) * ((r >= a) & (r <= b)).astype(jnp.float32)
    return m


def apply_band(arr: jax.Array, axis: int, mat: jax.Array) -> jax.Array:
    """Contract a banded filter matrix along one axis of a 3-D volume on
    the MXU (f32 accuracy via HIGHEST precision)."""
    hi = jax.lax.Precision.HIGHEST
    if axis == 0:
        return jnp.einsum("ij,jyz->iyz", mat, arr, precision=hi)
    if axis == 1:
        return jnp.einsum("ij,xjz->xiz", mat, arr, precision=hi)
    return jnp.einsum("ij,xyj->xyi", mat, arr, precision=hi)


def hessian_response(volume: jax.Array, m: int):
    """Hessian determinant + trace sign for lobe width m (filter L = 3m).

    Returns (det_response, laplacian_sign) at every voxel (valid outside
    the (3m)//2+1 border band; ``detect`` zeroes that band).
    """
    hm = m // 2  # half-extent of the m-wide lobe box
    hw = m - 1  # half-extent of the (2m-1)-wide transverse box
    h = (m + 1) // 2  # quadrant offset
    norm = 1.0 / (3 * m) ** 3  # filter-volume normalization
    n0, n1, n2 = volume.shape

    # Per-axis band operators (box/stencil composed with the lobe box):
    def BOXw(n):  # transverse (2m-1)-wide box
        return band_matrix(n, [(-hw, hw, 1)])

    def S2(n):  # second derivative: box(m) at offsets -m, 0, +m
        return band_matrix(
            n, [(-m - hm, -m + hm, 1), (-hm, hm, -2), (m - hm, m + hm, 1)]
        )

    def QD(n):  # quadrant difference: box(m) at -h minus box(m) at +h
        return band_matrix(n, [(-h - hm, -h + hm, 1), (h - hm, h + hm, -1)])

    # Shared contraction tree (15 matmuls for all six channels):
    #   dxx = S2_x   BOXw_y BOXw_z      dxy = QD_x QD_y   BOXw_z
    #   dyy = BOXw_x S2_y   BOXw_z      dxz = QD_x BOXw_y QD_z
    #   dzz = BOXw_x BOXw_y S2_z        dyz = BOXw_x QD_y QD_z
    zb = apply_band(volume, 2, BOXw(n2))
    zs = apply_band(volume, 2, S2(n2))
    zq = apply_band(volume, 2, QD(n2))
    yb_zb = apply_band(zb, 1, BOXw(n1))
    ys_zb = apply_band(zb, 1, S2(n1))
    yq_zb = apply_band(zb, 1, QD(n1))
    yb_zs = apply_band(zs, 1, BOXw(n1))
    yb_zq = apply_band(zq, 1, BOXw(n1))
    yq_zq = apply_band(zq, 1, QD(n1))
    dxx = apply_band(yb_zb, 0, S2(n0)) * norm
    dyy = apply_band(ys_zb, 0, BOXw(n0)) * norm
    dzz = apply_band(yb_zs, 0, BOXw(n0)) * norm
    # 0.9: Bay et al.'s box-filter/Gaussian compensation on cross terms
    dxy = apply_band(yq_zb, 0, QD(n0)) * (norm * 0.9)
    dxz = apply_band(yb_zq, 0, QD(n0)) * (norm * 0.9)
    dyz = apply_band(yq_zq, 0, BOXw(n0)) * (norm * 0.9)

    det = (
        dxx * dyy * dzz
        + 2.0 * dxy * dxz * dyz
        - dxx * dyz * dyz
        - dyy * dxz * dxz
        - dzz * dxy * dxy
    )
    # 3D blobness: unlike 2D SURF, det(H) at a bright blob is NEGATIVE
    # (three negative eigenvalues), so raw det can't be thresholded
    # directly.  Gate on definiteness via Sylvester minors — both
    # positive- and negative-definite H satisfy
    # (dxx*dyy - dxy^2 > 0) and (det * dxx > 0) — and use |det| as the
    # response, with the trace sign as the bright/dark channel.
    minor2 = dxx * dyy - dxy * dxy
    blob = (minor2 > 0) & (det * dxx > 0)
    response = jnp.where(blob, jnp.abs(det), 0.0)
    lap = jnp.sign(dxx + dyy + dzz)
    return response, lap


def scale_stack_sizes(n_octaves: int = 3):
    """Lobe widths per octave, SURF-style: filter sizes L = 3m with
    m = 3,5,7,9 then stride-doubled successors."""
    sizes = []
    step = 2
    base = [3, 5, 7, 9]
    prev = set()
    for o in range(n_octaves):
        for m in base:
            if m not in prev:
                sizes.append(m)
                prev.add(m)
        base = [base[1] + (base[1] - base[0]) * 2 * k for k in range(4)]
    return sizes


def _lobe_segments(m: int):
    """Per-axis band segments for lobe width m: transverse box, second
    derivative, quadrant difference (see hessian_response)."""
    hm, hw, h = m // 2, m - 1, (m + 1) // 2
    return {
        "BOX": [(-hw, hw, 1)],
        "S2": [(-m - hm, -m + hm, 1), (-hm, hm, -2), (m - hm, m + hm, 1)],
        "QD": [(-h - hm, -h + hm, 1), (h - hm, h + hm, -1)],
    }


@partial(jax.jit, static_argnames=("lobes",))
def detect(volume: jax.Array, lobes: tuple):
    """Dense detector responses for every lobe width.

    Returns (responses (S, X, Y, Z), laplacian_signs (S, X, Y, Z)).

    The whole scale stack runs as FIVE batched MXU contractions (one
    z-level with all lobes' band matrices concatenated, three y-level
    groups batched over lobes, one x-level batched over all 6L channel
    branches) — per-lobe matmul chains compile into huge HLO through
    this backend's remote compile service and leave MXU idle gaps
    between small ops.  Numerics identical to hessian_response per lobe
    (same matrices, same contraction order)."""
    hi = jax.lax.Precision.HIGHEST
    n0, n1, n2 = volume.shape
    nl = len(lobes)

    # ---- z level: one (3L*n2, n2) concatenated band matrix
    zmat = jnp.concatenate(
        [band_matrix(n2, _lobe_segments(m)[t])
         for m in lobes for t in ("BOX", "S2", "QD")], axis=0)
    z = jnp.einsum("ij,xyj->xyi", zmat, volume, precision=hi)
    z = z.reshape(n0, n1, nl, 3, n2)
    zb = jnp.moveaxis(z[:, :, :, 0], 2, 0)  # (L, X, Y, Z) transverse box
    zs = jnp.moveaxis(z[:, :, :, 1], 2, 0)  # second derivative along z
    zq = jnp.moveaxis(z[:, :, :, 2], 2, 0)  # quadrant diff along z

    # ---- y level: batched over lobes, grouped by needed op count
    def ymats(types):
        return jnp.stack([
            jnp.concatenate(
                [band_matrix(n1, _lobe_segments(m)[t]) for t in types], axis=0)
            for m in lobes
        ])

    y3 = jnp.einsum("bij,bxjz->bxiz", ymats(("BOX", "S2", "QD")), zb,
                    precision=hi).reshape(nl, n0, 3, n1, n2)
    yb_zb, ys_zb, yq_zb = y3[:, :, 0], y3[:, :, 1], y3[:, :, 2]
    y2 = jnp.einsum("bij,bxjz->bxiz", ymats(("BOX", "QD")), zq,
                    precision=hi).reshape(nl, n0, 2, n1, n2)
    yb_zq, yq_zq = y2[:, :, 0], y2[:, :, 1]
    yb_zs = jnp.einsum("bij,bxjz->bxiz", ymats(("BOX",)), zs, precision=hi)

    # ---- x level: one batched contraction over all 6L channel branches
    #   dxx = S2_x(yb_zb)   dyy = BOX_x(ys_zb)  dzz = BOX_x(yb_zs)
    #   dxy = QD_x(yq_zb)   dxz = QD_x(yb_zq)   dyz = BOX_x(yq_zq)
    branches = [
        ("S2", yb_zb), ("BOX", ys_zb), ("BOX", yb_zs),
        ("QD", yq_zb), ("QD", yb_zq), ("BOX", yq_zq),
    ]
    xin = jnp.concatenate([v for _, v in branches], axis=0)  # (6L, X, Y, Z)
    xmat = jnp.stack([
        band_matrix(n0, _lobe_segments(m)[t])
        for t, _ in branches for m in lobes
    ])
    out = jnp.einsum("bij,bjyz->biyz", xmat, xin, precision=hi)
    out = out.reshape(6, nl, n0, n1, n2)

    norm = jnp.asarray(
        [1.0 / (3 * m) ** 3 for m in lobes], jnp.float32
    )[:, None, None, None]
    dxx = out[0] * norm
    dyy = out[1] * norm
    dzz = out[2] * norm
    # 0.9: Bay et al.'s box-filter/Gaussian compensation on cross terms
    dxy = out[3] * (norm * 0.9)
    dxz = out[4] * (norm * 0.9)
    dyz = out[5] * (norm * 0.9)

    det = (
        dxx * dyy * dzz
        + 2.0 * dxy * dxz * dyz
        - dxx * dyz * dyz
        - dyy * dxz * dxz
        - dzz * dxy * dxy
    )
    minor2 = dxx * dyy - dxy * dxy
    blob = (minor2 > 0) & (det * dxx > 0)
    resp = jnp.where(blob, jnp.abs(det), 0.0)
    laps = jnp.sign(dxx + dyy + dzz)

    # Zero the border band where the (3m)-wide filter hangs off the
    # volume — the zero-padded box sums there produce huge spurious
    # responses on any non-zero background (and the band-matrix border
    # semantics differ from shifted-truncated boxes only inside it).
    bvec = jnp.asarray([(3 * m) // 2 + 1 for m in lobes], jnp.int32)
    bvec = bvec[:, None, None, None]
    inside = jnp.ones((1, 1, 1, 1), bool)
    for ax, n in ((1, n0), (2, n1), (3, n2)):
        idx = jax.lax.broadcasted_iota(jnp.int32, resp.shape, ax)
        inside = inside & (idx >= jnp.minimum(bvec, n)) & (
            idx < jnp.maximum(n - bvec, 0))
    resp = jnp.where(inside, resp, 0.0)
    return resp, laps


def non_max_mask(responses: jax.Array, threshold: float):
    """26-neighborhood spatial + scale-neighbor non-maximum suppression.

    responses: (S, X, Y, Z).  A voxel survives if its response exceeds the
    threshold and is the strict max of its 3x3x3 spatial neighborhood at
    its own scale and the max of the same neighborhoods one scale up/down.
    """
    s = responses.shape[0]
    neigh = jax.lax.reduce_window(
        responses,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 3),
        window_strides=(1, 1, 1, 1),
        padding="SAME",
    )
    # max over scale neighbors' spatial neighborhoods
    up = jnp.concatenate([neigh[1:], jnp.full_like(neigh[:1], -jnp.inf)], axis=0)
    down = jnp.concatenate([jnp.full_like(neigh[:1], -jnp.inf), neigh[:-1]], axis=0)
    others = jnp.maximum(up, down)
    is_peak = (responses >= neigh) & (responses > others) & (
        responses > threshold
    )
    return is_peak
