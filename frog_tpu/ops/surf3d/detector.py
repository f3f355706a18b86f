"""3D-SURF blob detector: Hessian-determinant of box-filter second
derivatives over a scale stack.

TPU-native design of the detector inside the (absent) vtkOpenSURF3D
submodule (reference component C1, SURVEY.md §2.1): the classic SURF
integral-image box filters generalized to 3D.  Instead of gathering
integral-volume corners per voxel (memory-scattered), every box filter is
computed densely as three separable cumsum-shift-subtract passes — pure
streaming VPU work that XLA fuses well.

For filter size L = 3*m (m odd lobe width):

* second derivative along x:  Dxx = B(x-m) - 2 B(x) + B(x+m) where B is
  the (m, 2m-1, 2m-1) box mean; likewise Dyy, Dzz;
* cross derivative Dxy: four (m, m, 2m-1) quadrant boxes with weights
  +1/-1/-1/+1 at offsets (±(m+1)/2... implemented as shifts of a single
  box filter); likewise Dxz, Dyz;
* responses are normalized by the filter volume so scales are comparable;
* detector response = det(H); "laplacian" channel = sign(tr(H)).

Scale semantics follow SURF: sigma = 1.2 * L / 9 voxels.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["hessian_response", "scale_stack_sizes", "detect"]


def _win(c, axis, w):
    """Centered running box sum of width ``w`` from a precomputed cumsum
    ``c`` (zero-padded borders): out[i] = sum_{j in [i-w//2, i+w//2]} x[j],
    w odd."""
    h = w // 2
    n = c.shape[axis]
    idx_hi = jnp.clip(jnp.arange(n) + h, 0, n - 1)
    idx_lo = jnp.arange(n) - h - 1
    hi = jnp.take(c, idx_hi, axis=axis)
    lo_vals = jnp.take(c, jnp.clip(idx_lo, 0, n - 1), axis=axis)
    mask_shape = [1, 1, 1]
    mask_shape[axis] = n
    mask = (idx_lo >= 0).reshape(mask_shape)
    lo = jnp.where(mask, lo_vals, 0.0)
    return hi - lo


def _shift_sum(x, axis, w):
    return _win(jnp.cumsum(x, axis=axis), axis, w)


def _box(x, wx, wy, wz):
    return _shift_sum(_shift_sum(_shift_sum(x, 0, wx), 1, wy), 2, wz)


def _boxes_shared(volume, widths):
    """All box filters in ``widths`` (set of (wx, wy, wz)) with shared
    per-axis cumsums: one axis-0 cumsum serves every wx, each distinct
    partial serves every downstream width — 7 cumsums instead of 18 for
    the Hessian's six filters.  Identical pass order to _box, so results
    are bit-identical."""
    out = {}
    c0 = jnp.cumsum(volume, axis=0)
    for wx in {w[0] for w in widths}:
        a = _win(c0, 0, wx)
        c1 = jnp.cumsum(a, axis=1)
        for wy in {w[1] for w in widths if w[0] == wx}:
            b = _win(c1, 1, wy)
            c2 = jnp.cumsum(b, axis=2)
            for wz in {w[2] for w in widths if w[0] == wx and w[1] == wy}:
                out[(wx, wy, wz)] = _win(c2, 2, wz)
    return out


def _shift(x, axis, d):
    """x shifted so out[i] = x[i + d], zero-padded."""
    if d == 0:
        return x
    n = x.shape[axis]
    idx = jnp.arange(n) + d
    valid = (idx >= 0) & (idx < n)
    vals = jnp.take(x, jnp.clip(idx, 0, n - 1), axis=axis)
    shape = [1, 1, 1]
    shape[axis] = n
    return jnp.where(valid.reshape(shape), vals, 0.0)


def hessian_response(volume: jax.Array, m: int):
    """Hessian determinant + trace sign for lobe width m (filter L = 3m).

    Returns (det_response, laplacian_sign) at every voxel.
    """
    w = 2 * m - 1  # transverse box extent
    norm = 1.0 / (3 * m) ** 3  # filter-volume normalization

    # --- all six box filters with shared per-axis cumsums
    boxes = _boxes_shared(
        volume,
        {(m, w, w), (w, m, w), (w, w, m), (m, m, w), (m, w, m), (w, m, m)},
    )

    # --- second derivatives: lobe box is (m, w, w) along the probed axis
    bx = boxes[(m, w, w)]
    dxx = _shift(bx, 0, -m) - 2.0 * bx + _shift(bx, 0, m)
    by = boxes[(w, m, w)]
    dyy = _shift(by, 1, -m) - 2.0 * by + _shift(by, 1, m)
    bz = boxes[(w, w, m)]
    dzz = _shift(bz, 2, -m) - 2.0 * bz + _shift(bz, 2, m)

    # --- cross derivatives: quadrant boxes (m, m, w); the four quadrants
    # are centered at offsets +-h along the two probed axes,
    # h = (m + 1) / 2 so that the boxes touch the axis lines.
    h = (m + 1) // 2
    bxy = boxes[(m, m, w)]
    dxy = (
        _shift(_shift(bxy, 0, -h), 1, -h)
        + _shift(_shift(bxy, 0, h), 1, h)
        - _shift(_shift(bxy, 0, -h), 1, h)
        - _shift(_shift(bxy, 0, h), 1, -h)
    )
    bxz = boxes[(m, w, m)]
    dxz = (
        _shift(_shift(bxz, 0, -h), 2, -h)
        + _shift(_shift(bxz, 0, h), 2, h)
        - _shift(_shift(bxz, 0, -h), 2, h)
        - _shift(_shift(bxz, 0, h), 2, -h)
    )
    byz = boxes[(w, m, m)]
    dyz = (
        _shift(_shift(byz, 1, -h), 2, -h)
        + _shift(_shift(byz, 1, h), 2, h)
        - _shift(_shift(byz, 1, -h), 2, h)
        - _shift(_shift(byz, 1, h), 2, -h)
    )

    dxx, dyy, dzz = dxx * norm, dyy * norm, dzz * norm
    # 0.9: Bay et al.'s box-filter/Gaussian compensation on cross terms
    dxy, dxz, dyz = dxy * norm * 0.9, dxz * norm * 0.9, dyz * norm * 0.9

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


@partial(jax.jit, static_argnames=("lobes",))
def detect(volume: jax.Array, lobes: tuple):
    """Dense detector responses for every lobe width.

    Returns (responses (S, X, Y, Z), laplacian_signs (S, X, Y, Z)).
    """
    dets = []
    laps = []
    shape = volume.shape
    for m in lobes:
        d, l = hessian_response(volume, m)
        # Zero the border band where the (3m)-wide filter hangs off the
        # volume — the zero-padded box sums there produce huge spurious
        # responses on any non-zero background.
        b = (3 * m) // 2 + 1
        for ax in range(3):
            n = shape[ax]
            idx = jax.lax.broadcasted_iota(jnp.int32, d.shape, ax)
            d = jnp.where((idx >= min(b, n)) & (idx < max(n - b, 0)), d, 0.0)
        dets.append(d)
        laps.append(l)
    return jnp.stack(dets), jnp.stack(laps)


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
