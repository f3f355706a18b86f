"""Core jitted kernels of the groupwise optimizer.

Everything here is a fixed-shape, fully vectorized computation over the
padded ``GroupArrays``:

* link geometry (gather destination positions, distances)
* the linear similarity update (reference updateLinearTransforms,
  imageGroup.cxx:1063-1149)
* the deformable B-spline grid update (reference
  updateDeformableTransforms, imageGroup.cxx:234-472): per-point weighted
  displacement -> 64-tap B-spline scatter -> coefficient step ->
  cross-image mean subtraction -> diffeomorphism-guard count

The per-image OpenMP loops of the reference become the leading array axis;
the cross-image reductions (energy sums, grid mean) become plain ``sum``
over that axis — or ``psum`` when the axis is sharded over a device mesh.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..transforms.bspline import bspline_displacement, bspline_weights
from .stats import inlier_probability

__all__ = [
    "transform_points_affine",
    "transform_points_bspline",
    "link_geometry",
    "linear_update",
    "deformable_update",
]


def transform_points_affine(affine, xyz):
    """xyz2[i] = A_i(xyz[i]) for (N,4,4) x (N,P,3)."""
    rot = affine[:, :3, :3]  # (N, 3, 3)
    trans = affine[:, :3, 3]  # (N, 3)
    return (xyz[:, :, None, :] * rot[:, None, :, :]).sum(-1) + trans[:, None, :]


def transform_points_bspline(coeffs, origin, spacing, xyz):
    """xyz2[i] = xyz[i] + B_i(xyz[i]); coeffs (N, Dx, Dy, Dz, 3), shared
    origin/spacing (the per-level grid geometry is common to all images,
    imageGroup.cxx:194-216)."""
    disp = jax.vmap(lambda c, p: bspline_displacement(c, origin, spacing, p))(
        coeffs, xyz
    )
    return xyz + disp


def _gather_dst(xyz2, link_dst):
    """Destination positions for flattened links (N, L) -> (N, L, 3)."""
    n, p, _ = xyz2.shape
    flat = xyz2.reshape(n * p, 3)
    return flat[link_dst]


def link_geometry(arrays):
    """Per-half-link source/destination positions, difference and distance.

    Returns (pA (N,L,3), diff (N,L,3), dist (N,L)); invalid links produce
    dist 0 against position 0 — callers must mask with ``link_valid``.
    """
    xyz2 = arrays.xyz2
    pA = jnp.take_along_axis(xyz2, arrays.link_src[..., None], axis=1)
    pB = _gather_dst(xyz2, arrays.link_dst)
    diff = pB - pA
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    return pA, diff, dist


def link_weights(arrays, dist):
    """w = min(P_inlier^A(d), P_inlier^B(d)) per half-link
    (imageGroup.cxx:1098-1100); 0 on padding."""
    n, p, _ = arrays.xyz2.shape
    prob_a = inlier_probability(dist, arrays.em[:, None, :])
    dst_img = arrays.link_dst // p
    em_b = arrays.em[dst_img]  # (N, L, 3)
    prob_b = inlier_probability(dist, em_b)
    w = jnp.minimum(prob_a, prob_b)
    return jnp.where(arrays.link_valid, w, 0.0)


def linear_update(arrays, movable, alpha: float, use_scale: bool):
    """One iteration of the groupwise linear similarity update.

    Faithful to imageGroup.cxx:1063-1149: per image, weighted first/second
    moments of source/destination positions over all half-links give a
    closed-form per-axis scale factor ``((var_B / var_A))^(alpha/2)`` and a
    translation step ``alpha * mean_disp + mean_posA * (1 - newScale)``.

    Returns (new_affine (N,4,4), E) with E = sqrt(sum w^2 d^2 / sum w^2)
    over movable images.
    """
    pA, diff, dist = link_geometry(arrays)
    w = link_weights(arrays, dist)
    pB = pA + diff

    w2 = w * w
    mov = movable.astype(jnp.float32)
    s_dist = jnp.sum(mov * jnp.sum(w2 * dist * dist, axis=1))
    s_weight_tot = jnp.sum(mov * jnp.sum(w2, axis=1))

    s_disp = jnp.sum(w[..., None] * diff, axis=1)  # (N, 3)
    s_pos_a = jnp.sum(w[..., None] * pA, axis=1)
    s_pos_b = jnp.sum(w[..., None] * pB, axis=1)
    s_pos_a2 = jnp.sum(w[..., None] * pA * pA, axis=1)
    s_pos_b2 = jnp.sum(w[..., None] * pB * pB, axis=1)
    s_w = jnp.sum(w, axis=1)[:, None]  # (N, 1)

    if use_scale:
        var_a = s_w * s_pos_a2 - s_pos_a * s_pos_a
        var_b = s_w * s_pos_b2 - s_pos_b * s_pos_b
        new_scale = jnp.power(var_b / var_a, 0.5 * alpha)
    else:
        new_scale = jnp.ones_like(s_disp)

    scale = jnp.diagonal(arrays.affine, axis1=1, axis2=2)[:, :3]
    trans = arrays.affine[:, :3, 3]
    step = alpha * s_disp / s_w + s_pos_a * (1.0 - new_scale) / s_w
    ok = jnp.isfinite(new_scale) & jnp.isfinite(step) & movable[:, None]
    scale_out = jnp.where(ok, scale * new_scale, scale)
    trans_out = jnp.where(ok, trans + step, trans)

    affine = arrays.affine
    idx = jnp.arange(3)
    affine = affine.at[:, idx, idx].set(scale_out)
    affine = affine.at[:, :3, 3].set(trans_out)
    e = jnp.sqrt(s_dist / jnp.maximum(s_weight_tot, 1e-30))
    return affine, e


def _scatter_taps(origin, spacing, dims, pos):
    """B-spline scatter support for points (P, 3): flat control indices
    (P, 64) into a grid of ``dims`` and tap weights (P, 64).  Out-of-grid
    taps get weight 0 (zero border mode)."""
    u = (pos - origin) / spacing
    iu = jnp.floor(u)
    base = iu.astype(jnp.int32) - 1  # (P, 3)
    w = bspline_weights(u - iu)  # (P, 3, 4)

    offs = jnp.arange(4, dtype=jnp.int32)
    ix = base[:, 0:1] + offs
    iy = base[:, 1:2] + offs
    iz = base[:, 2:3] + offs
    vx = (ix >= 0) & (ix < dims[0])
    vy = (iy >= 0) & (iy < dims[1])
    vz = (iz >= 0) & (iz < dims[2])
    wx = jnp.where(vx, w[:, 0, :], 0.0)
    wy = jnp.where(vy, w[:, 1, :], 0.0)
    wz = jnp.where(vz, w[:, 2, :], 0.0)
    cx = jnp.clip(ix, 0, dims[0] - 1)
    cy = jnp.clip(iy, 0, dims[1] - 1)
    cz = jnp.clip(iz, 0, dims[2] - 1)

    tap_w = (
        wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :]
    ).reshape(-1, 64)
    flat_idx = (
        (cx[:, :, None, None] * dims[1] + cy[:, None, :, None]) * dims[2]
        + cz[:, None, None, :]
    ).reshape(-1, 64)
    return flat_idx, tap_w


def deformable_update(
    arrays,
    movable,
    coeffs,  # (N, Dx, Dy, Dz, 3)
    origin,
    spacing,
    alpha: float,
    inlier_threshold: float,
    constraint_weight: float,
    max_displacement_ratio: float,
    subtract_mean: bool,
):
    """One deformable iteration: candidate coefficients + diffeo guard.

    Faithful to imageGroup.cxx:234-472.  Returns
    (candidate (N,...,3), n_big int32, E float32); the caller commits the
    candidate only when the guard passes (n_big == 0 or the guarantee is
    off) — the reference's "return -1, discard gradient buffer" control
    flow stays on the host.
    """
    n, p, _ = arrays.xyz2.shape
    dims = coeffs.shape[1:4]
    g = dims[0] * dims[1] * dims[2]

    pA, diff, dist = link_geometry(arrays)
    w = link_weights(arrays, dist)
    w2 = w * w
    w2 = jnp.where(w < inlier_threshold, 0.0, w2)  # imageGroup.cxx:271

    mov = movable.astype(jnp.float32)
    s_dist = jnp.sum(mov * jnp.sum(w2 * dist * dist, axis=1))
    s_weight_tot = jnp.sum(mov * jnp.sum(w2, axis=1))

    # links -> points (segment-sum by source point)
    def per_image_point_sums(src, vals, weights):
        disp = jax.ops.segment_sum(vals, src, num_segments=p)
        wsum = jax.ops.segment_sum(weights, src, num_segments=p)
        return disp, wsum

    s_disp, s_weight = jax.vmap(per_image_point_sums)(
        arrays.link_src, w2[..., None] * diff, w2
    )

    # hard landmark constraints (imageGroup.cxx:282-297)
    hw2 = jnp.where(arrays.hard_valid, constraint_weight * constraint_weight, 0.0)
    hA = jnp.take_along_axis(arrays.xyz2, arrays.hard_src[..., None], axis=1)
    hB = _gather_dst(arrays.xyz2, arrays.hard_dst)
    hdiff = hB - hA
    hdist2 = jnp.sum(hdiff * hdiff, axis=-1)
    s_dist = s_dist + jnp.sum(mov * jnp.sum(hw2 * hdist2, axis=1))
    s_weight_tot = s_weight_tot + jnp.sum(mov * jnp.sum(hw2, axis=1))
    hd, hw = jax.vmap(per_image_point_sums)(
        arrays.hard_src, hw2[..., None] * hdiff, hw2
    )
    s_disp = s_disp + hd
    s_weight = s_weight + hw

    # points -> grid (B-spline 64-tap scatter at the *baked* positions,
    # imageGroup.cxx:301-338)
    def per_image_scatter(pos, disp, wsum):
        flat_idx, tap_w = _scatter_taps(origin, spacing, dims, pos)
        active = (wsum > 0)[:, None]
        tap_w = jnp.where(active, tap_w, 0.0)
        vals = tap_w[..., None] * disp[:, None, :]  # (P, 64, 3)
        wvals = tap_w * wsum[:, None]  # (P, 64)
        grad = jax.ops.segment_sum(
            vals.reshape(-1, 3), flat_idx.reshape(-1), num_segments=g
        )
        gw = jax.ops.segment_sum(
            wvals.reshape(-1), flat_idx.reshape(-1), num_segments=g
        )
        return grad, gw

    grad, gw = jax.vmap(per_image_scatter)(arrays.xyz, s_disp, s_weight)

    flat_coeffs = coeffs.reshape(n, g, 3)
    stepped = jnp.where(
        (gw > 0)[..., None],
        flat_coeffs + alpha * grad / jnp.maximum(gw, 1e-30)[..., None],
        flat_coeffs,
    )
    stepped = jnp.where(movable[:, None, None], stepped, flat_coeffs)

    # cross-image mean subtraction — the hubless centering barrier
    # (imageGroup.cxx:379-432).  Applied only without fixed images; the
    # divisor is the total image count, as in the reference (:417).
    if subtract_mean:
        mean = jnp.sum(jnp.where(movable[:, None, None], stepped, 0.0), axis=0) / n
        stepped = jnp.where(movable[:, None, None], stepped - mean, stepped)

    # diffeomorphism guard: per-axis |coeff| > ratio * spacing[axis]
    limit = max_displacement_ratio * spacing  # (3,)
    big = jnp.abs(stepped) > limit
    n_big = jnp.sum(jnp.where(movable[:, None, None], big, False))

    candidate = stepped.reshape(coeffs.shape)
    e = jnp.sqrt(s_dist / jnp.maximum(s_weight_tot, 1e-30))
    return candidate, n_big, e
