"""Vmapped RANSAC similarity registration for fixed-image mode.

TPU-native re-design of the reference's RANSAC (imageGroup.cxx:629-804):
instead of one hypothesis at a time across OpenMP threads, thousands of
4-correspondence similarity hypotheses are fitted and scored in parallel on
the device, then the best is refined on its inliers.

The similarity fit is Horn's closed-form absolute orientation (the method
behind vtkLandmarkTransform's similarity mode): rotation from the largest
eigenvector of the 4x4 quaternion matrix of the cross-covariance, uniform
scale from the RMS radius ratio, translation from the centroids.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["horn_similarity", "ransac_register_images"]


def horn_similarity(src, dst, weights=None):
    """Closed-form weighted similarity fit dst ~ s R src + t.

    src, dst: (K, 3); weights (K,) optional.  Returns a (4, 4) matrix.
    """
    if weights is None:
        weights = jnp.ones(src.shape[0], src.dtype)
    wsum = jnp.maximum(weights.sum(), 1e-30)
    w = (weights / wsum)[:, None]
    ca = jnp.sum(w * src, axis=0)
    cb = jnp.sum(w * dst, axis=0)
    a = src - ca
    b = dst - cb
    # Cross-covariance (3x3), f32 VPU path.
    m = jnp.einsum(
        "ki,kj->ij", w * a, b, precision=jax.lax.Precision.HIGHEST
    )
    sxx, sxy, sxz = m[0, 0], m[0, 1], m[0, 2]
    syx, syy, syz = m[1, 0], m[1, 1], m[1, 2]
    szx, szy, szz = m[2, 0], m[2, 1], m[2, 2]
    nmat = jnp.array(
        [
            [sxx + syy + szz, syz - szy, szx - sxz, sxy - syx],
            [syz - szy, sxx - syy - szz, sxy + syx, szx + sxz],
            [szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy],
            [sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz],
        ]
    )
    evals, evecs = jnp.linalg.eigh(nmat)
    q = evecs[:, -1]  # largest eigenvalue
    w0, x, y, z = q[0], q[1], q[2], q[3]
    rot = jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w0 * z), 2 * (x * z + w0 * y)],
            [2 * (x * y + w0 * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w0 * x)],
            [2 * (x * z - w0 * y), 2 * (y * z + w0 * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    var_a = jnp.sum(w * a * a)
    var_b = jnp.sum(w * b * b)
    scale = jnp.sqrt(var_b / jnp.maximum(var_a, 1e-30))
    mat = jnp.eye(4)
    mat = mat.at[:3, :3].set(scale * rot)
    mat = mat.at[:3, 3].set(cb - scale * (rot @ ca))
    return mat


def _apply(mat, pts):
    return (pts[:, None, :] * mat[:3, :3]).sum(-1) + mat[:3, 3]


def ransac_register_image(
    xyz,  # (P, 3) source (untransformed, baked) positions of the image
    link_src,  # (L,) source point ids
    dst_xyz,  # (L, 3) destination positions (already in group space)
    link_valid,  # (L,) bool
    n_hypotheses: int,
    inlier_distance: float,
    max_scale: float,
    seed: int = 0,
):
    """Best similarity matrix + inlier count for one moving image."""
    l = link_src.shape[0]
    key = jax.random.PRNGKey(seed)
    # Sample 4 links per hypothesis; invalid draws are re-weighted to
    # valid entries by sampling from the valid index set with replacement.
    probs = link_valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    draws = jax.random.choice(
        key, l, shape=(n_hypotheses, 4), replace=True, p=probs
    )
    src_pts = xyz[link_src[draws]]  # (H, 4, 3)
    dst_pts = dst_xyz[draws]  # (H, 4, 3)

    mats = jax.vmap(horn_similarity)(src_pts, dst_pts)  # (H, 4, 4)

    # Score: inliers over all links.
    link_pts = xyz[link_src]  # (L, 3)
    d2max = inlier_distance * inlier_distance

    def count_inliers(mat):
        t = _apply(mat, link_pts)
        d2 = jnp.sum((t - dst_xyz) ** 2, axis=-1)
        return jnp.sum((d2 < d2max) & link_valid)

    counts = jax.lax.map(count_inliers, mats, batch_size=256)
    dets = jnp.abs(jnp.linalg.det(mats[:, :3, :3]))
    valid_scale = (dets <= max_scale) & (dets >= 1.0 / max_scale)
    counts = jnp.where(valid_scale, counts, -1)
    best = jnp.argmax(counts)
    best_mat = mats[best]

    # Refit on the inliers of the best hypothesis (imageGroup.cxx:667-700).
    t = _apply(best_mat, link_pts)
    d2 = jnp.sum((t - dst_xyz) ** 2, axis=-1)
    inlier = ((d2 < d2max) & link_valid).astype(jnp.float32)
    refined = horn_similarity(link_pts, dst_xyz, weights=inlier)
    return refined, counts[best]


def ransac_register_images(arrays, meta, cfg):
    """Register every movable image against the fixed group
    (imageGroup.cxx:40-49)."""
    n, p = arrays.xyz2.shape[:2]
    k = arrays.link_dst.shape[2]
    flat_dst = arrays.xyz2.reshape(n * p, 3)
    new_affine = np.asarray(arrays.affine).copy()
    # flatten the per-point K-table into per-image (L,) link lists; the
    # source point of table row (p, k) is p
    link_src_flat = jnp.repeat(jnp.arange(p, dtype=jnp.int32), k)
    results = []
    for i in range(cfg.n_fixed, n):
        dst = flat_dst[arrays.link_dst[i].reshape(-1)]
        mat, count = ransac_register_image(
            arrays.xyz[i],
            link_src_flat,
            dst,
            arrays.link_valid[i].reshape(-1),
            n_hypotheses=cfg.ransac_iterations,
            inlier_distance=cfg.ransac_inlier_distance,
            max_scale=cfg.ransac_max_scale,
            seed=i,
        )
        new_affine[i] = np.asarray(mat)
        results.append(
            {
                "image": i,
                "threshold": cfg.ransac_inlier_distance,
                "inliers": int(count),
            }
        )
        if cfg.verbose:
            print(f"RANSAC image {i}: {int(count)} inliers")
    import dataclasses as dc

    return dc.replace(arrays, affine=jnp.asarray(new_affine)), results
