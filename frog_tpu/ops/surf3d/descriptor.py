"""Upright 3D-SURF descriptor: 48 floats per keypoint.

The reference's descriptor lives in the absent vtkOpenSURF3D submodule;
its contract, proven by the matcher (match/match.cpp:39-47, 201), is a
48-float vector compared by L2 distance plus (scale, laplacianSign,
response) side channels.  This implementation is the natural 3D
generalization of Bay et al.'s M-SURF: a 2x2x2 grid of subregions around
the keypoint, each summarizing Haar wavelet responses as
(sum dx, sum |dx|, sum dy, sum |dy|, sum dz, sum |dz|) — 8 x 6 = 48
floats — Gaussian-weighted and L2-normalized.  Upright (no rotation
frame): consistent with groupwise medical registration where scans share
patient orientation.

Haar responses are point samples of the integral volume: dx at sample p
with wavelet size 2s is box(right half) - box(left half), each box an
8-corner integral-volume read — sparse gathers, only at
keypoints x samples.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "integral_volume", "descriptors", "descriptors_dense", "dense_haar",
    "dense_haar_multi", "dense_haar_table", "descriptors_from_table",
    "haar_table_sizes",
]

# Subregion sample grid: SAMPLES^3 Haar samples per subregion.
SAMPLES = 5
# Subregion half-extent in units of sigma; total window is
# (2 * 2 * SUBREGION_SIGMA) sigma wide per axis.
SUBREGION_SIGMA = 2.5
# Gaussian weighting sigma (in units of keypoint sigma) over the window.
WEIGHT_SIGMA = 3.3


def integral_volume(volume: jax.Array) -> jax.Array:
    """Zero-padded integral volume: I[i, j, k] = sum volume[:i, :j, :k]."""
    c = jnp.cumsum(jnp.cumsum(jnp.cumsum(volume, 0), 1), 2)
    return jnp.pad(c, ((1, 0), (1, 0), (1, 0)))


def _box_sum(integral, lo, hi):
    """Box sum over voxel index range [lo, hi) per axis; lo/hi (..., 3)
    int32, clamped to the volume."""
    shape = jnp.asarray(
        [integral.shape[0] - 1, integral.shape[1] - 1, integral.shape[2] - 1],
        jnp.int32,
    )
    lo = jnp.clip(lo, 0, shape)
    hi = jnp.clip(hi, 0, shape)

    def corner(ax, ay, az):
        x = jnp.where(ax == 1, hi[..., 0], lo[..., 0])
        y = jnp.where(ay == 1, hi[..., 1], lo[..., 1])
        z = jnp.where(az == 1, hi[..., 2], lo[..., 2])
        return integral[x, y, z]

    return (
        corner(1, 1, 1)
        - corner(0, 1, 1)
        - corner(1, 0, 1)
        - corner(1, 1, 0)
        + corner(0, 0, 1)
        + corner(0, 1, 0)
        + corner(1, 0, 0)
        - corner(0, 0, 0)
    )


def _haar(integral, center, size):
    """Haar wavelet responses (dx, dy, dz) at voxel ``center`` (..., 3)
    with half-width ``size`` (...,): each response is the difference of two
    half-boxes of extent size x 2size x 2size.

    TPU formulation: the six half-boxes share corners — the 8 outer
    corners of the full box appear in every axis's halfboxes and each axis
    adds only its 4 mid-plane corners, so the whole (dx, dy, dz) triple
    needs 20 integral reads per sample instead of 48.  All reads go
    through ONE flat 1-D gather (3-index advanced indexing lowers to a
    ~2x slower gather on TPU):

        dx = sum_{b,c in {-,+}} tau(b,c) [I(x+,Yb,Zc) - 2 I(x0,Yb,Zc)
                                          + I(x-,Yb,Zc)],  tau = sign(b*c)
    """
    dims = integral.shape
    shape = jnp.asarray([dims[0] - 1, dims[1] - 1, dims[2] - 1], jnp.int32)
    s = size

    def cl(v, ax):
        return jnp.clip(v, 0, shape[ax])

    xm, x0, xp = (
        cl(center[..., 0] - s, 0),
        cl(center[..., 0], 0),
        cl(center[..., 0] + s, 0),
    )
    ym, y0, yp = (
        cl(center[..., 1] - s, 1),
        cl(center[..., 1], 1),
        cl(center[..., 1] + s, 1),
    )
    zm, z0, zp = (
        cl(center[..., 2] - s, 2),
        cl(center[..., 2], 2),
        cl(center[..., 2] + s, 2),
    )

    flat = integral.reshape(-1)
    sy, sz = dims[1] * dims[2], dims[2]

    def fidx(x, y, z):
        return x * sy + y * sz + z

    # 20 distinct corners per sample, each a separate (..., ) flat gather
    # (one big (..., 20) gather would pad 128x on the lane axis when its
    # minor dim is sliced — HBM blowup on TPU)
    def g(x, y, z):
        return flat[fidx(x, y, z)]

    a_mmm = g(xm, ym, zm)
    a_mmp = g(xm, ym, zp)
    a_mpm = g(xm, yp, zm)
    a_mpp = g(xm, yp, zp)
    a_pmm = g(xp, ym, zm)
    a_pmp = g(xp, ym, zp)
    a_ppm = g(xp, yp, zm)
    a_ppp = g(xp, yp, zp)

    # tau over the two free axes: (+ - - +) for (mm, mp, pm, pp)
    def tau4(mm, mp, pm, pp):
        return mm - mp - pm + pp

    # dx: free axes (y, z); x-mid plane corners
    mx = tau4(g(x0, ym, zm), g(x0, ym, zp), g(x0, yp, zm), g(x0, yp, zp))
    dx = (
        tau4(a_pmm, a_pmp, a_ppm, a_ppp)
        - 2.0 * mx
        + tau4(a_mmm, a_mmp, a_mpm, a_mpp)
    )
    # dy: free axes (x, z)
    my = tau4(g(xm, y0, zm), g(xm, y0, zp), g(xp, y0, zm), g(xp, y0, zp))
    dy = (
        tau4(a_mpm, a_mpp, a_ppm, a_ppp)
        - 2.0 * my
        + tau4(a_mmm, a_mmp, a_pmm, a_pmp)
    )
    # dz: free axes (x, y)
    mz = tau4(g(xm, ym, z0), g(xm, yp, z0), g(xp, ym, z0), g(xp, yp, z0))
    dz = (
        tau4(a_mmp, a_mpp, a_pmp, a_ppp)
        - 2.0 * mz
        + tau4(a_mmm, a_mpm, a_pmm, a_ppm)
    )
    return dx, dy, dz


def dense_haar(volume: jax.Array, s: int):
    """Dense Haar response volumes (dx, dy, dz) at half-width ``s``:
    dx[v] = sum(box x in [v, v+s-1]) - sum(box x in [v-s, v-1]) with the
    free axes summed over [v-s, v+s-1] — exactly the per-sample
    integral-volume Haar (see _haar), evaluated at EVERY voxel as one
    banded-matrix MXU contraction per axis (see detector.band_matrix);
    borders truncate (out-of-range taps contribute zero).  The 8-matmul
    shared tree replaces 9 cumsum+gather window-sum chains."""
    from .detector import apply_band, band_matrix

    n0, n1, n2 = volume.shape

    def WF(n):  # free axis: window [-s, s-1]
        return band_matrix(n, [(-s, s - 1, 1)])

    def WP(n):  # probe axis: window [0, s-1] minus window [-s, -1]
        return band_matrix(n, [(0, s - 1, 1), (-s, -1, -1)])

    zf = apply_band(volume, 2, WF(n2))
    zp = apply_band(volume, 2, WP(n2))
    yf_zf = apply_band(zf, 1, WF(n1))
    yp_zf = apply_band(zf, 1, WP(n1))
    yf_zp = apply_band(zp, 1, WF(n1))
    dx = apply_band(yf_zf, 0, WP(n0))
    dy = apply_band(yp_zf, 0, WF(n0))
    dz = apply_band(yf_zp, 0, WF(n0))
    return dx, dy, dz


def dense_haar_multi(volume: jax.Array, sizes: tuple):
    """dense_haar for MANY half-widths in four batched MXU contractions
    (band matrices concatenated/batched over sizes — one compact HLO
    instead of 8 matmuls per size; numerics identical).  Returns
    (dx, dy, dz) each (S, X, Y, Z) ordered like ``sizes``."""
    from .detector import band_matrix

    hi = jax.lax.Precision.HIGHEST
    n0, n1, n2 = volume.shape
    ns = len(sizes)

    def WF(n, s):
        return band_matrix(n, [(-s, s - 1, 1)])

    def WP(n, s):
        return band_matrix(n, [(0, s - 1, 1), (-s, -1, -1)])

    # z level: [WF, WP] per size, one concatenated matrix
    zmat = jnp.concatenate(
        [m for s in sizes for m in (WF(n2, s), WP(n2, s))], axis=0)
    z = jnp.einsum("ij,xyj->xyi", zmat, volume, precision=hi)
    z = z.reshape(n0, n1, ns, 2, n2)
    zf = jnp.moveaxis(z[:, :, :, 0], 2, 0)  # (S, X, Y, Z)
    zp = jnp.moveaxis(z[:, :, :, 1], 2, 0)

    # y level: zf -> [WF (dx), WP (dy)]; zp -> [WF (dz)]
    y2m = jnp.stack([
        jnp.concatenate([WF(n1, s), WP(n1, s)], axis=0) for s in sizes])
    y2 = jnp.einsum("bij,bxjz->bxiz", y2m, zf, precision=hi)
    y2 = y2.reshape(ns, n0, 2, n1, n2)
    yf_zf, yp_zf = y2[:, :, 0], y2[:, :, 1]
    y1m = jnp.stack([WF(n1, s) for s in sizes])
    yf_zp = jnp.einsum("bij,bxjz->bxiz", y1m, zp, precision=hi)

    # x level: one batched contraction over all 3S branches
    xin = jnp.concatenate([yf_zf, yp_zf, yf_zp], axis=0)  # (3S, X, Y, Z)
    xmat = jnp.stack(
        [WP(n0, s) for s in sizes]
        + [WF(n0, s) for s in sizes] * 2)
    out = jnp.einsum("bij,bjyz->biyz", xmat, xin, precision=hi)
    out = out.reshape(3, ns, n0, n1, n2)
    return out[0], out[1], out[2]


def _sample_offsets():
    """Sample-lattice offsets (M, 3) in sigma units, their Gaussian
    weights (M,), and subregion ids (M,)."""
    sub_centers = jnp.asarray([-SUBREGION_SIGMA, SUBREGION_SIGMA], jnp.float32)
    within = (
        (jnp.arange(SAMPLES, dtype=jnp.float32) - (SAMPLES - 1) / 2)
        * (2 * SUBREGION_SIGMA / SAMPLES)
    )
    offs = sub_centers[:, None] + within[None, :]
    ox = offs.reshape(-1)
    grid = jnp.stack(jnp.meshgrid(ox, ox, ox, indexing="ij"), axis=-1)
    flat_offs = grid.reshape(-1, 3)
    r2 = jnp.sum(flat_offs * flat_offs, axis=-1)
    gw = jnp.exp(-r2 / (2.0 * WEIGHT_SIGMA**2))
    sub = (
        (flat_offs[:, 0] > 0).astype(jnp.int32) * 4
        + (flat_offs[:, 1] > 0).astype(jnp.int32) * 2
        + (flat_offs[:, 2] > 0).astype(jnp.int32)
    )
    return flat_offs, gw, sub


def _pool_descriptor(dx, dy, dz, gw, sub):
    """(K, M) Haar samples -> Gaussian-weighted per-subregion sums ->
    normalized 48-float descriptors."""
    k = dx.shape[0]
    dx = dx * gw
    dy = dy * gw
    dz = dz * gw
    one_hot = jax.nn.one_hot(sub, 8, dtype=jnp.float32)

    def pool(v):
        return jnp.einsum(
            "km,mr->kr", v, one_hot, precision=jax.lax.Precision.HIGHEST
        )

    feats = jnp.stack(
        [
            pool(dx), pool(jnp.abs(dx)),
            pool(dy), pool(jnp.abs(dy)),
            pool(dz), pool(jnp.abs(dz)),
        ],
        axis=-1,
    )
    desc = feats.reshape(k, 48)
    norm = jnp.sqrt(jnp.sum(desc * desc, axis=1, keepdims=True))
    return desc / jnp.maximum(norm, 1e-12)


def haar_table_sizes(lobes: tuple):
    """Unique dense-Haar half-widths for a lobe stack, and the per-lobe
    slot mapping (shared by the table builder and the gather half)."""
    sizes = [max(int(round(1.2 * 3 * m / 9.0)), 1) for m in lobes]
    uniq = sorted(set(sizes))
    slot = {s: i for i, s in enumerate(uniq)}
    return tuple(uniq), tuple(slot[s] for s in sizes)


def dense_haar_table(volume: jax.Array, lobes: tuple, dtype=jnp.bfloat16):
    """Volume-only half of :func:`descriptors_dense`: the packed per-voxel
    [dx, dy, dz] Haar table for every unique scale, (u * X*Y*Z, 3).

    Depends ONLY on the volume — split out so its executable compiles (and
    can dispatch) concurrently with the detector on a cold start.  One
    packed table row per voxel: the whole Haar triple rides a SINGLE
    gather — TPU gather cost is per index (one tile regardless of row
    width, see kernels._dst_table), 3x fewer tile fetches than separate
    dx/dy/dz gathers."""
    uniq, _ = haar_table_sizes(lobes)
    dxs, dys, dzs = dense_haar_multi(volume, uniq)  # each (u, X, Y, Z)
    return jnp.stack([dxs, dys, dzs], axis=-1).astype(dtype).reshape(-1, 3)


def descriptors_from_table(
    table: jax.Array,  # (u * X*Y*Z, 3) packed Haar triples
    shape: tuple,  # static volume dims (X, Y, Z)
    positions: jax.Array,  # (K, 3) f32 voxel coords
    sigmas: jax.Array,  # (K,) voxels
    scale_idx: jax.Array,  # (K,) i32 index into lobes
    lobes: tuple,
):
    """Gather half of :func:`descriptors_dense`: 3 table reads per sample
    + Gaussian-weighted subregion pooling."""
    _, lobe_slots = haar_table_sizes(lobes)
    scale_to_slot = jnp.asarray(lobe_slots, jnp.int32)

    flat_offs, gw, sub = _sample_offsets()
    pos = positions[:, None, :] + sigmas[:, None, None] * flat_offs[None]
    dims = jnp.asarray(shape, jnp.int32)
    centers = jnp.clip(jnp.round(pos).astype(jnp.int32), 0, dims - 1)
    vox = (
        centers[..., 0] * (shape[1] * shape[2])
        + centers[..., 1] * shape[2]
        + centers[..., 2]
    )  # (K, M)
    nvox = shape[0] * shape[1] * shape[2]
    idx = scale_to_slot[scale_idx][:, None] * nvox + vox

    g = table[idx].astype(jnp.float32)  # (K, M, 3)
    return _pool_descriptor(g[..., 0], g[..., 1], g[..., 2], gw, sub)


def descriptors_dense(
    volume: jax.Array,
    positions: jax.Array,  # (K, 3) f32 voxel coords
    sigmas: jax.Array,  # (K,) voxels
    scale_idx: jax.Array,  # (K,) i32 index into lobes
    lobes: tuple,
    dtype=jnp.bfloat16,
):
    """48-float descriptors via per-scale DENSE Haar volumes + 3 gathers
    per sample (the 20-corner integral-volume path gathers 20): the Haar
    half-width is a per-scale constant, so dx/dy/dz are precomputed for
    every voxel by separable window sums and each sample just reads its 3
    values.  |d.| channels are elementwise on the gathered samples.
    ``dtype``=bf16 halves the gather bandwidth; descriptors are
    normalized sums of hundreds of samples, so the 0.4% relative error is
    noise (validated by the matching-power metrics).

    Composition of :func:`dense_haar_table` + :func:`descriptors_from_table`
    (kept split so the extract pipeline compiles the halves concurrently).
    """
    table = dense_haar_table(volume, lobes, dtype)
    return descriptors_from_table(
        table, tuple(volume.shape), positions, sigmas, scale_idx, lobes
    )


@partial(jax.jit, static_argnames=())
def descriptors(integral: jax.Array, positions: jax.Array, sigmas: jax.Array):
    """48-float descriptors for keypoints at voxel ``positions`` (K, 3)
    float32 with scales ``sigmas`` (K,) in voxels."""
    k = positions.shape[0]

    # Sample offsets: 2 subregions per axis, SAMPLES samples per subregion,
    # in units of sigma.
    sub_centers = jnp.asarray([-SUBREGION_SIGMA, SUBREGION_SIGMA], jnp.float32)
    within = (
        (jnp.arange(SAMPLES, dtype=jnp.float32) - (SAMPLES - 1) / 2)
        * (2 * SUBREGION_SIGMA / SAMPLES)
    )
    # offsets[s, j] = center of sample j of subregion s along one axis
    offs = sub_centers[:, None] + within[None, :]  # (2, SAMPLES)
    ox = offs.reshape(-1)  # (2*SAMPLES,)
    grid = jnp.stack(
        jnp.meshgrid(ox, ox, ox, indexing="ij"), axis=-1
    )  # (2S, 2S, 2S, 3)
    flat_offs = grid.reshape(-1, 3)  # (M, 3) in sigma units
    m = flat_offs.shape[0]

    # Gaussian weight per sample (in sigma units, centered on keypoint).
    r2 = jnp.sum(flat_offs * flat_offs, axis=-1)
    gw = jnp.exp(-r2 / (2.0 * WEIGHT_SIGMA**2))  # (M,)

    # Absolute voxel positions of all samples for all keypoints.
    pos = positions[:, None, :] + sigmas[:, None, None] * flat_offs[None]  # (K, M, 3)
    centers = jnp.round(pos).astype(jnp.int32)
    size = jnp.maximum(jnp.round(sigmas).astype(jnp.int32), 1)  # Haar half-width
    sizes = jnp.broadcast_to(size[:, None], (k, m))

    dx, dy, dz = _haar(integral, centers, sizes)  # each (K, M)
    dx = dx * gw
    dy = dy * gw
    dz = dz * gw

    # Subregion of each sample: 8 regions from the sign pattern of offsets.
    sub = (
        (flat_offs[:, 0] > 0).astype(jnp.int32) * 4
        + (flat_offs[:, 1] > 0).astype(jnp.int32) * 2
        + (flat_offs[:, 2] > 0).astype(jnp.int32)
    )  # (M,)
    one_hot = jax.nn.one_hot(sub, 8, dtype=jnp.float32)  # (M, 8)

    def pool(v):  # (K, M) -> (K, 8)
        return jnp.einsum(
            "km,mr->kr", v, one_hot, precision=jax.lax.Precision.HIGHEST
        )

    feats = jnp.stack(
        [
            pool(dx),
            pool(jnp.abs(dx)),
            pool(dy),
            pool(jnp.abs(dy)),
            pool(dz),
            pool(jnp.abs(dz)),
        ],
        axis=-1,
    )  # (K, 8, 6)
    desc = feats.reshape(k, 48)
    norm = jnp.sqrt(jnp.sum(desc * desc, axis=1, keepdims=True))
    return desc / jnp.maximum(norm, 1e-12)
