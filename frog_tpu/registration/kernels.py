"""Core jitted kernels of the groupwise optimizer.

Everything here is a fixed-shape, fully vectorized computation over the
padded ``GroupArrays``:

* link geometry (gather destination positions, distances)
* the linear similarity update (reference updateLinearTransforms,
  imageGroup.cxx:1063-1149)
* the deformable B-spline grid update (reference
  updateDeformableTransforms, imageGroup.cxx:234-472)

TPU-first design notes (profiled on a v5e chip):

* XLA scatter/gather is the enemy.  The B-spline 64-tap evaluate and
  scatter are reformulated as **separable basis matmuls**: per level we
  build per-axis banded basis matrices E_ax (N, P, D_ax) (four non-zeros
  per row — the cubic B-spline weights, zero outside the grid which
  reproduces the zero-border mode), then
      displacement = G1 @ coeffs-contraction,   G1 = Ex (x) Ey flattened,
      grid gradient = G1^T-style contraction of point values,
  i.e. two batched MXU matmuls each — no gather, no scatter.  The basis
  depends only on the *baked* positions, so it is computed once per grid
  instantiation, not per iteration.
* Links live in a padded per-point table (N, P, K) (see state.py), so
  link -> point reductions are dense sums over the K axis — no scatter,
  no cumsum, and the source-point lookup is a broadcast.  Profiled on the
  TPU this runs the link pass ~3x faster than sorted-CSR + cumsum.
* The destination gather is the per-iteration floor (~3 ns per index on a
  v5e, independent of row width up to 128 lanes), so each iteration does
  exactly ONE gather: destination positions and the destination image's
  EM parameters ride in the same widened row (``_dst_table``), replacing
  the separate one-hot EM lookup.
* ``lax.cond`` nesting is poison: XLA hoists an inner conditional (the
  every-10th-iteration EM re-estimate) out of the outer alive-branch and
  runs its full body — gather included — every single scan step (profiled
  3x the stage cost).  The stage scans therefore use *sibling* top-level
  conds: one for the EM cadence, one for the live update.

The per-image OpenMP loops of the reference become the leading array axis;
the cross-image reductions (energy sums, grid mean) become plain ``sum``
over that axis — or all-reduces when the axis is sharded over a mesh.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..transforms.bspline import bspline_displacement, bspline_weights
from .stats import inlier_probability

__all__ = [
    "transform_points_affine",
    "transform_points_bspline",
    "bspline_basis",
    "bspline_apply_sep",
    "link_geometry",
    "link_weights",
    "link_pass",
    "linear_update",
    "deformable_update",
    "linear_stage",
    "deformable_stage",
    "em_reestimate",
    "inlier_census",
    "state_report",
]

_HI = jax.lax.Precision.HIGHEST


def transform_points_affine(affine, xyz):
    """xyz2[i] = A_i(xyz[i]) for (N,4,4) x (N,P,3)."""
    rot = affine[:, :3, :3]  # (N, 3, 3)
    trans = affine[:, :3, 3]  # (N, 3)
    return (xyz[:, :, None, :] * rot[:, None, :, :]).sum(-1) + trans[:, None, :]


def transform_points_bspline(coeffs, origin, spacing, xyz):
    """Gather-based evaluation (kept for cases without a precomputed
    basis); coeffs (N, Dx, Dy, Dz, 3)."""
    disp = jax.vmap(lambda c, p: bspline_displacement(c, origin, spacing, p))(
        coeffs, xyz
    )
    return xyz + disp


# --------------------------------------------------------------- separable

def bspline_basis(origin, spacing, dims, pos):
    """Per-axis banded B-spline basis matrices for points ``pos`` (N,P,3).

    Returns (G1, Ez) with Ez (N, P, Dz) and G1 (N, P, qpad) — the
    flattened outer product of the x and y bases, zero-padded from
    Dx*Dy up to a multiple of 128: a (q, x) contraction output with
    q < 128 lanes sends XLA's TPU backend down a VPU loop instead of the
    MXU (measured 85 ms vs <3 ms per deformable iteration at the coarsest
    reference grid, 20 images x 20k points).  Zero columns are exact.
    Rows corresponding to out-of-grid support simply lose those taps
    (zero border mode, imageGroup.cxx:205).
    """
    u = (pos - origin) / spacing  # (N, P, 3)
    iu = jnp.floor(u)
    base = iu.astype(jnp.int32) - 1
    w = bspline_weights(u - iu)  # (N, P, 3, 4)

    def axis_matrix(ax, d):
        cols = jnp.arange(d, dtype=jnp.int32)  # (D,)
        rel = cols[None, None, :] - base[:, :, ax, None]  # (N, P, D)
        e = jnp.zeros(rel.shape, jnp.float32)
        for a in range(4):
            e = jnp.where(rel == a, w[:, :, ax, a, None], e)
        return e

    ex = axis_matrix(0, dims[0])
    ey = axis_matrix(1, dims[1])
    ez = axis_matrix(2, dims[2])
    g1 = (ex[:, :, :, None] * ey[:, :, None, :]).reshape(
        ex.shape[0], ex.shape[1], dims[0] * dims[1]
    )
    q = dims[0] * dims[1]
    qpad = -(-q // 128) * 128
    if qpad != q:
        g1 = jnp.pad(g1, ((0, 0), (0, 0), (0, qpad - q)))
    return g1, ez


def bspline_apply_sep(coeffs, basis, xyz):
    """xyz + displacement via the separable basis.  coeffs (N,Dx,Dy,Dz,3).

    The G1 basis axis is zero-padded to 128 lanes (see bspline_basis);
    the coefficient rows pad to match (zero columns x anything = 0)."""
    g1, ez = basis
    n, dx, dy, dz, _ = coeffs.shape
    c = coeffs.reshape(n, dx * dy, dz * 3)
    qpad = g1.shape[2]
    if qpad != dx * dy:
        c = jnp.pad(c, ((0, 0), (0, qpad - dx * dy), (0, 0)))
    # (N, P, qpad) x (N, qpad, Dz*3) -> (N, P, Dz*3): MXU batched matmul
    t = jnp.einsum("npq,nqc->npc", g1, c, precision=_HI)
    t = t.reshape(n, g1.shape[1], dz, 3)
    disp = jnp.einsum("npz,npzc->npc", ez, t, precision=_HI)
    return xyz + disp


def _bspline_scatter_sep(basis, vals, n_xy):
    """Transpose of the evaluation: accumulate per-point ``vals`` (N,P,C)
    into the control grid, B-spline weighted.  ``n_xy`` = Dx*Dy (the
    unpadded grid-plane count).  Returns (N, Dx*Dy, Dz, C)."""
    g1, ez = basis
    vz = jnp.einsum("npz,npc->npzc", ez, vals, precision=_HI)
    n, p, dz, c = vz.shape
    # contract the (large) point axis on the MXU
    out = jnp.einsum("npq,npx->nqx", g1, vz.reshape(n, p, dz * c), precision=_HI)
    return out.reshape(n, g1.shape[2], dz, c)[:, :n_xy]


# ------------------------------------------------------------------- links

def _gather_dst(xyz2, link_dst):
    """Destination positions for flattened links (..., K) -> (..., K, 3)."""
    n, p, _ = xyz2.shape
    flat = xyz2.reshape(n * p, 3)
    return flat[link_dst]


def link_geometry(arrays):
    """Per-half-link source/destination positions, difference and distance.

    Returns (pA (N,P,1,3), diff (N,P,K,3), dist (N,P,K)); invalid links
    produce garbage — callers must mask with ``link_valid``.

    The destination gather goes through a split-bf16 table (see
    ``_dst_table``): half the HBM traffic of an f32 gather at ~2^-16
    relative error.
    """
    xyz2 = arrays.xyz2
    n, p, _ = xyz2.shape
    pA = xyz2[:, :, None, :]  # source point is the table row — no gather
    hi, lo = _split_bf16(xyz2.reshape(n * p, 3))
    g2 = jnp.concatenate([hi, lo], axis=-1)[arrays.link_dst]
    pB = g2[..., :3].astype(jnp.float32) + g2[..., 3:].astype(jnp.float32)
    diff = pB - pA
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    return pA, diff, dist


def link_weights(arrays, dist):
    """w = min(P_inlier^A(d), P_inlier^B(d)) per half-link
    (imageGroup.cxx:1098-1100); 0 on padding.

    The destination image's EM parameters are fetched with a one-hot
    matmul over the (small) image axis — a gather-free lane-friendly op.
    (Standalone form for one-shot callers; the per-iteration path uses
    ``link_pass``, which folds the EM lookup into the position gather.)
    """
    n, p, _ = arrays.xyz2.shape
    prob_a = inlier_probability(dist, arrays.em[:, None, None, :])
    dst_img = arrays.link_dst // p  # (N, P, K)
    onehot = jax.nn.one_hot(dst_img, n, dtype=jnp.float32)
    em_b = jnp.einsum("npkm,mc->npkc", onehot, arrays.em, precision=_HI)
    prob_b = inlier_probability(dist, em_b)
    w = jnp.minimum(prob_a, prob_b)
    return jnp.where(arrays.link_valid, w, 0.0)


def _split_bf16(x):
    """Split f32 -> (hi, lo) bf16 pair with hi + lo ≈ x to ~16 mantissa
    bits (relative error ~2^-16)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dst_table(xyz2, em):
    """Widened gather table: row = split-bf16 [x, y, z, c1, c2, ratio].

    The gather cost on TPU is per *index* — every index reads one full
    (8, 128) tile of the operand regardless of row width (measured: ~6 ns
    per index for an f32 operand, layout/locality-independent).  Two
    levers follow: (1) pack the destination image's EM parameters next to
    its position so the EM lookup rides the same gather for free, and
    (2) store the operand in bf16 so each tile is 2 KB instead of 4 KB —
    measured 2.3x faster.  f32 accuracy is kept by storing hi/lo bf16
    halves side by side (row width 12 still << 128 lanes, so the tile
    count is unchanged) and reconstructing hi + lo after the gather."""
    n, p, _ = xyz2.shape
    em_rows = jnp.broadcast_to(em[:, None, :], (n, p, 3))
    rows = jnp.concatenate([xyz2, em_rows], axis=-1).reshape(n * p, 6)
    hi, lo = _split_bf16(rows)
    return jnp.concatenate([hi, lo], axis=-1)  # (n*p, 12) bf16


def link_pass(arrays, xyz2=None, em=None):
    """The fused per-iteration link pass: ONE gather yields destination
    positions and EM parameters; returns (pA, diff, dist, w) with w = 0 on
    padding (imageGroup.cxx:1084-1100)."""
    xyz2 = arrays.xyz2 if xyz2 is None else xyz2
    em = arrays.em if em is None else em
    g2 = _dst_table(xyz2, em)[arrays.link_dst]  # (N, P, K, 12) bf16
    g = g2[..., :6].astype(jnp.float32) + g2[..., 6:].astype(jnp.float32)
    pA = xyz2[:, :, None, :]
    diff = g[..., :3] - pA
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    prob_a = inlier_probability(dist, em[:, None, None, :])
    prob_b = inlier_probability(dist, g[..., 3:6])
    w = jnp.minimum(prob_a, prob_b)
    return pA, diff, dist, jnp.where(arrays.link_valid, w, 0.0)


def inlier_census(arrays, inlier_threshold: float):
    """Per-image (pairs, inliers, outliers) counts on device
    (imageGroup.cxx:988-1060) — only (N, 3) ints cross back to the host.

    Uses ``link_pass`` (packed-table EM lookup) rather than
    ``link_weights``, whose one-hot einsum materializes an (N, P, K, N)
    intermediate — ~1.8 GB at 20 images x 20k points."""
    _, _, _, w = link_pass(arrays)
    valid = arrays.link_valid
    pairs = jnp.sum(valid, axis=(1, 2))
    inliers = jnp.sum(valid & (w >= inlier_threshold), axis=(1, 2))
    return jnp.stack([pairs, inliers, pairs - inliers], axis=1)


def linear_update(arrays, movable, alpha: float, use_scale: bool):
    """One iteration of the groupwise linear similarity update.

    Faithful to imageGroup.cxx:1063-1149: per image, weighted first/second
    moments of source/destination positions over all half-links give a
    closed-form per-axis scale factor ``(var_B / var_A)^(alpha/2)`` and a
    translation step ``alpha * mean_disp + mean_posA * (1 - newScale)``.

    Returns (new_affine (N,4,4), E) with E = sqrt(sum w^2 d^2 / sum w^2)
    over movable images.
    """
    pA, diff, dist, w = link_pass(arrays)
    pB = pA + diff

    w2 = w * w
    mov = movable.astype(jnp.float32)
    s_dist = jnp.sum(mov * jnp.sum(w2 * dist * dist, axis=(1, 2)))
    s_weight_tot = jnp.sum(mov * jnp.sum(w2, axis=(1, 2)))

    s_disp = jnp.sum(w[..., None] * diff, axis=(1, 2))  # (N, 3)
    s_pos_a = jnp.sum(w[..., None] * pA, axis=(1, 2))
    s_pos_b = jnp.sum(w[..., None] * pB, axis=(1, 2))
    s_pos_a2 = jnp.sum(w[..., None] * pA * pA, axis=(1, 2))
    s_pos_b2 = jnp.sum(w[..., None] * pB * pB, axis=(1, 2))
    s_w = jnp.sum(w, axis=(1, 2))[:, None]  # (N, 1)

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


def deformable_update(
    arrays,
    movable,
    coeffs,  # (N, Dx, Dy, Dz, 3)
    basis,  # from bspline_basis(origin, spacing, dims, arrays.xyz)
    limit,  # (3,) = max_displacement_ratio * spacing
    alpha,
    inlier_threshold: float,
    constraint_weight: float,
    subtract_mean: bool,
    n_real: int | None = None,
    has_constraints: bool = True,
):
    """One deformable iteration: candidate coefficients + diffeo guard.

    ``n_real`` is the true image count when the image axis is padded for
    mesh divisibility (parallel.mesh.pad_group) — it is the hubless-mean
    divisor (imageGroup.cxx:417); defaults to the array dimension.
    ``has_constraints`` False (static) skips the hard-link block — the
    padded hard table costs a full extra destination gather per iteration
    even when every slot is invalid.

    Faithful to imageGroup.cxx:234-472.  Returns
    (candidate (N,...,3), n_big int32, E float32); the caller commits the
    candidate only when the guard passes (n_big == 0 or the guarantee is
    off) — the reference's "return -1, discard gradient buffer" control
    flow stays on the host.
    """
    n, dx, dy, dz, _ = coeffs.shape

    pA, diff, dist, w = link_pass(arrays)
    w2 = w * w
    w2 = jnp.where(w < inlier_threshold, 0.0, w2)  # imageGroup.cxx:271

    mov = movable.astype(jnp.float32)
    s_dist = jnp.sum(mov * jnp.sum(w2 * dist * dist, axis=(1, 2)))
    s_weight_tot = jnp.sum(mov * jnp.sum(w2, axis=(1, 2)))

    # links -> points: dense reduction over the per-point K axis
    s_disp = jnp.sum(w2[..., None] * diff, axis=2)  # (N, P, 3)
    s_weight = jnp.sum(w2, axis=2)  # (N, P)

    if has_constraints:
        # hard landmark constraints (imageGroup.cxx:282-297)
        hw2 = jnp.where(
            arrays.hard_valid, constraint_weight * constraint_weight, 0.0
        )
        hB = _gather_dst(arrays.xyz2, arrays.hard_dst)
        hdiff = hB - arrays.xyz2[:, :, None, :]
        hdist2 = jnp.sum(hdiff * hdiff, axis=-1)
        s_dist = s_dist + jnp.sum(mov * jnp.sum(hw2 * hdist2, axis=(1, 2)))
        s_weight_tot = s_weight_tot + jnp.sum(mov * jnp.sum(hw2, axis=(1, 2)))
        s_disp = s_disp + jnp.sum(hw2[..., None] * hdiff, axis=2)
        s_weight = s_weight + jnp.sum(hw2, axis=2)

    sums = jnp.concatenate([s_disp, s_weight[..., None]], axis=-1)

    # points -> grid: separable-basis transpose matmul at the *baked*
    # positions (imageGroup.cxx:301-338)
    active = (s_weight > 0)[..., None]
    vals = jnp.where(active, sums, 0.0)  # (N, P, 4)
    grid = _bspline_scatter_sep(basis, vals, dx * dy)  # (N, Dx*Dy, Dz, 4)
    grad = grid[..., :3].reshape(n, dx * dy * dz, 3)
    gw = grid[..., 3].reshape(n, dx * dy * dz)

    flat_coeffs = coeffs.reshape(n, dx * dy * dz, 3)
    stepped = jnp.where(
        (gw > 0)[..., None],
        flat_coeffs + alpha * grad / jnp.maximum(gw, 1e-30)[..., None],
        flat_coeffs,
    )
    stepped = jnp.where(movable[:, None, None], stepped, flat_coeffs)

    # cross-image mean subtraction — the hubless centering barrier
    # (imageGroup.cxx:379-432); divisor is the total image count (:417).
    if subtract_mean:
        divisor = n if n_real is None else n_real
        mean = (
            jnp.sum(jnp.where(movable[:, None, None], stepped, 0.0), axis=0)
            / divisor
        )
        stepped = jnp.where(movable[:, None, None], stepped - mean, stepped)

    # diffeomorphism guard: per-axis |coeff| > ratio * spacing[axis]
    big = jnp.abs(stepped) > limit
    n_big = jnp.sum(jnp.where(movable[:, None, None], big, False))

    candidate = stepped.reshape(coeffs.shape)
    e = jnp.sqrt(s_dist / jnp.maximum(s_weight_tot, 1e-30))
    return candidate, n_big, e


# ---------------------------------------------------------- chunked loops
#
# The optimizer runs on a possibly *remote* TPU where every host<->device
# synchronization costs a network round trip.  Instead of dispatching one
# iteration at a time (reference control flow), a whole *stage* of
# iterations runs as one lax.scan — EM re-estimation included, fired by a
# lax.cond every ``stat_interval`` steps exactly like the reference's
# ``iteration % statIntervalUpdate == 0`` cadence (imageGroup.cxx:59,94).
# The scan returns per-iteration energies, landmark statistics (computed
# on device) and — for the deformable stage — a per-step success flag so
# the host can reproduce the stacked-grid retry logic exactly: once an
# iteration trips the diffeomorphism guard, the scan stops computing (the
# remaining steps short-circuit through a lax.cond no-op), so the returned
# state is the state at the reject.
#
# The dispatch length ``n_steps`` is static (one compile per stage shape);
# the dynamic ``n_live`` marks how many steps are real, so resuming from a
# checkpoint or retrying after a guard trip reuses the same executable.

import dataclasses as _dc

from .stats import estimate_mixture


def em_reestimate(
    arrays, xyz2, em, max_iterations, epsilon, stride,
    reservoir_cap=0, step=None,
):
    """EM over the current link distances (imageGroup.cxx:569-598).

    ``stride`` > 1 subsamples the distances (the TPU analog of the
    reference's 10k reservoir, stats.h:36-76); static, so it is free.

    ``reservoir_cap`` > 0 instead reproduces the reference's *random*
    acceptance sampling (stats.h:58-76): each sample is kept with
    probability cap / nLinks_i in link order until the buffer is full.
    ``step`` (the global iteration index) seeds the per-event draw.
    """
    n, p, _ = xyz2.shape
    k = arrays.link_dst.shape[2]
    if stride > 1 and not reservoir_cap:
        # Gather ONLY the strided subsample: the stride is static, so the
        # link table slices BEFORE the destination fetch — ~stride x fewer
        # gather tiles than computing every distance and discarding most.
        # Same split-bf16 table and flat-stride positions as the full
        # path, so the sampled distances are bit-identical to it.
        dst = arrays.link_dst.reshape(n, p * k)[:, ::stride]
        valid = arrays.link_valid.reshape(n, p * k)[:, ::stride]
        src = jnp.arange(0, p * k, stride, dtype=jnp.int32) // k
        pA = xyz2[:, src]  # (N, S, 3) f32 source positions
        hi, lo = _split_bf16(xyz2.reshape(n * p, 3))
        g2 = jnp.concatenate([hi, lo], axis=-1)[dst]
        pB = g2[..., :3].astype(jnp.float32) + g2[..., 3:].astype(jnp.float32)
        d = pB - pA
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1))
        return estimate_mixture(
            dist, valid, em, max_iterations=max_iterations, epsilon=epsilon
        )
    a = _dc.replace(arrays, xyz2=xyz2)
    _, _, dist = link_geometry(a)
    dist = dist.reshape(n, -1)
    valid = arrays.link_valid.reshape(n, -1)
    if reservoir_cap:
        n_links = jnp.sum(valid, axis=1, keepdims=True).astype(jnp.float32)
        key = jax.random.fold_in(
            jax.random.PRNGKey(0),
            jnp.int32(0) if step is None else jnp.int32(step),
        )
        u = jax.random.uniform(key, dist.shape)
        p_accept = jnp.minimum(reservoir_cap / jnp.maximum(n_links, 1.0), 1.0)
        accept = valid & (u <= p_accept)
        accept = accept & (jnp.cumsum(accept, axis=1) <= reservoir_cap)
        valid = accept
    return estimate_mixture(
        dist, valid, em, max_iterations=max_iterations, epsilon=epsilon
    )


def landmark_device_stats(xyz2, lm_flat, lm_seg, n_names):
    """Mean/max/std of landmark distance-to-centroid, on device.

    lm_flat (M,) flattened (image * P + point) indices; lm_seg (M,) name
    ids sorted ascending; n_names static (imageGroup.cxx:1229-1282).
    """
    n, p, _ = xyz2.shape
    pos = xyz2.reshape(n * p, 3)[lm_flat]  # (M, 3)
    onehot = jax.nn.one_hot(lm_seg, n_names, dtype=jnp.float32)  # (M, G)
    counts = jnp.maximum(onehot.sum(axis=0), 1.0)  # (G,)
    centroids = jnp.einsum("mg,mc->gc", onehot, pos, precision=_HI) / counts[:, None]
    d = jnp.linalg.norm(pos - centroids[lm_seg], axis=1)  # (M,)
    mean = jnp.mean(d)
    mx = jnp.max(d)
    std = jnp.sqrt(jnp.maximum(jnp.mean(d * d) - mean * mean, 0.0))
    return jnp.stack([mean, mx, std])


def linear_stage(
    arrays,
    movable,
    alpha,
    use_scale,
    n_steps,
    it0,
    n_live,
    stat_interval,
    em_iters,
    em_epsilon,
    em_stride,
    lm=None,
    em_reservoir=0,
    inlier_threshold=0.5,
    report_bins=0,
):
    """Run a whole linear stage (``n_steps`` iterations) in ONE dispatch.

    EM re-estimation fires inside the scan whenever the global iteration
    index ``it0 + i`` hits the ``stat_interval`` cadence — the reference's
    ``iteration % statIntervalUpdate == 0`` (imageGroup.cxx:59).  Steps at
    or past the dynamic ``n_live`` are no-ops, so resuming from a
    checkpoint reuses the same compiled executable.

    The EM cond and the update cond are SIBLINGS in the scan body, never
    nested — XLA hoists nested conditionals and would run the EM body
    (gather included) every step (see module docstring).

    Returns (affine, xyz2, em, packed): with ``report_bins`` 0, packed is
    the per-iteration measures (K, 5) with rows
    [E, ok, lm_mean, lm_max, lm_std] (ok marks live steps, prefix-true);
    with ``report_bins`` > 0 the stage ALSO evaluates ``state_report`` on
    its final state (post-bake semantics: xyz := xyz2) and packed is the
    flat concat [measures.ravel(), report] — one dispatch and one
    device->host transfer cover the stage AND the between-stage report
    the host needs next (each sync costs a network RTT on a
    remote-attached TPU).
    """
    zero3 = jnp.zeros(3)

    def body(carry, i):
        affine, xyz2, em = carry
        alive = i < n_live
        em = jax.lax.cond(
            alive & ((it0 + i) % stat_interval == 0),
            lambda: em_reestimate(
                arrays, xyz2, em, em_iters, em_epsilon, em_stride,
                reservoir_cap=em_reservoir, step=it0 + i,
            ),
            lambda: em,
        )

        def live():
            a = _dc.replace(arrays, affine=affine, xyz2=xyz2, em=em)
            new_affine, e = linear_update(a, movable, alpha, use_scale)
            new_xyz2 = transform_points_affine(new_affine, arrays.xyz)
            stats = (
                landmark_device_stats(new_xyz2, *lm) if lm is not None else zero3
            )
            return new_affine, new_xyz2, e, stats

        affine, xyz2, e, stats = jax.lax.cond(
            alive,
            live,
            lambda: (affine, xyz2, jnp.float32(0.0), zero3),
        )
        meas = jnp.concatenate(
            [e[None], alive.astype(jnp.float32)[None], stats]
        )
        return (affine, xyz2, em), meas

    (affine, xyz2, em), measures = jax.lax.scan(
        body,
        (arrays.affine, arrays.xyz2, arrays.em),
        jnp.arange(n_steps, dtype=jnp.int32),
    )
    if report_bins:
        a_fin = _dc.replace(arrays, xyz=xyz2, xyz2=xyz2, em=em)
        rep = state_report(a_fin, movable, inlier_threshold, report_bins)
        return affine, xyz2, em, jnp.concatenate([measures.reshape(-1), rep])
    return affine, xyz2, em, measures


def deformable_stage(
    arrays,
    movable,
    coeffs,
    basis,
    limit,
    alpha,
    inlier_threshold,
    constraint_weight,
    subtract_mean,
    guarantee,
    n_steps,
    it0,
    n_live,
    stat_interval,
    em_iters,
    em_epsilon,
    em_stride,
    lm=None,
    em_reservoir=0,
    n_real=None,
    has_constraints=True,
    report_bins=0,
):
    """Run up to a whole deformable level (``n_steps`` iterations) in ONE
    dispatch, EM included (see linear_stage; same sibling-cond structure).

    Returns (coeffs, xyz2, em, packed) — packed as in linear_stage:
    measures (K, 5), or [measures.ravel(), state_report] when
    ``report_bins`` > 0.  Measure rows are
    [E, ok, lm_mean, lm_max, lm_std].  ok[i] False means iteration i
    tripped the diffeomorphism guard (or lies at/past ``n_live``); state
    reflects everything before the trip (the reject discards its update,
    imageGroup.cxx:97-115), and all later steps short-circuit to no-ops —
    so a post-trip relaunch with a fresh grid reuses the same executable
    via ``it0``/``n_live``.
    """
    zero3 = jnp.zeros(3)

    def body(carry, i):
        coeffs, xyz2, em, dead = carry
        alive = ~dead & (i < n_live)
        em = jax.lax.cond(
            alive & ((it0 + i) % stat_interval == 0),
            lambda: em_reestimate(
                arrays, xyz2, em, em_iters, em_epsilon, em_stride,
                reservoir_cap=em_reservoir, step=it0 + i,
            ),
            lambda: em,
        )

        def live():
            a = _dc.replace(arrays, xyz2=xyz2, em=em)
            cand, n_big, e = deformable_update(
                a,
                movable,
                coeffs,
                basis,
                limit,
                alpha,
                inlier_threshold,
                constraint_weight,
                subtract_mean,
                n_real,
                has_constraints,
            )
            ok = (n_big == 0) if guarantee else jnp.bool_(True)
            new_coeffs = jnp.where(ok, cand, coeffs)
            new_xyz2 = jnp.where(
                ok, bspline_apply_sep(new_coeffs, basis, arrays.xyz), xyz2
            )
            stats = (
                landmark_device_stats(new_xyz2, *lm) if lm is not None else zero3
            )
            return new_coeffs, new_xyz2, ok, e, stats

        coeffs, xyz2, ok, e, stats = jax.lax.cond(
            alive,
            live,
            lambda: (coeffs, xyz2, jnp.bool_(False), jnp.float32(0.0), zero3),
        )
        meas = jnp.concatenate(
            [e[None], (alive & ok).astype(jnp.float32)[None], stats]
        )
        return (coeffs, xyz2, em, dead | (alive & ~ok)), meas

    (coeffs, xyz2, em, _), measures = jax.lax.scan(
        body,
        (coeffs, arrays.xyz2, arrays.em, jnp.bool_(False)),
        jnp.arange(n_steps, dtype=jnp.int32),
    )
    if report_bins:
        a_fin = _dc.replace(arrays, xyz=xyz2, xyz2=xyz2, em=em)
        rep = state_report(a_fin, movable, inlier_threshold, report_bins)
        return coeffs, xyz2, em, jnp.concatenate([measures.reshape(-1), rep])
    return coeffs, xyz2, em, measures


# -------------------------------------------------------------- state report
#
# Everything the host needs between stages, in ONE dispatch returning ONE
# flat f32 vector (a device->host transfer through the remote tunnel costs
# a network RTT regardless of size, so the movable/global bounding boxes,
# the inlier census, the EM parameters and the distance histograms travel
# together).

def state_report(arrays, movable, inlier_threshold, n_bins, bin_size=1.0):
    """Pack [bbox_movable(6), bbox_all(6), census(N*3), em(N*3),
    hist(N*n_bins)] into one flat f32 vector.

    * bounding boxes over the *baked* coordinates (imageGroup.cxx:1513-1527)
    * census = per-image (pairs, inliers, outliers) (imageGroup.cxx:988-1060)
    * hist = per-image distance histogram, bin = round(d / bin_size)
      (stats.cxx:121-131); distances beyond the last bin clip into it.
    """
    n = arrays.n_images
    _, _, dist, w = link_pass(arrays)
    valid = arrays.link_valid
    pairs = jnp.sum(valid, axis=(1, 2))
    inliers = jnp.sum(valid & (w >= inlier_threshold), axis=(1, 2))
    census = jnp.stack([pairs, inliers, pairs - inliers], axis=1).astype(
        jnp.float32
    )

    big = jnp.float32(1e30)
    mask_all = arrays.point_valid[..., None]
    mask_mov = (movable[:, None] & arrays.point_valid)[..., None]
    xyz = arrays.xyz
    bbox_mov = jnp.concatenate(
        [
            jnp.min(jnp.where(mask_mov, xyz, big), axis=(0, 1)),
            jnp.max(jnp.where(mask_mov, xyz, -big), axis=(0, 1)),
        ]
    )
    bbox_all = jnp.concatenate(
        [
            jnp.min(jnp.where(mask_all, xyz, big), axis=(0, 1)),
            jnp.max(jnp.where(mask_all, xyz, -big), axis=(0, 1)),
        ]
    )

    idx = jnp.clip(
        jnp.rint(dist / bin_size).astype(jnp.int32), 0, n_bins - 1
    ).reshape(n, -1)
    wv = valid.astype(jnp.float32).reshape(n, -1)
    hist = jax.vmap(
        lambda ii, ww: jnp.zeros((n_bins,), jnp.float32).at[ii].add(ww)
    )(idx, wv)

    return jnp.concatenate(
        [bbox_mov, bbox_all, census.ravel(), arrays.em.ravel(), hist.ravel()]
    )
