"""Descriptor quality metrics: keypoint repeatability and matching
precision/recall on volume pairs with a KNOWN ground-truth warp.

The reference never quantifies its extractor (SURVEY.md §4: validation is
empirical via landmarks); this harness substantiates that the framework's
descriptor (descriptor.py — the vtkOpenSURF3D submodule is absent
upstream) has real matching power, per the matcher contract
(match/match.cpp:39-47): keypoints detected in a warped copy should be
re-detected near the mapped positions (repeatability), and descriptor
nearest-neighbor matching should link mostly true correspondences
(precision) for most of the repeatable points (recall).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ...io.volume import Volume

__all__ = ["make_test_volume", "warp_volume", "descriptor_metrics"]


def make_test_volume(shape=(96, 96, 96), n_blobs=120, seed=0, spacing=1.0):
    """Blobby synthetic volume with structure at several scales."""
    rng = np.random.default_rng(seed)
    g = np.stack(
        np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape],
                    indexing="ij"),
        -1,
    )
    data = np.zeros(shape, np.float32)
    lo = 0.15 * np.asarray(shape)
    hi = 0.85 * np.asarray(shape)
    for _ in range(n_blobs):
        c = rng.uniform(lo, hi)
        r2 = np.sum((g - c) ** 2, -1)
        sigma = rng.uniform(1.5, 5.0)
        data += np.float32(rng.uniform(30, 120) * rng.choice([-1, 1])) * np.exp(
            -r2 / (2 * sigma**2)
        ).astype(np.float32)
    return Volume(data, origin=np.zeros(3), spacing=np.full(3, float(spacing)))


def _warp_fn(shape, amplitude, seed):
    rng = np.random.default_rng(seed)
    phase = rng.uniform(0, 2 * np.pi, 3)
    freq = rng.uniform(0.8, 1.3, 3)
    extent = np.asarray(shape, np.float64)

    def fwd(p):
        """Smooth forward map (original -> warped space), physical coords."""
        q = np.asarray(p, np.float64)
        disp = amplitude * np.sin(
            2 * np.pi * freq * q[..., [1, 2, 0]] / extent + phase
        )
        return (q + disp).astype(np.float32)

    return fwd


def warp_volume(vol: Volume, amplitude=3.0, seed=1):
    """Resample ``vol`` through a smooth sinusoidal warp.

    Returns (warped Volume, fwd) with fwd mapping original physical
    coordinates to warped-volume coordinates.  The inverse map needed for
    resampling is approximated by fixed-point iteration (the warp is
    small and smooth).
    """
    fwd = _warp_fn(vol.shape, amplitude, seed)
    shape = vol.shape
    g = np.stack(
        np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape],
                    indexing="ij"),
        -1,
    ).reshape(-1, 3)
    phys = vol.origin + g * vol.spacing
    # invert: find x with fwd(x) = y by fixed point x <- y - disp(x)
    x = phys.copy()
    for _ in range(8):
        x = phys - (fwd(x) - x)
    src = (x - vol.origin) / vol.spacing

    import jax.numpy as jnp

    from .resample import trilinear_sample

    vals = np.asarray(
        trilinear_sample(jnp.asarray(vol.data), jnp.asarray(src))
    ).reshape(shape)
    return Volume(vals.astype(np.float32), vol.origin, vol.spacing), fwd


@dataclasses.dataclass
class DescriptorMetrics:
    n_a: int
    n_b: int
    repeatability: float  # fraction of A keypoints re-detected in B
    n_matches: int
    precision: float  # accepted matches that are true correspondences
    recall: float  # repeatable points recovered by matching


def descriptor_metrics(
    kp_a,
    kp_b,
    fwd,
    match_params=None,
    tol_factor: float = 1.5,
) -> DescriptorMetrics:
    """Repeatability + match precision/recall for keypoints of a volume A
    and its warped copy B with ground-truth map ``fwd`` (A -> B space).

    A keypoint is *repeated* when some B keypoint lies within
    ``tol_factor * scale`` of its mapped position; a match is *correct*
    under the same tolerance.
    """
    from ..matcher import MatchParams, match_pair

    mapped = fwd(kp_a.xyz)  # (KA, 3) positions in B space
    tol = tol_factor * np.maximum(kp_a.scale, 1.0)

    # nearest B keypoint per mapped A keypoint (brute force, chunked)
    nn = np.empty(len(kp_a), np.float32)
    bxyz = kp_b.xyz
    for s in range(0, len(kp_a), 2048):
        d = np.linalg.norm(
            mapped[s : s + 2048, None, :] - bxyz[None, :, :], axis=-1
        )
        nn[s : s + 2048] = d.min(axis=1)
    repeated = nn <= tol
    repeatability = float(repeated.mean()) if len(kp_a) else 0.0

    params = match_params
    if params is None:
        params = MatchParams(max_distance=1e10, second_ratio=0.9)
    m = match_pair(kp_a, kp_b, params)  # (M, 2) (idx in A, idx in B)
    if m.shape[0]:
        err = np.linalg.norm(mapped[m[:, 0]] - bxyz[m[:, 1]], axis=-1)
        correct = err <= tol[m[:, 0]]
        precision = float(correct.mean())
        matched_true = np.zeros(len(kp_a), bool)
        matched_true[m[correct, 0]] = True
        n_rep = max(int(repeated.sum()), 1)
        recall = float((matched_true & repeated).sum() / n_rep)
    else:
        precision = recall = 0.0
    return DescriptorMetrics(
        n_a=len(kp_a),
        n_b=len(kp_b),
        repeatability=repeatability,
        n_matches=int(m.shape[0]),
        precision=precision,
        recall=recall,
    )
