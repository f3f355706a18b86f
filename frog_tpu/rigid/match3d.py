"""Pairwise keypoint match + RANSAC translation/scale fit — the match3d
component (reference C12: part of the absent vtkOpenSURF3D submodule,
invoked as bin/match3d by the desk actions, frog.json:430-480).

Contract, proven by its consumer (js/lib/LSRegistration.js:174-190 and the
laplace solver): a JSON-style record
``{translation: [3], scale: s, inliers: n, fail: bool, bboxA, bboxB}``
describing the similarity (translation + uniform scale, no rotation — the
solver has only those 4 DoF) mapping volume A's keypoints onto volume B's.

RANSAC hypotheses are fitted from 2-correspondence samples on the device
(scale from pair-distance ratio, translation from one correspondence),
scored over all matches, and refined by a weighted least-squares fit on
the best hypothesis's inliers.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..io.keypoints import Keypoints
from ..ops.matcher import MatchParams, match_pair

__all__ = ["Match3DParams", "match3d"]


@dataclasses.dataclass(frozen=True)
class Match3DParams:
    """Defaults follow the desk action defaults
    (js/lib/LSRegistration.js:30-37)."""

    ransac_distance: float = 40.0
    matching_distance: float = 0.3
    matching_second_ratio: float = 0.98
    matching_scale: float = 1.5
    min_inliers: int = 1
    n_hypotheses: int = 2000


def match3d(
    kp_a: Keypoints,
    kp_b: Keypoints,
    params: Match3DParams = Match3DParams(),
    seed: int = 0,
) -> dict:
    mp = MatchParams(
        max_distance=params.matching_distance,
        second_ratio=params.matching_second_ratio,
        scale_ratio=params.matching_scale,
    )
    matches = match_pair(kp_a, kp_b, mp)
    result = {
        "translation": [0.0, 0.0, 0.0],
        "scale": 1.0,
        "inliers": 0,
        "fail": True,
        "bboxA": _bbox(kp_a),
        "bboxB": _bbox(kp_b),
        "matches": int(matches.shape[0]),
    }
    if matches.shape[0] < 2:
        return result

    src = jnp.asarray(kp_a.xyz[matches[:, 0]])  # (M, 3)
    dst = jnp.asarray(kp_b.xyz[matches[:, 1]])
    m = src.shape[0]
    key = jax.random.PRNGKey(seed)
    pairs = jax.random.randint(key, (params.n_hypotheses, 2), 0, m)

    a1, a2 = src[pairs[:, 0]], src[pairs[:, 1]]
    b1, b2 = dst[pairs[:, 0]], dst[pairs[:, 1]]
    la = jnp.linalg.norm(a2 - a1, axis=1)
    lb = jnp.linalg.norm(b2 - b1, axis=1)
    s = lb / jnp.maximum(la, 1e-6)  # (H,)
    t = b1 - s[:, None] * a1  # (H, 3)

    d2max = params.ransac_distance**2
    # inlier counts: |s*a + t - b|^2 < d2max, over all matches
    proj = s[:, None, None] * src[None, :, :] + t[:, None, :]  # (H, M, 3)
    err = jnp.sum((proj - dst[None]) ** 2, axis=-1)
    counts = jnp.sum(err < d2max, axis=1)
    best = int(jnp.argmax(counts))
    inl = np.asarray(err[best] < d2max)
    n_inl = int(inl.sum())

    if n_inl < max(params.min_inliers, 2):
        return result

    # least-squares refinement on inliers: b = s a + t
    a_in = np.asarray(src)[inl]
    b_in = np.asarray(dst)[inl]
    ca, cb = a_in.mean(0), b_in.mean(0)
    var = np.sum((a_in - ca) ** 2)
    scale = float(np.sum((a_in - ca) * (b_in - cb)) / max(var, 1e-12))
    trans = cb - scale * ca
    result.update(
        translation=[float(v) for v in trans],
        scale=scale,
        inliers=n_inl,
        fail=scale <= 0,
    )
    return result


def _bbox(kp: Keypoints):
    if len(kp) == 0:
        return [0.0] * 6
    lo = kp.xyz.min(0)
    hi = kp.xyz.max(0)
    return [float(lo[0]), float(hi[0]), float(lo[1]), float(hi[1]), float(lo[2]), float(hi[2])]
