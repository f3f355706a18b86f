"""All-pairs 3D-SURF descriptor matching on the MXU.

TPU-native re-design of the reference matcher (match/match.cpp:255-336):
the per-point brute-force loop with AVX descriptor distances becomes a
tiled matrix computation — ``d(a, b) = |a|^2 + |b|^2 - 2 a.b`` with the
cross term as an MXU matmul — and the nearest/second-nearest search
becomes a running top-2 merge over column tiles (flash-attention style:
the full P x P distance matrix is never materialized).

Filters folded into the tile mask, matching match.cpp:

* equal Laplacian sign (:270)
* scale ratio <= 1.3 either way (:273-275)
* optional anatomical gate on pre-transformed positions (:278-291)

Acceptance (:319-330): ``sqrt(d1/d2) < second_ratio || no second`` and
``sqrt(d1) < max_distance``.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..io.keypoints import Keypoints
from ..io.pairs import ImagePoints, PairGraph

__all__ = ["MatchParams", "match_pair", "match_graph"]

_TILE = 512  # column-tile width; multiple of 128 for MXU lanes


@dataclasses.dataclass(frozen=True)
class MatchParams:
    """Defaults follow match.cpp:352-353 (the FROG.py driver overrides
    max_distance to effectively-infinite and relies on the ratio test)."""

    max_distance: float = 0.22
    second_ratio: float = 1.0
    scale_ratio: float = 1.3
    anat_distance: float = 0.0
    symmetric: bool = False
    match_all: bool = False


def _pad_to(x, n, fill=0.0):
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, width, constant_values=fill)


@partial(jax.jit, static_argnames=("use_anat",))
def _top2_kernel(
    desc_b,  # (PB, D) query descriptors
    lapl_b,
    scale_b,
    pos_b,
    valid_b,
    desc_a_tiles,  # (T, TA, D) reference descriptors, column-tiled
    lapl_a_tiles,  # (T, TA)
    scale_a_tiles,
    pos_a_tiles,  # (T, TA, 3)
    valid_a_tiles,
    scale_ratio,
    anat_distance,
    use_anat,
):
    """Running top-2 nearest (masked) descriptor distances of every B point
    over all A column tiles.  Returns (d1, d2, idx1) per B point."""
    pb = desc_b.shape[0]
    ta = desc_a_tiles.shape[1]
    norm_b = jnp.sum(desc_b * desc_b, axis=1)
    inf = jnp.float32(np.inf)

    def body(carry, tile):
        d1, d2, idx1 = carry
        desc_a, lapl_a, scale_a, pos_a, valid_a, base = tile
        norm_a = jnp.sum(desc_a * desc_a, axis=1)
        # MXU cross term in f32 (HIGHEST avoids bf16 quantization of the
        # ratio test near its threshold).
        cross = jax.lax.dot_general(
            desc_b,
            desc_a,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d = norm_b[:, None] + norm_a[None, :] - 2.0 * cross
        d = jnp.maximum(d, 0.0)

        mask = valid_a[None, :]
        mask &= lapl_b[:, None] == lapl_a[None, :]
        sr = scale_b[:, None] / scale_a[None, :]
        mask &= (sr <= scale_ratio) & (sr >= 1.0 / scale_ratio)
        if use_anat:
            diff = pos_b[:, None, :] - pos_a[None, :, :]
            an = jnp.sum(diff * diff, axis=-1)
            mask &= an <= anat_distance * anat_distance
        d = jnp.where(mask, d, inf)

        t1 = jnp.min(d, axis=1)
        ta_idx = jnp.argmin(d, axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (pb, ta), 1)
        d_wo = jnp.where(cols == ta_idx[:, None], inf, d)
        t2 = jnp.min(d_wo, axis=1)

        # Merge (t1, t2) into carry (d1, d2).
        new_d1 = jnp.minimum(d1, t1)
        new_idx1 = jnp.where(t1 < d1, base + ta_idx, idx1)
        new_d2 = jnp.minimum(jnp.maximum(d1, t1), jnp.minimum(d2, t2))
        return (new_d1, new_d2, new_idx1), None

    t = desc_a_tiles.shape[0]
    bases = jnp.arange(t, dtype=jnp.int32) * ta
    init = (
        jnp.full((pb,), inf),
        jnp.full((pb,), inf),
        jnp.zeros((pb,), jnp.int32),
    )
    (d1, d2, idx1), _ = jax.lax.scan(
        body,
        init,
        (desc_a_tiles, lapl_a_tiles, scale_a_tiles, pos_a_tiles, valid_a_tiles, bases),
    )
    return d1, d2, idx1


def _prep(kp: Keypoints, pos: np.ndarray | None, pad: int):
    return dict(
        desc=jnp.asarray(_pad_to(kp.desc.astype(np.float32), pad)),
        lapl=jnp.asarray(_pad_to(kp.laplacian.astype(np.float32), pad)),
        scale=jnp.asarray(_pad_to(kp.scale.astype(np.float32), pad, fill=1.0)),
        pos=jnp.asarray(
            _pad_to((pos if pos is not None else kp.xyz).astype(np.float32), pad)
        ),
        valid=jnp.asarray(np.arange(pad) < len(kp)),
    )


def match_pair(
    kp_a: Keypoints,
    kp_b: Keypoints,
    params: MatchParams = MatchParams(),
    pos_a: np.ndarray | None = None,
    pos_b: np.ndarray | None = None,
) -> np.ndarray:
    """Match image B's points against image A (the reference direction for
    a pair (A, B): loop over B, nearest in A — match.cpp:642).

    Returns an (M, 2) int array of (index in A, index in B).
    """
    pad_a = max(_TILE, ((len(kp_a) + _TILE - 1) // _TILE) * _TILE)
    pad_b = max(8, ((len(kp_b) + 7) // 8) * 8)
    a = _prep(kp_a, pos_a, pad_a)
    b = _prep(kp_b, pos_b, pad_b)
    t = pad_a // _TILE

    d1, d2, idx1 = _top2_kernel(
        b["desc"],
        b["lapl"],
        b["scale"],
        b["pos"],
        b["valid"],
        a["desc"].reshape(t, _TILE, -1),
        a["lapl"].reshape(t, _TILE),
        a["scale"].reshape(t, _TILE),
        a["pos"].reshape(t, _TILE, 3),
        a["valid"].reshape(t, _TILE),
        jnp.float32(params.scale_ratio),
        jnp.float32(params.anat_distance),
        params.anat_distance > 0,
    )
    d1 = np.asarray(d1)
    d2 = np.asarray(d2)
    idx1 = np.asarray(idx1)
    valid_b = np.arange(pad_b) < len(kp_b)

    with np.errstate(invalid="ignore", divide="ignore"):
        ratio_ok = np.where(
            np.isinf(d2), True, np.sqrt(d1 / np.maximum(d2, 1e-30)) < params.second_ratio
        )
    accept = valid_b & np.isfinite(d1) & ratio_ok
    accept &= np.sqrt(np.maximum(d1, 0)) < params.max_distance
    rows = np.flatnonzero(accept)
    return np.stack([idx1[rows], rows], axis=1).astype(np.int64)


def match_all_pair(
    kp_a: Keypoints,
    kp_b: Keypoints,
    params: MatchParams,
    pos_a=None,
    pos_b=None,
) -> np.ndarray:
    """-all mode: every (a, b) combination with distance below threshold
    (match.cpp:295-300).  Computed tile by tile; suited to small P."""
    a = kp_a
    bmat = kp_b
    da = a.desc.astype(np.float32)
    db = bmat.desc.astype(np.float32)
    d = (
        np.sum(db * db, axis=1)[:, None]
        + np.sum(da * da, axis=1)[None, :]
        - 2.0 * db @ da.T
    )
    mask = bmat.laplacian[:, None] == a.laplacian[None, :]
    sr = bmat.scale[:, None] / a.scale[None, :]
    mask &= (sr <= params.scale_ratio) & (sr >= 1.0 / params.scale_ratio)
    if params.anat_distance > 0:
        pa = pos_a if pos_a is not None else a.xyz
        pb = pos_b if pos_b is not None else bmat.xyz
        an = np.linalg.norm(pb[:, None, :] - pa[None, :, :], axis=-1)
        mask &= an <= params.anat_distance
    mask &= np.sqrt(np.maximum(d, 0)) < params.max_distance
    rows, cols = np.nonzero(mask)
    return np.stack([cols, rows], axis=1).astype(np.int64)


def match_graph(
    keypoints: list,
    params: MatchParams = MatchParams(),
    names: list | None = None,
    target: int | None = None,
    ref_translations: np.ndarray | None = None,
    positions: list | None = None,
    progress: bool = False,
) -> PairGraph:
    """Build the full match graph over a list of Keypoints.

    ``target`` restricts to pairs (i, target) for register-one-vs-group
    (-targ, match.cpp:617-628).  Returns a PairGraph whose images carry
    (xyz, scale, laplacianSign, response) exactly as match writes them.
    """
    n = len(keypoints)
    pairs: list = []
    if target is not None:
        pairs = [(i, target) for i in range(n) if i != target]
    else:
        pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]

    matcher = match_all_pair if params.match_all else match_pair
    matches = {}
    for i, j in pairs:
        pa = positions[i] if positions else None
        pb = positions[j] if positions else None
        m = matcher(keypoints[i], keypoints[j], params, pos_a=pa, pos_b=pb)
        if params.symmetric:
            rev = matcher(keypoints[j], keypoints[i], params, pos_a=pb, pos_b=pa)
            m = np.concatenate([m, rev[:, ::-1]], axis=0)
        if m.shape[0]:
            matches[(i, j)] = m
        if progress:
            print(f"pair ({i},{j}): {m.shape[0]} matches")

    images = []
    for k, kp in enumerate(keypoints):
        images.append(
            ImagePoints(
                name=(names[k] if names else f"points{k}"),
                ref_translation=(
                    ref_translations[k] if ref_translations is not None else np.zeros(3)
                ),
                xyz=kp.xyz,
                other=np.stack([kp.scale, kp.laplacian, kp.response], axis=1),
            )
        )
    return PairGraph(images=images, matches=matches)
