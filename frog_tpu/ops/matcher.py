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

_TILE = 2048  # column-tile width; multiple of 128 (tuned on v5e)


@dataclasses.dataclass(frozen=True)
class MatchParams:
    """Defaults follow match.cpp:352-353 (the FROG.py driver overrides
    max_distance to effectively-infinite and relies on the ratio test).

    ``fast`` ranks candidates with bf16 MXU distances and rescores the
    top-2 exactly in f32 (~4x faster); set False for strict full-precision
    ranking parity.
    """

    max_distance: float = 0.22
    second_ratio: float = 1.0
    scale_ratio: float = 1.3
    anat_distance: float = 0.0
    symmetric: bool = False
    match_all: bool = False
    fast: bool = True


def _pad_to(x, n, fill=0.0):
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, width, constant_values=fill)


@partial(jax.jit, static_argnames=("use_anat", "fast"))
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
    fast,
):
    """Running top-2 nearest (masked) descriptor distances of every B point
    over all A column tiles.  Returns (d1, d2, idx1, idx2) per B point.

    ``fast`` computes the cross term with bf16 MXU passes (4x fewer MXU
    cycles than the 6-pass f32 mode); the caller then rescores the two
    surviving candidates exactly in f32, so threshold/ratio decisions stay
    full precision as long as the true top-2 survive the approximate
    ranking.
    """
    pb = desc_b.shape[0]
    ta = desc_a_tiles.shape[1]
    norm_b = jnp.sum(desc_b * desc_b, axis=1)
    inf = jnp.float32(np.inf)
    db = desc_b.astype(jnp.bfloat16) if fast else desc_b

    def body(carry, tile):
        d1, d2, idx1, idx2 = carry
        desc_a, lapl_a, scale_a, pos_a, valid_a, base = tile
        norm_a = jnp.sum(desc_a * desc_a, axis=1)
        da = desc_a.astype(jnp.bfloat16) if fast else desc_a
        cross = jax.lax.dot_general(
            db,
            da,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=None if fast else jax.lax.Precision.HIGHEST,
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
        ta_idx2 = jnp.argmin(d_wo, axis=1)
        ti1 = base + ta_idx
        ti2 = base + ta_idx2

        # Index-aware merge of {(d1,i1),(d2,i2)} with {(t1,ti1),(t2,ti2)}.
        first_from_tile = t1 < d1
        new_d1 = jnp.where(first_from_tile, t1, d1)
        new_idx1 = jnp.where(first_from_tile, ti1, idx1)
        # the loser of the first-place contest competes with the winners'
        # runners-up for second place
        cand_d = jnp.where(first_from_tile, d1, t1)
        cand_i = jnp.where(first_from_tile, idx1, ti1)
        runner_d = jnp.where(first_from_tile, t2, d2)
        runner_i = jnp.where(first_from_tile, ti2, idx2)
        second_from_cand = cand_d < runner_d
        new_d2 = jnp.where(second_from_cand, cand_d, runner_d)
        new_idx2 = jnp.where(second_from_cand, cand_i, runner_i)
        return (new_d1, new_d2, new_idx1, new_idx2), None

    t = desc_a_tiles.shape[0]
    bases = jnp.arange(t, dtype=jnp.int32) * ta
    init = (
        jnp.full((pb,), inf),
        jnp.full((pb,), inf),
        jnp.zeros((pb,), jnp.int32),
        jnp.zeros((pb,), jnp.int32),
    )
    (d1, d2, idx1, idx2), _ = jax.lax.scan(
        body,
        init,
        (desc_a_tiles, lapl_a_tiles, scale_a_tiles, pos_a_tiles, valid_a_tiles, bases),
    )
    return d1, d2, idx1, idx2


@jax.jit
def _exact_rescore(desc_b, desc_a, idx1, idx2, d1_approx, d2_approx):
    """Exact f32 distances of each B row to its two surviving candidates.

    Rows whose approximate pass found no first/second candidate (inf)
    keep inf so the acceptance logic treats them exactly as before.
    """
    c1 = desc_a[idx1]
    c2 = desc_a[idx2]
    e1 = jnp.sum((desc_b - c1) ** 2, axis=1)
    e2 = jnp.sum((desc_b - c2) ** 2, axis=1)
    e1 = jnp.where(jnp.isfinite(d1_approx), e1, jnp.inf)
    e2 = jnp.where(jnp.isfinite(d2_approx), e2, jnp.inf)
    swap = e2 < e1
    d1 = jnp.where(swap, e2, e1)
    d2 = jnp.where(swap, e1, e2)
    best = jnp.where(swap, idx2, idx1)
    return d1, d2, best


@jax.jit
def _exact_rescore_gated(
    desc_b, lapl_b, scale_b,
    desc_a, lapl_a, scale_a, valid_a,
    idx1, idx2, d1_approx, d2_approx, scale_ratio,
):
    """Exact f32 rescore of the two finalists PLUS an exact re-check of
    every gate (laplacian sign, scale ratio, A validity) on them.

    Required for the v3 pallas kernel, whose MXU-folded binary gates are
    penalties rather than exclusions: a finalist may be gate-invalid when
    a row has fewer than two valid candidates; this restores the exact
    reference semantics (match.cpp:270-293) on the finalists."""

    def check(idx, d_approx):
        e = jnp.sum((desc_b - desc_a[idx]) ** 2, axis=1)
        sr = scale_b / scale_a[idx]
        ok = (
            jnp.isfinite(d_approx)
            & (lapl_b == lapl_a[idx])
            & (sr <= scale_ratio)
            & (sr * scale_ratio >= 1.0)
            & valid_a[idx]
        )
        return jnp.where(ok, e, jnp.inf)

    e1 = check(idx1, d1_approx)
    e2 = check(idx2, d2_approx)
    swap = e2 < e1
    d1 = jnp.where(swap, e2, e1)
    d2 = jnp.where(swap, e1, e2)
    best = jnp.where(swap, idx2, idx1)
    return d1, d2, best


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

    d1, d2, idx1, idx2 = _top2_kernel(
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
        params.fast,
    )
    if params.fast:
        d1, d2, idx1 = _exact_rescore(b["desc"], a["desc"], idx1, idx2, d1, d2)
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


import functools


@functools.lru_cache(maxsize=None)
def _batched_top2(use_anat: bool, fast: bool):
    def single(db, lb, sb, pb, vb, da, la, sa, pa, va, sr, ad):
        return _top2_kernel(
            db, lb, sb, pb, vb, da, la, sa, pa, va, sr, ad, use_anat, fast
        )

    return jax.jit(jax.vmap(single, in_axes=(0,) * 10 + (None, None)))


_BATCHED_RESCORE = jax.jit(jax.vmap(_exact_rescore))
_BATCHED_RESCORE_GATED = jax.jit(
    jax.vmap(_exact_rescore_gated, in_axes=(0,) * 11 + (None,))
)
_PAIR_CHUNK = 14  # pairs per device dispatch (tuned on v5e)

_PALLAS_STATE = {"checked": False, "ok": False}


def _pallas_available() -> bool:
    """Probe once whether the Pallas matcher kernel compiles and runs on
    this backend (45x faster than the XLA scan on v5e); fall back
    silently otherwise."""
    if _PALLAS_STATE["checked"]:
        return _PALLAS_STATE["ok"]
    _PALLAS_STATE["checked"] = True
    try:
        from . import pallas_matcher as pm

        if not pm.HAVE_PALLAS:
            raise RuntimeError("no pallas")
        import jax as _jax

        if _jax.default_backend() == "cpu":
            raise RuntimeError("cpu backend: use XLA path")
        q = jnp.zeros((512, 56), jnp.bfloat16)
        r = jnp.zeros((1024, 56), jnp.bfloat16)
        out = pm.pallas_top2_v3(
            q, jnp.zeros((512,), jnp.float32), r,
            jnp.zeros((1024,), jnp.float32),
            jnp.asarray([[1.3]], jnp.float32),
        )
        _jax.block_until_ready(out)
        _PALLAS_STATE["ok"] = True
    except Exception:
        _PALLAS_STATE["ok"] = False
    return _PALLAS_STATE["ok"]


@jax.jit
def _jit_prep_aug(desc, lapl, scale, valid):
    """Per-image v3 matcher rows (query/reference bf16 + log-scale), one
    fused dispatch over the stacked image axis."""
    from . import pallas_matcher as pm

    return jax.vmap(pm.prep_aug)(lapl, scale, valid, desc)


@jax.jit
def _pallas_chunk_top2(q_b, ls_b, r_a, ls_a, scale_ratio):
    from . import pallas_matcher as pm

    return jax.vmap(
        lambda qb, lb, ra, la: pm.pallas_top2_v3(qb, lb, ra, la, scale_ratio)
    )(q_b, ls_b, r_a, ls_a)


def stage_keypoints_device(kp, pad):
    """Host-pad ONE image's matcher fields and start their device upload.

    Called from the reader thread pool (pipeline.match_stage) as soon as a
    keypoint file is read and pruned, so the ~90 MB of host->device
    transfers overlap the remaining file reads instead of serializing
    after them.  ``pad`` must be a _TILE multiple >= the point count — the
    caller predicts it from the extraction budget (same prediction as
    warm_matcher, so the compiled shapes match)."""
    return {
        "desc": jnp.asarray(_pad_to(kp.desc.astype(np.float32), pad)),
        "lapl": jnp.asarray(_pad_to(kp.laplacian.astype(np.float32), pad)),
        "scale": jnp.asarray(
            _pad_to(kp.scale.astype(np.float32), pad, fill=1.0)
        ),
        "pos": jnp.asarray(_pad_to(kp.xyz.astype(np.float32), pad)),
        "valid": jnp.asarray(np.arange(pad) < len(kp)),
    }


def _match_pairs_batched(keypoints, pairs, params, positions, mesh=None,
                         staged=None):
    """Evaluate many (A, B) pairs per device dispatch: all images are
    padded to one common point count and the top-2 kernel is vmapped over
    a chunk of pairs — amortizing dispatch/sync cost, which dominates on
    remote-attached TPUs.

    Results ACCUMULATE ON DEVICE across the whole pair list (bit-packed
    accept mask + narrow winner indices) and cross back to the host in ONE
    readback at the end: on a remote-attached TPU the per-chunk readback
    (~0.2 MB/s + an RTT per sync) costs far more than the matching itself.

    With ``mesh``, the pair-chunk axis is sharded across the mesh devices
    (keypoint stacks replicated) — the in-process multi-device analog of
    the reference's all-cores OpenMP pair loop (match.cpp:638-652); a
    single-host multi-chip slice then matches on every chip without
    multi-process setup.
    """
    n_max = max(len(kp) for kp in keypoints)
    if (
        staged is not None
        and positions is None
        and all(s is not None for s in staged)
        and staged[0]["desc"].shape[0] >= n_max
    ):
        # per-image fields already uploaded from the reader threads
        # (stage_keypoints_device): finish with one on-device stack each
        pad = staged[0]["desc"].shape[0]
        stacked = {
            k: jnp.stack([s[k] for s in staged])
            for k in ("desc", "lapl", "scale", "pos", "valid")
        }
    else:
        pad = max(_TILE, ((n_max + _TILE - 1) // _TILE) * _TILE)
        # Stack on the host and ship ONE buffer per field (a handful of
        # large transfers instead of 5 x N small ones + an on-device stack).
        if positions:
            pos_src = [
                positions[i] if positions[i] is not None else kp.xyz
                for i, kp in enumerate(keypoints)
            ]
        else:
            pos_src = [kp.xyz for kp in keypoints]
        stacked = {
            "desc": jnp.asarray(
                np.stack(
                    [_pad_to(kp.desc.astype(np.float32), pad) for kp in keypoints]
                )
            ),
            "lapl": jnp.asarray(
                np.stack(
                    [
                        _pad_to(kp.laplacian.astype(np.float32), pad)
                        for kp in keypoints
                    ]
                )
            ),
            "scale": jnp.asarray(
                np.stack(
                    [
                        _pad_to(kp.scale.astype(np.float32), pad, fill=1.0)
                        for kp in keypoints
                    ]
                )
            ),
            "pos": jnp.asarray(
                np.stack([_pad_to(p.astype(np.float32), pad) for p in pos_src])
            ),
            "valid": jnp.asarray(
                np.stack([np.arange(pad) < len(kp) for kp in keypoints])
            ),
        }
    use_pallas = (
        params.fast and params.anat_distance == 0 and _pallas_available()
    )
    if use_pallas:
        stacked["q_aug"], stacked["r_aug"], stacked["ls"] = _jit_prep_aug(
            stacked["desc"], stacked["lapl"], stacked["scale"], stacked["valid"]
        )
    if mesh is not None and pairs:
        return _match_pairs_mesh(
            stacked, keypoints, pairs, params, mesh, use_pallas, pad
        )
    t = pad // _TILE
    results = {}
    acc_chunks: list = []
    idx_chunks: list = []
    chunk_meta: list = []
    chunk_pad: list = []
    for start in range(0, len(pairs), _PAIR_CHUNK):
        chunk = pairs[start : start + _PAIR_CHUNK]
        real = len(chunk)
        # pad to the fixed chunk size so one compiled shape serves every
        # dispatch (duplicated work on the tail is negligible)
        while len(chunk) < _PAIR_CHUNK:
            chunk = chunk + [chunk[-1]]
        ia = jnp.asarray([c[0] for c in chunk])
        ib = jnp.asarray([c[1] for c in chunk])
        c = len(chunk)
        if use_pallas:
            d1, d2, idx1, idx2 = _pallas_chunk_top2(
                stacked["q_aug"][ib],
                stacked["ls"][ib],
                stacked["r_aug"][ia],
                stacked["ls"][ia],
                jnp.asarray([[params.scale_ratio]], jnp.float32),
            )
        else:
            kernel = _batched_top2(params.anat_distance > 0, params.fast)
            d1, d2, idx1, idx2 = kernel(
                stacked["desc"][ib],
                stacked["lapl"][ib],
                stacked["scale"][ib],
                stacked["pos"][ib],
                stacked["valid"][ib],
                stacked["desc"][ia].reshape(c, t, _TILE, -1),
                stacked["lapl"][ia].reshape(c, t, _TILE),
                stacked["scale"][ia].reshape(c, t, _TILE),
                stacked["pos"][ia].reshape(c, t, _TILE, 3),
                stacked["valid"][ia].reshape(c, t, _TILE),
                jnp.float32(params.scale_ratio),
                jnp.float32(params.anat_distance),
            )
        if params.fast:
            d1, d2, idx1 = _BATCHED_RESCORE_GATED(
                stacked["desc"][ib], stacked["lapl"][ib], stacked["scale"][ib],
                stacked["desc"][ia], stacked["lapl"][ia], stacked["scale"][ia],
                stacked["valid"][ia],
                idx1, idx2, d1, d2, jnp.float32(params.scale_ratio),
            )
        # acceptance on device: a bit-packed mask + narrow winner indices
        # are appended to the on-device accumulator (no sync here)
        acc_bits, idx_narrow = _accept_device(
            d1,
            d2,
            idx1,
            jnp.float32(params.max_distance),
            jnp.float32(params.second_ratio),
            pad < 32768,
        )
        acc_chunks.append(acc_bits)
        idx_chunks.append(idx_narrow)
        chunk_meta.extend((chunk[k][0], chunk[k][1]) for k in range(real))
        chunk_pad.append(_PAIR_CHUNK - real)

    if not acc_chunks:
        return results
    # ONE device->host readback for the entire pair list
    acc_all = np.asarray(jnp.concatenate(acc_chunks))
    idx_all = np.asarray(jnp.concatenate(idx_chunks)).astype(np.int64)
    keep = np.ones(acc_all.shape[0], bool)
    pos = 0
    for pad_k in chunk_pad:
        pos += _PAIR_CHUNK
        if pad_k:
            keep[pos - pad_k : pos] = False
    acc_all = np.unpackbits(acc_all[keep], axis=-1, bitorder="little")
    idx_all = idx_all[keep]
    for k, (i, j) in enumerate(chunk_meta):
        nb = len(keypoints[j])
        rows = np.flatnonzero(acc_all[k][:nb])
        results[(i, j)] = np.stack([idx_all[k][rows], rows], axis=1).astype(
            np.int64
        )
    return results


def _match_pairs_mesh(stacked, keypoints, pairs, params, mesh, use_pallas,
                      pad):
    """Shard the pair-chunk axis over the mesh: ONE dispatch evaluates the
    whole pair list, each device scanning its slice of chunks against the
    replicated keypoint stacks.  Output layout matches the single-device
    accumulator (chunk-flattened accept bits + winner indices)."""
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
        _replication_kwarg = "check_vma"
    except ImportError:  # older jax: experimental API spells the flag check_rep
        from jax.experimental.shard_map import shard_map
        _replication_kwarg = "check_rep"

    axis = mesh.axis_names[0]
    d = mesh.devices.size
    c = _PAIR_CHUNK
    n_chunks = -(-len(pairs) // c)
    n_chunks_pad = -(-n_chunks // d) * d
    flat = list(pairs) + [pairs[-1]] * (n_chunks_pad * c - len(pairs))
    ia = np.asarray([p[0] for p in flat], np.int32).reshape(n_chunks_pad, c)
    ib = np.asarray([p[1] for p in flat], np.int32).reshape(n_chunks_pad, c)
    t = pad // _TILE
    narrow = pad < 32768
    sr = jnp.float32(params.scale_ratio)
    ad = jnp.float32(params.anat_distance)
    md = jnp.float32(params.max_distance)
    rr = jnp.float32(params.second_ratio)

    if use_pallas:
        fields = ("q_aug", "r_aug", "ls", "desc", "lapl", "scale", "valid")
    else:
        fields = ("desc", "lapl", "scale", "pos", "valid")
    reps = tuple(stacked[f] for f in fields)

    def local(ia_l, ib_l, *reps):
        s = dict(zip(fields, reps))

        def one(idx):
            ia_c, ib_c = idx
            if use_pallas:
                d1, d2, i1, i2 = _pallas_chunk_top2(
                    s["q_aug"][ib_c], s["ls"][ib_c],
                    s["r_aug"][ia_c], s["ls"][ia_c],
                    jnp.asarray([[params.scale_ratio]], jnp.float32),
                )
            else:
                kernel = _batched_top2(params.anat_distance > 0, params.fast)
                d1, d2, i1, i2 = kernel(
                    s["desc"][ib_c], s["lapl"][ib_c], s["scale"][ib_c],
                    s["pos"][ib_c], s["valid"][ib_c],
                    s["desc"][ia_c].reshape(c, t, _TILE, -1),
                    s["lapl"][ia_c].reshape(c, t, _TILE),
                    s["scale"][ia_c].reshape(c, t, _TILE),
                    s["pos"][ia_c].reshape(c, t, _TILE, 3),
                    s["valid"][ia_c].reshape(c, t, _TILE),
                    sr, ad,
                )
            if params.fast:
                d1, d2, i1 = _BATCHED_RESCORE_GATED(
                    s["desc"][ib_c], s["lapl"][ib_c], s["scale"][ib_c],
                    s["desc"][ia_c], s["lapl"][ia_c], s["scale"][ia_c],
                    s["valid"][ia_c], i1, i2, d1, d2, sr,
                )
            return _accept_device(d1, d2, i1, md, rr, narrow)

        return jax.lax.map(one, (ia_l, ib_l))

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)) + (P(),) * len(reps),
        out_specs=(P(axis), P(axis)),
        **{_replication_kwarg: False},
    )
    bits, idxn = fn(jnp.asarray(ia), jnp.asarray(ib), *reps)
    acc_all = np.unpackbits(
        np.asarray(bits).reshape(n_chunks_pad * c, -1), axis=-1,
        bitorder="little",
    )
    idx_all = np.asarray(idxn).reshape(n_chunks_pad * c, -1).astype(np.int64)
    results = {}
    for k, (i, j) in enumerate(pairs):
        nb = len(keypoints[j])
        rows = np.flatnonzero(acc_all[k][:nb])
        results[(i, j)] = np.stack(
            [idx_all[k][rows], rows], axis=1
        ).astype(np.int64)
    return results


@partial(jax.jit, static_argnames=("narrow",))
def _accept_device(d1, d2, idx1, max_distance, second_ratio, narrow=False):
    """Threshold + second-ratio acceptance on device (match.cpp:319-330).

    Returns the mask bit-packed (uint8, little bit order — np.unpackbits
    compatible) and the winner indices as int16 when ``narrow`` (point pad
    < 32768) — 3.4x fewer bytes over the slow device->host tunnel.
    """
    ratio_ok = jnp.where(
        jnp.isinf(d2),
        True,
        jnp.sqrt(d1 / jnp.maximum(d2, 1e-30)) < second_ratio,
    )
    acc = jnp.isfinite(d1) & ratio_ok
    acc &= jnp.sqrt(jnp.maximum(d1, 0.0)) < max_distance
    weights = (1 << jnp.arange(8, dtype=jnp.int32))[None, None, :]
    bits = jnp.sum(
        acc.reshape(*acc.shape[:-1], -1, 8).astype(jnp.int32) * weights, axis=-1
    ).astype(jnp.uint8)
    return bits, (idx1.astype(jnp.int16) if narrow else idx1)


def _accept(d1, d2, idx1, params):
    """Threshold + second-ratio acceptance (match.cpp:319-330)."""
    with np.errstate(invalid="ignore", divide="ignore"):
        ratio_ok = np.where(
            np.isinf(d2),
            True,
            np.sqrt(d1 / np.maximum(d2, 1e-30)) < params.second_ratio,
        )
    accept = np.isfinite(d1) & ratio_ok
    accept &= np.sqrt(np.maximum(d1, 0)) < params.max_distance
    rows = np.flatnonzero(accept)
    return np.stack([idx1[rows], rows], axis=1).astype(np.int64)


def match_graph(
    keypoints: list,
    params: MatchParams = MatchParams(),
    names: list | None = None,
    target: int | None = None,
    ref_translations: np.ndarray | None = None,
    positions: list | None = None,
    pairs: list | None = None,
    progress: bool = False,
    mesh=None,
    staged=None,
) -> PairGraph:
    """Build the full match graph over a list of Keypoints.

    ``target`` restricts to pairs (i, target) for register-one-vs-group
    (-targ, match.cpp:617-628).  ``pairs`` restricts to an explicit pair
    subset (multi-process pair partitioning, parallel.distributed).
    ``mesh`` shards the pair list across local devices in-process
    (match.cpp:638-652's all-cores loop, per chip instead of per core).
    Returns a PairGraph whose images carry (xyz, scale, laplacianSign,
    response) exactly as match writes them.
    """
    n = len(keypoints)
    if pairs is None:
        if target is not None:
            pairs = [(i, target) for i in range(n) if i != target]
        else:
            pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]

    matches = {}
    if params.match_all:
        for i, j in pairs:
            pa = positions[i] if positions else None
            pb = positions[j] if positions else None
            m = match_all_pair(keypoints[i], keypoints[j], params, pos_a=pa, pos_b=pb)
            if params.symmetric:
                rev = match_all_pair(
                    keypoints[j], keypoints[i], params, pos_a=pb, pos_b=pa
                )
                m = np.concatenate([m, rev[:, ::-1]], axis=0)
            if m.shape[0]:
                matches[(i, j)] = m
            if progress:
                print(f"pair ({i},{j}): {m.shape[0]} matches")
    else:
        fwd = _match_pairs_batched(keypoints, pairs, params, positions,
                                   mesh=mesh, staged=staged)
        rev = (
            _match_pairs_batched(
                keypoints, [(j, i) for i, j in pairs], params, positions,
                mesh=mesh, staged=staged,
            )
            if params.symmetric
            else {}
        )
        for i, j in pairs:
            m = fwd[(i, j)]
            if params.symmetric:
                m = np.concatenate([m, rev[(j, i)][:, ::-1]], axis=0)
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


def warm_matcher(n_points: int, scale_ratio: float = 1.3):
    """Background-compile the matching executables at the shapes the real
    pair sweep will use (utils/aot.py): the point pad is predictable from
    the extraction budget (counts cap at n_points and pad to _TILE), so
    the pallas kernel + rescore + accept chain compiles while extraction
    still runs on the volumes — the ~20 s/executable remote-service
    compiles vanish from the cold path.  A mispredicted pad is harmless
    (the real shapes compile inline as before)."""
    from ..utils import aot

    if jax.default_backend() == "cpu":
        return None  # warming targets the remote-compile TPU path
    pad = max(_TILE, ((n_points + _TILE - 1) // _TILE) * _TILE)
    c = _PAIR_CHUNK

    def task():
        desc = jnp.zeros((c, pad, 48), jnp.float32)
        lapl = jnp.ones((c, pad), jnp.float32)
        scale = jnp.ones((c, pad), jnp.float32)
        valid = jnp.ones((c, pad), bool)
        if _pallas_available():
            q, r, ls = _jit_prep_aug(desc, lapl, scale, valid)
            d1, d2, i1, i2 = _pallas_chunk_top2(
                q, ls, r, ls, jnp.asarray([[scale_ratio]], jnp.float32),
            )
            d1, d2, i1 = _BATCHED_RESCORE_GATED(
                desc, lapl, scale, desc, lapl, scale, valid,
                i1, i2, d1, d2, jnp.float32(scale_ratio),
            )
            _accept_device(
                d1, d2, i1, jnp.float32(1.0), jnp.float32(0.9), pad < 32768
            )

    return aot.warm(task, key=("warm_matcher", pad, scale_ratio))
