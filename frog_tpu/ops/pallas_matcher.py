"""Pallas TPU kernel for descriptor matching.

One fused kernel computes, for every query point of image B, the masked
nearest and second-nearest descriptor distances over image A — the hot
loop of the matcher (match/match.cpp:255-336) — with the distance tile,
masks, and the running top-2 merge all resident in VMEM.  Compared to the
XLA scan formulation this removes the HBM round trips of the per-tile
distance matrix and the 5 separate VPU passes over it.

Layout: grid (B-row blocks, A-column tiles); the A dimension iterates
innermost and accumulates into the per-row-block output refs (classic
revisiting-accumulator pattern).  Descriptors are consumed in bf16 (the
caller rescores the two finalists exactly in f32).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU-only in practice; import guarded for CPU test envs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

_BB = 256  # B rows per block
_TA = 512  # A columns per tile
_BIG = 3.0e38  # plain float: a jnp scalar here would be a captured const


def _kernel(
    desc_b_ref,  # (BB, D) bf16
    meta_b_ref,  # (BB, 4) f32: lapl, scale, valid, norm
    desc_a_ref,  # (TA, D) bf16
    meta_a_ref,  # (TA, 4) f32
    scale_ratio_ref,  # (1, 1) f32 in SMEM
    d1_ref,  # (BB, 1) f32 out
    d2_ref,  # (BB, 1) f32 out
    i1_ref,  # (BB, 1) i32 out
    i2_ref,  # (BB, 1) i32 out
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        d1_ref[:] = jnp.full_like(d1_ref, _BIG)
        d2_ref[:] = jnp.full_like(d2_ref, _BIG)
        i1_ref[:] = jnp.zeros_like(i1_ref)
        i2_ref[:] = jnp.zeros_like(i2_ref)

    db = desc_b_ref[:]
    da = desc_a_ref[:]
    cross = jax.lax.dot_general(
        db,
        da,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    norm_b = meta_b_ref[:, 3:4]  # (BB, 1)
    norm_a = meta_a_ref[:, 3]  # (TA,)
    d = jnp.maximum(norm_b + norm_a[None, :] - 2.0 * cross, 0.0)

    lapl_ok = meta_b_ref[:, 0:1] == meta_a_ref[:, 0][None, :]
    sr = meta_b_ref[:, 1:2] / meta_a_ref[:, 1][None, :]
    ratio = scale_ratio_ref[0, 0]
    scale_ok = (sr <= ratio) & (sr * ratio >= 1.0)
    valid = meta_a_ref[:, 2][None, :] > 0
    mask = lapl_ok & scale_ok & valid
    d = jnp.where(mask, d, _BIG)

    bb, ta = d.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (bb, ta), 1)
    t1 = jnp.min(d, axis=1, keepdims=True)  # (BB, 1)
    # lowest column index achieving the min (argmin emulation)
    ti1 = jnp.min(jnp.where(d == t1, cols, jnp.int32(2**30)), axis=1, keepdims=True)
    d_wo = jnp.where(cols == ti1, _BIG, d)
    t2 = jnp.min(d_wo, axis=1, keepdims=True)
    ti2 = jnp.min(
        jnp.where(d_wo == t2, cols, jnp.int32(2**30)), axis=1, keepdims=True
    )
    base = j * ta
    ti1 = jnp.where(t1 < _BIG, ti1 + base, 0)
    ti2 = jnp.where(t2 < _BIG, ti2 + base, 0)

    d1 = d1_ref[:]
    d2 = d2_ref[:]
    i1 = i1_ref[:]
    i2 = i2_ref[:]
    first_new = t1 < d1
    nd1 = jnp.where(first_new, t1, d1)
    ni1 = jnp.where(first_new, ti1, i1)
    cand_d = jnp.where(first_new, d1, t1)
    cand_i = jnp.where(first_new, i1, ti1)
    run_d = jnp.where(first_new, t2, d2)
    run_i = jnp.where(first_new, ti2, i2)
    second_cand = cand_d < run_d
    nd2 = jnp.where(second_cand, cand_d, run_d)
    ni2 = jnp.where(second_cand, cand_i, run_i)

    d1_ref[:] = nd1
    d2_ref[:] = nd2
    i1_ref[:] = ni1
    i2_ref[:] = ni2


@partial(jax.jit, static_argnames=("interpret",))
def pallas_top2(desc_b, meta_b, desc_a, meta_a, scale_ratio, interpret=False):
    """(PB, D) queries vs (PA, D) references -> (d1, d2, i1, i2) each (PB,).

    desc_* are bf16; meta_* are (P, 4) f32 rows (lapl, scale, valid, |d|^2).
    """
    pb = desc_b.shape[0]
    pa = desc_a.shape[0]
    dd = desc_b.shape[1]
    grid = (pb // _BB, pa // _TA)

    out_shape = [
        jax.ShapeDtypeStruct((pb, 1), jnp.float32),
        jax.ShapeDtypeStruct((pb, 1), jnp.float32),
        jax.ShapeDtypeStruct((pb, 1), jnp.int32),
        jax.ShapeDtypeStruct((pb, 1), jnp.int32),
    ]
    row_spec = pl.BlockSpec((_BB, 1), lambda i, j: (i, 0))
    d1, d2, i1, i2 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BB, dd), lambda i, j: (i, 0)),
            pl.BlockSpec((_BB, 4), lambda i, j: (i, 0)),
            pl.BlockSpec((_TA, dd), lambda i, j: (j, 0)),
            pl.BlockSpec((_TA, 4), lambda i, j: (j, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[row_spec, row_spec, row_spec, row_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(desc_b, meta_b, desc_a, meta_a, scale_ratio)
    big = jnp.float32(1e38)
    d1 = d1[:, 0]
    d2 = d2[:, 0]
    inf = jnp.float32(np.inf)
    return (
        jnp.where(d1 < big, d1, inf),
        jnp.where(d2 < big, d2, inf),
        i1[:, 0],
        i2[:, 0],
    )


def prep_meta(lapl, scale, valid, desc_f32):
    norm = jnp.sum(desc_f32 * desc_f32, axis=1)
    return jnp.stack(
        [lapl, scale, valid.astype(jnp.float32), norm], axis=1
    ).astype(jnp.float32)


# --------------------------------------------------------------------- v2
#
# Same contract as pallas_top2 but ~2x fewer VPU passes per tile:
#
# * ONE fused gate: ls = log(scale) + 2000*(lapl > 0) + 1e9*(~valid), so
#   |ls_b - ls_a| <= log(scale_ratio) simultaneously enforces the scale
#   ratio, equal laplacian sign, and A-validity — replacing the v1
#   division + two compares + three mask ANDs with a subtract/abs/compare.
# * Top-2 via PACKED KEYS: distances are >= 0, so their IEEE-754 bit
#   patterns are order-isomorphic; key = (bitcast(d) & ~1023) | column
#   carries the candidate's in-tile column in the 10 low mantissa bits.
#   One min-reduce finds the best (distance, index) pair at once; masking
#   the winner key and reducing again gives the second.  Ranking
#   resolution is 2^-13 relative — candidates closer than that may swap,
#   which the caller's exact f32 rescore absorbs (it re-sorts the two
#   finalists).
#
# Measured on a v5e at 20224x20224x48: 19.4 ms (v1) -> see BENCHMARKS.md.

_BB2 = 512  # B rows per block
_TA2 = 1024  # A columns per tile (10 index bits in the packed key)
_LAPL_OFFSET = 2000.0  # >> any |log scale| difference
_INVALID = 1.0e9
_KEY_MASK = ~(_TA2 - 1)  # plain int: no jnp constants at import time


def _kernel_v2(
    desc_b_ref,  # (BB2, D) bf16
    ls_b_ref,  # (BB2, 1) f32: fused gate channel
    nb_ref,  # (BB2, 1) f32: |desc_b|^2
    desc_a_ref,  # (TA2, D) bf16
    meta_a_ref,  # (8, TA2) f32: row 0 = gate channel, row 1 = |desc_a|^2
    tau_ref,  # (1, 1) f32 in SMEM: log(scale_ratio)
    k1_ref,  # (BB2, 1) i32 out: packed best key
    k2_ref,  # (BB2, 1) i32 out
    t1_ref,  # (BB2, 1) i32 out: tile id of best
    t2_ref,  # (BB2, 1) i32 out
):
    j = pl.program_id(1)
    imax = jnp.int32(2**31 - 1)

    @pl.when(j == 0)
    def _():
        k1_ref[:] = jnp.full_like(k1_ref, imax)
        k2_ref[:] = jnp.full_like(k2_ref, imax)
        t1_ref[:] = jnp.zeros_like(t1_ref)
        t2_ref[:] = jnp.zeros_like(t2_ref)

    cross = jax.lax.dot_general(
        desc_b_ref[:],
        desc_a_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = jnp.maximum(nb_ref[:] + meta_a_ref[1, :][None, :] - 2.0 * cross, 0.0)
    gate = (
        jnp.abs(ls_b_ref[:] - meta_a_ref[0, :][None, :]) <= tau_ref[0, 0]
    )
    d = jnp.where(gate, d, _BIG)

    bb, ta = d.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (bb, ta), 1)
    key = (jax.lax.bitcast_convert_type(d, jnp.int32) & _KEY_MASK) | cols
    t1 = jnp.min(key, axis=1, keepdims=True)  # (BB2, 1)
    key2 = jnp.where(key == t1, imax, key)
    t2 = jnp.min(key2, axis=1, keepdims=True)

    # merge (key, tile) pairs into the running top-2
    k1, k2 = k1_ref[:], k2_ref[:]
    i1, i2 = t1_ref[:], t2_ref[:]
    first_new = t1 < k1
    nk1 = jnp.where(first_new, t1, k1)
    ni1 = jnp.where(first_new, j, i1)
    cand_k = jnp.where(first_new, k1, t1)
    cand_t = jnp.where(first_new, i1, jnp.full_like(i1, j))
    run_better = t2 < k2
    run_k = jnp.where(run_better & first_new, t2, k2)
    run_t = jnp.where(run_better & first_new, j, i2)
    second_new = cand_k < run_k
    k1_ref[:] = nk1
    t1_ref[:] = ni1
    k2_ref[:] = jnp.where(second_new, cand_k, run_k)
    t2_ref[:] = jnp.where(second_new, cand_t, run_t)


@partial(jax.jit, static_argnames=("interpret",))
def pallas_top2_v2(desc_b, meta_b, desc_a, meta_a, scale_ratio, interpret=False):
    """(PB, D) queries vs (PA, D) references -> (d1, d2, i1, i2), each
    (PB,), like pallas_top2 — d1/d2 are key-quantized (2^-13 relative)
    surrogates whose only downstream use is the isfinite "found" flags;
    the caller's exact rescore recomputes the distances.

    desc_* are bf16; meta_* are prep_meta rows (lapl, scale, valid, |d|^2).
    """
    pb, dd = desc_b.shape
    pa = desc_a.shape[0]
    grid = (pb // _BB2, pa // _TA2)

    # fused gate channel (see module comment)
    def gate_channel(meta):
        return (
            jnp.log(jnp.maximum(meta[:, 1], 1e-30))
            + jnp.where(meta[:, 0] > 0, _LAPL_OFFSET, 0.0)
            + jnp.where(meta[:, 2] > 0, 0.0, _INVALID)
        )

    ls_b = gate_channel(meta_b)[:, None]
    nb = meta_b[:, 3][:, None]
    meta_a2 = jnp.zeros((8, pa), jnp.float32)
    meta_a2 = meta_a2.at[0].set(gate_channel(meta_a))
    meta_a2 = meta_a2.at[1].set(meta_a[:, 3])
    tau = jnp.log(scale_ratio.reshape(1, 1))

    row_spec = pl.BlockSpec((_BB2, 1), lambda i, j: (i, 0))
    k1, k2, t1, t2 = pl.pallas_call(
        _kernel_v2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BB2, dd), lambda i, j: (i, 0)),
            pl.BlockSpec((_BB2, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((_BB2, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((_TA2, dd), lambda i, j: (j, 0)),
            pl.BlockSpec((8, _TA2), lambda i, j: (0, j)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[row_spec, row_spec, row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((pb, 1), jnp.int32),
            jax.ShapeDtypeStruct((pb, 1), jnp.int32),
            jax.ShapeDtypeStruct((pb, 1), jnp.int32),
            jax.ShapeDtypeStruct((pb, 1), jnp.int32),
        ],
        interpret=interpret,
    )(desc_b.astype(jnp.bfloat16), ls_b, nb, desc_a.astype(jnp.bfloat16),
      meta_a2, tau)

    k1, k2, t1, t2 = k1[:, 0], k2[:, 0], t1[:, 0], t2[:, 0]
    huge = jax.lax.bitcast_convert_type(jnp.float32(1e30), jnp.int32)
    inf = jnp.float32(np.inf)

    def unpack(k, t):
        found = k < huge
        idx = t * _TA2 + (k & (_TA2 - 1))
        dist = jax.lax.bitcast_convert_type(k & _KEY_MASK, jnp.float32)
        return jnp.where(found, dist, inf), jnp.where(found, idx, 0)

    d1, i1 = unpack(k1, t1)
    d2, i2 = unpack(k2, t2)
    return d1, d2, i1, i2


# --------------------------------------------------------------------- v3
#
# v2 left ~6 VPU passes per (512, 1024) tile: distance compose (norm_b +
# norm_a - 2*cross), the fused gate channel, key packing, and two
# min-reductions.  v3 moves EVERYTHING that is a polynomial in per-point
# channels INTO the MXU contraction, where the K axis pads to 128 lanes
# anyway (adding channels to a K=48 bf16 contraction is literally free):
#
#   Q.R = |b|^2 + |a|^2 - 2 a.b                      (norm channels)
#         + M (lapl_b - lapl_a)^2                    (equal-sign gate)
#         + V (1 - valid_a)                          (A validity)
#
# with M, V exact powers of two and lapl in {-1, 0, 1}, the penalty
# terms are EXACT in bf16 arithmetic: any candidate failing the binary
# gates carries >= M = 2^13, far above any true descriptor distance, so
# it can win a top-2 slot only when fewer than two gate-valid candidates
# exist — and the caller's exact rescore re-checks all gates on the two
# finalists, restoring v2's contract bit-for-bit.  The only remaining
# VPU work per tile: the (continuous) scale-ratio gate folded into the
# key select, the key pack, and the two min-reductions.
#
# The augmentation is per-image, done once in the caller (prep_aug):
# query rows [-r2*desc, 1, |d|^2, M*l^2, -2M*l, M, 1] pair with
# reference rows [r2*desc, |d|^2, 1, 1, l, l^2, V*(1-valid)].

_M_LAPL = 8192.0  # 2^13: > any true descriptor distance
_V_INVALID = 4194304.0  # 2^22: > 4 * M_LAPL


def prep_aug(lapl, scale, valid, desc_f32):
    """Per-image v3 matcher rows: (query_aug, ref_aug) bf16 (P, D+8) and
    the f32 log-scale channel for the in-kernel ratio gate."""
    r2 = jnp.float32(np.sqrt(2.0))
    norm = jnp.sum(desc_f32 * desc_f32, axis=1, keepdims=True)
    one = jnp.ones_like(norm)
    l = lapl[:, None]
    q = jnp.concatenate(
        [-r2 * desc_f32, one, norm, _M_LAPL * l * l, -2.0 * _M_LAPL * l,
         _M_LAPL * one, one, jnp.zeros_like(norm)], axis=1
    )
    r = jnp.concatenate(
        [r2 * desc_f32, norm, one, one, l, l * l,
         _V_INVALID * (1.0 - valid.astype(jnp.float32)[:, None]),
         jnp.zeros_like(norm)], axis=1
    )
    ls = jnp.log(jnp.maximum(scale, 1e-30))
    return q.astype(jnp.bfloat16), r.astype(jnp.bfloat16), ls


def _kernel_v3(
    q_ref,  # (BB2, D+8) bf16 query rows
    ls_b_ref,  # (BB2, 1) f32 log scale
    r_ref,  # (TA2, D+8) bf16 reference rows
    ls_a_ref,  # (8, TA2) f32, row 0 = log scale
    tau_ref,  # (1, 1) f32 SMEM: log(scale_ratio)
    k1_ref, k2_ref, t1_ref, t2_ref,  # (BB2, 1) i32 outs
):
    j = pl.program_id(1)
    imax = jnp.int32(2**31 - 1)

    @pl.when(j == 0)
    def _():
        k1_ref[:] = jnp.full_like(k1_ref, imax)
        k2_ref[:] = jnp.full_like(k2_ref, imax)
        t1_ref[:] = jnp.zeros_like(t1_ref)
        t2_ref[:] = jnp.zeros_like(t2_ref)

    d = jax.lax.dot_general(
        q_ref[:], r_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = jnp.maximum(d, 0.0)
    gate = jnp.abs(ls_b_ref[:] - ls_a_ref[0, :][None, :]) <= tau_ref[0, 0]

    bb, ta = d.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (bb, ta), 1)
    key = jnp.where(
        gate,
        (jax.lax.bitcast_convert_type(d, jnp.int32) & _KEY_MASK) | cols,
        imax,
    )
    t1 = jnp.min(key, axis=1, keepdims=True)
    key2 = jnp.where(key == t1, imax, key)
    t2 = jnp.min(key2, axis=1, keepdims=True)

    k1, k2 = k1_ref[:], k2_ref[:]
    i1, i2 = t1_ref[:], t2_ref[:]
    first_new = t1 < k1
    nk1 = jnp.where(first_new, t1, k1)
    ni1 = jnp.where(first_new, j, i1)
    cand_k = jnp.where(first_new, k1, t1)
    cand_t = jnp.where(first_new, i1, jnp.full_like(i1, j))
    run_better = t2 < k2
    run_k = jnp.where(run_better & first_new, t2, k2)
    run_t = jnp.where(run_better & first_new, j, i2)
    second_new = cand_k < run_k
    k1_ref[:] = nk1
    t1_ref[:] = ni1
    k2_ref[:] = jnp.where(second_new, cand_k, run_k)
    t2_ref[:] = jnp.where(second_new, cand_t, run_t)


@partial(jax.jit, static_argnames=("interpret",))
def pallas_top2_v3(q_aug, ls_b, r_aug, ls_a, scale_ratio, interpret=False):
    """(PB, D+8) augmented queries vs (PA, D+8) augmented references ->
    (d1, d2, i1, i2) each (PB,).  d1/d2 are key-quantized surrogates that
    may carry gate penalties — callers MUST re-check the binary gates on
    the two finalists (matcher._exact_rescore_gated does)."""
    pb = q_aug.shape[0]
    pa = r_aug.shape[0]
    dd = q_aug.shape[1]
    grid = (pb // _BB2, pa // _TA2)

    ls_a2 = jnp.zeros((8, pa), jnp.float32).at[0].set(ls_a)
    tau = jnp.log(scale_ratio.reshape(1, 1))
    row_spec = pl.BlockSpec((_BB2, 1), lambda i, j: (i, 0))
    k1, k2, t1, t2 = pl.pallas_call(
        _kernel_v3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BB2, dd), lambda i, j: (i, 0)),
            pl.BlockSpec((_BB2, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((_TA2, dd), lambda i, j: (j, 0)),
            pl.BlockSpec((8, _TA2), lambda i, j: (0, j)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[row_spec, row_spec, row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((pb, 1), jnp.int32),
            jax.ShapeDtypeStruct((pb, 1), jnp.int32),
            jax.ShapeDtypeStruct((pb, 1), jnp.int32),
            jax.ShapeDtypeStruct((pb, 1), jnp.int32),
        ],
        interpret=interpret,
    )(q_aug, ls_b[:, None], r_aug, ls_a2, tau)

    k1, k2, t1, t2 = k1[:, 0], k2[:, 0], t1[:, 0], t2[:, 0]
    huge = jax.lax.bitcast_convert_type(jnp.float32(1e30), jnp.int32)
    inf = jnp.float32(np.inf)

    def unpack(k, t):
        found = k < huge
        idx = t * _TA2 + (k & (_TA2 - 1))
        dist = jax.lax.bitcast_convert_type(k & _KEY_MASK, jnp.float32)
        return jnp.where(found, dist, inf), jnp.where(found, idx, 0)

    d1, i1 = unpack(k1, t1)
    d2, i2 = unpack(k2, t2)
    return d1, d2, i1, i2
