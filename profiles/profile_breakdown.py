"""Piecewise breakdown of the optimizer iteration cost at reference scale.

Isolates: link_pass, linear_update, em_reestimate, scatter/apply einsums
per level, linear_stage with EM disabled vs enabled, deformable pieces.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from profile_scale import N, P, K, build_arrays, timeit, log


def main():
    import jax
    import jax.numpy as jnp

    from frog_tpu.registration import kernels
    from frog_tpu.transforms.bspline import grid_from_bbox

    log(f"workload: N={N} P={P} K={K}")
    arrays = build_arrays()
    movable = jnp.ones((N,), bool)

    # linear_update alone
    f = jax.jit(
        lambda a: kernels.linear_update(a, movable, jnp.float32(0.5), True)[0].sum()
    )
    jax.block_until_ready(f(arrays))
    log(f"linear_update alone: {timeit(lambda: f(arrays))*1e3:.1f} ms")

    # em_reestimate alone (100 iters cap, stride 1)
    f_em = jax.jit(
        lambda a: kernels.em_reestimate(a, a.xyz2, a.em, 100, 1e-6, 1).sum(),
    )
    jax.block_until_ready(f_em(arrays))
    log(f"em_reestimate (cap 100): {timeit(lambda: f_em(arrays))*1e3:.1f} ms")
    f_em10 = jax.jit(
        lambda a: kernels.em_reestimate(a, a.xyz2, a.em, 10, 1e-6, 1).sum(),
    )
    jax.block_until_ready(f_em10(arrays))
    log(f"em_reestimate (cap 10): {timeit(lambda: f_em10(arrays))*1e3:.1f} ms")
    # em with stride 16 (reference-like 10k-sample cap)
    f_em_s = jax.jit(
        lambda a: kernels.em_reestimate(a, a.xyz2, a.em, 100, 1e-6, 48).sum(),
    )
    jax.block_until_ready(f_em_s(arrays))
    log(f"em_reestimate (cap 100, stride 48): {timeit(lambda: f_em_s(arrays))*1e3:.1f} ms")

    # linear_stage WITHOUT EM (stat_interval > n_steps)
    def lstage(a, interval):
        af, xyz2, em, meas = kernels.linear_stage(
            a, movable, jnp.float32(0.5), True, 50, jnp.int32(1),
            jnp.int32(50), interval, 100, 1e-6, 1, None, 0,
        )
        return af.sum(), xyz2.sum(), em.sum(), meas.sum()

    f_noem = jax.jit(lambda a: lstage(a, 1 << 30))
    jax.block_until_ready(f_noem(arrays))
    t = timeit(lambda: f_noem(arrays), reps=2)
    log(f"linear_stage(50) EM-never: {t:.2f}s -> {t/50*1e3:.1f} ms/iter")
    f_em10i = jax.jit(lambda a: lstage(a, 10))
    jax.block_until_ready(f_em10i(arrays))
    t = timeit(lambda: f_em10i(arrays), reps=2)
    log(f"linear_stage(50) EM-every-10: {t:.2f}s -> {t/50*1e3:.1f} ms/iter")

    # scatter / apply einsums per level
    for level, size in ((0, 100.0), (1, 50.0), (2, 25.0)):
        dims, origin, spacing = grid_from_bbox(
            np.array([-35.0] * 3), np.array([385.0] * 3), size, margin=0.0
        )
        basis = jax.jit(
            lambda x, d=tuple(dims): kernels.bspline_basis(
                jnp.asarray(origin, jnp.float32),
                jnp.asarray(spacing, jnp.float32), d, x,
            )
        )(arrays.xyz)
        coeffs = jnp.zeros((N, *dims, 3), jnp.float32)
        vals = jnp.ones((N, P, 4), jnp.float32)

        f_sc = jax.jit(lambda b1, b2, v: kernels._bspline_scatter_sep((b1, b2), v).sum())
        jax.block_until_ready(f_sc(basis[0], basis[1], vals))
        t_sc = timeit(lambda: f_sc(basis[0], basis[1], vals), reps=3)

        f_ap = jax.jit(
            lambda c, b1, b2, x: kernels.bspline_apply_sep(c, (b1, b2), x).sum()
        )
        jax.block_until_ready(f_ap(coeffs, basis[0], basis[1], arrays.xyz))
        t_ap = timeit(lambda: f_ap(coeffs, basis[0], basis[1], arrays.xyz), reps=3)
        log(
            f"L{level+1} dims={tuple(dims)}: scatter_sep {t_sc*1e3:.1f} ms,"
            f" apply_sep {t_ap*1e3:.1f} ms"
        )

    # deformable link->point reduction alone (no grid work)
    def linkred(a):
        pA, diff, dist, w = kernels.link_pass(a)
        w2 = w * w
        w2 = jnp.where(w < 0.5, 0.0, w2)
        s_disp = jnp.sum(w2[..., None] * diff, axis=2)
        s_weight = jnp.sum(w2, axis=2)
        return s_disp.sum() + s_weight.sum()

    f_lr = jax.jit(linkred)
    jax.block_until_ready(f_lr(arrays))
    log(f"link_pass + K-reduction: {timeit(lambda: f_lr(arrays))*1e3:.1f} ms")


if __name__ == "__main__":
    main()
