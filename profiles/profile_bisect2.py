"""Bisect the L1 deformable_update anomaly + pallas VMEM gather probes."""
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

    arrays = build_arrays()
    movable = jnp.ones((N,), bool)

    for level, size in ((0, 100.0), (2, 25.0)):
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
        limit = jnp.asarray(0.4 * np.asarray(spacing), jnp.float32)

        # full update (baseline for the bisect)
        f_full = jax.jit(
            lambda a, c, b1, b2, l: kernels.deformable_update(
                a, movable, c, (b1, b2), l, jnp.float32(0.02), 0.5, 100.0,
                True, has_constraints=False,
            )[0].sum()
        )
        jax.block_until_ready(f_full(arrays, coeffs, *basis, limit))
        t_full = timeit(lambda: f_full(arrays, coeffs, *basis, limit), reps=3)

        # update with a barrier between the link reduction and the scatter
        def du_barrier(a, c, b1, b2, l):
            pA, diff, dist, w = kernels.link_pass(a)
            w2 = w * w
            w2 = jnp.where(w < 0.5, 0.0, w2)
            s_disp = jnp.sum(w2[..., None] * diff, axis=2)
            s_weight = jnp.sum(w2, axis=2)
            sums = jnp.concatenate([s_disp, s_weight[..., None]], axis=-1)
            active = (s_weight > 0)[..., None]
            vals = jnp.where(active, sums, 0.0)
            vals = jax.lax.optimization_barrier(vals)
            grid = kernels._bspline_scatter_sep((b1, b2), vals)
            n, dx, dy, dz, _ = c.shape
            grad = grid[..., :3].reshape(n, dx * dy * dz, 3)
            gw = grid[..., 3].reshape(n, dx * dy * dz)
            flat = c.reshape(n, dx * dy * dz, 3)
            stepped = jnp.where(
                (gw > 0)[..., None],
                flat + 0.02 * grad / jnp.maximum(gw, 1e-30)[..., None],
                flat,
            )
            mean = jnp.sum(stepped, axis=0) / n
            stepped = stepped - mean
            n_big = jnp.sum(jnp.abs(stepped) > l)
            return stepped.sum(), n_big

        f_bar = jax.jit(du_barrier)
        jax.block_until_ready(f_bar(arrays, coeffs, *basis, limit))
        t_bar = timeit(lambda: f_bar(arrays, coeffs, *basis, limit), reps=3)

        # scatter fed by constants (no link work at all)
        vals_const = jnp.ones((N, P, 4), jnp.float32)

        def du_noscatter(a):
            pA, diff, dist, w = kernels.link_pass(a)
            w2 = w * w
            w2 = jnp.where(w < 0.5, 0.0, w2)
            s_disp = jnp.sum(w2[..., None] * diff, axis=2)
            s_weight = jnp.sum(w2, axis=2)
            return s_disp.sum() + s_weight.sum()

        f_ns = jax.jit(du_noscatter)
        jax.block_until_ready(f_ns(arrays))
        t_ns = timeit(lambda: f_ns(arrays), reps=3)
        log(
            f"L{level+1} dims={tuple(dims)}: full {t_full*1e3:.1f} ms,"
            f" barrier {t_bar*1e3:.1f} ms, linkonly {t_ns*1e3:.1f} ms"
        )

    probe_pallas_gather()


def probe_pallas_gather():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = N * P
    TOT = N * P * K
    C = 1 << 14
    rng = np.random.default_rng(1)
    idx = rng.integers(0, R, TOT).astype(np.int32)

    # V1: gather row-groups of 8 from a (R//8, 128) bf16 table
    table = jnp.asarray(rng.normal(size=(R // 8, 128)), jnp.bfloat16)

    def k1(idx_ref, table_ref, out_ref):
        ids = idx_ref[:, 0] >> 3
        out_ref[:] = jnp.take(table_ref[:], ids, axis=0, fill_value=0)

    for name, kern in (("take", k1),):
        try:
            f = pl.pallas_call(
                kern,
                grid=(TOT // C,),
                in_specs=[
                    pl.BlockSpec((C, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (R // 8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (C, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((TOT, 128), jnp.bfloat16),
            )
            fj = jax.jit(lambda i, t: f(i, t).astype(jnp.float32).sum())
            t0 = time.time()
            out = jax.block_until_ready(fj(jnp.asarray(idx)[:, None], table))
            log(f"pallas {name}: compiled+ran {time.time()-t0:.1f}s sum={out:.0f}")
            t = timeit(lambda: fj(jnp.asarray(idx)[:, None], table), reps=3)
            log(
                f"pallas {name}: {t*1e3:.1f} ms for {TOT/1e6:.1f}M idx"
                f" ({t/TOT*1e9:.2f} ns/idx)"
            )
        except Exception as e:  # noqa: BLE001
            log(f"pallas {name} FAILED: {type(e).__name__}: {str(e)[:300]}")

    # XLA reference: same access pattern outside pallas
    tbl = jnp.asarray(rng.normal(size=(R, 12)), jnp.bfloat16)
    fx = jax.jit(lambda i, t: t[i].astype(jnp.float32).sum())
    jax.block_until_ready(fx(jnp.asarray(idx), tbl))
    t = timeit(lambda: fx(jnp.asarray(idx), tbl), reps=3)
    log(f"XLA gather (R,12)bf16: {t*1e3:.1f} ms ({t/TOT*1e9:.2f} ns/idx)")


if __name__ == "__main__":
    main()
