"""Reference-scale profiling on the real TPU (round 3).

Measures, at the reference-default workload scale (20 images x 20k points):
  * link_pass (the per-iteration destination gather) — XLA gather roofline
  * deformable_update at level-1/2/3 grid dims (separable-basis matmuls)
  * fused deformable_stage (20 iters) wall-clock + compile time
  * fused linear_stage (50 iters)
  * pallas VMEM-gather feasibility probes (can Mosaic vector-gather?)
  * matcher pallas_top2 at 20k x 20k

Run with plain `python` (keeps the axon TPU env).  Prints timings as it
goes; returns only scalars to the host (remote tunnel: readback is slow).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def log(*a):
    print(*a, flush=True)


N = int(os.environ.get("PS_IMAGES", 20))
P = int(os.environ.get("PS_POINTS", 20224))  # 20k padded to 128
K = int(os.environ.get("PS_LINKS", 24))


def build_arrays():
    import jax.numpy as jnp

    from frog_tpu.registration.state import GroupArrays

    rng = np.random.default_rng(0)
    cloud = rng.uniform(0, 350, (P, 3)).astype(np.float32)
    xyz = (
        cloud[None]
        + rng.uniform(-10, 10, (N, 1, 3)).astype(np.float32)
        + rng.normal(scale=1.0, size=(N, P, 3)).astype(np.float32)
    )
    # K links per point: counterpart in K other images (wraps around)
    link_dst = np.zeros((N, P, K), np.int32)
    link_valid = np.ones((N, P, K), bool)
    for i in range(N):
        for k in range(K):
            j = (i + 1 + k) % N
            if j == i:
                j = (j + 1) % N
            link_dst[i, :, k] = j * P + rng.permutation(P)
    return GroupArrays(
        xyz=jnp.asarray(xyz),
        xyz2=jnp.asarray(xyz),
        point_valid=jnp.ones((N, P), bool),
        link_dst=jnp.asarray(link_dst),
        link_valid=jnp.asarray(link_valid),
        hard_dst=jnp.zeros((N, P, 8), jnp.int32),
        hard_valid=jnp.zeros((N, P, 8), bool),
        em=jnp.tile(jnp.asarray([[10.0, 300.0, 0.5]], jnp.float32), (N, 1)),
        affine=jnp.tile(np.eye(4, dtype=np.float32), (N, 1, 1)),
    )


def timeit(fn, reps=5, warm=1):
    import jax

    for _ in range(warm):
        jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    log(f"workload: N={N} P={P} K={K} -> {N*P*K/1e6:.1f}M link gathers/iter")

    from frog_tpu.registration import kernels

    arrays = build_arrays()
    movable = jnp.ones((N,), bool)

    # ---- link_pass (gather roofline)
    t0 = time.time()
    f_lp = jax.jit(lambda a: kernels.link_pass(a)[3].sum())
    jax.block_until_ready(f_lp(arrays))
    log(f"link_pass compile: {time.time()-t0:.1f}s")
    t = timeit(lambda: f_lp(arrays))
    idx = N * P * K
    log(
        f"link_pass: {t*1e3:.1f} ms  ({idx/1e6:.1f}M idx, {t/idx*1e9:.2f} ns/idx,"
        f" {idx*2048/t/1e9:.0f} GB/s tile-traffic if 2KB/idx)"
    )

    # ---- deformable_update at the 3 level grids
    for level, size in ((0, 100.0), (1, 50.0), (2, 25.0)):
        lo = np.array([-35.0, -35.0, -35.0])
        hi = np.array([385.0, 385.0, 385.0])
        from frog_tpu.transforms.bspline import grid_from_bbox

        dims, origin, spacing = grid_from_bbox(lo, hi, size, margin=0.0)
        origin_d = jnp.asarray(origin, jnp.float32)
        spacing_d = jnp.asarray(spacing, jnp.float32)
        g1_mb = N * P * dims[0] * dims[1] * 4 / 1e6
        t0 = time.time()
        basis = jax.jit(
            lambda x, o=origin_d, s=spacing_d, d=tuple(dims): kernels.bspline_basis(
                o, s, d, x
            )
        )(arrays.xyz)
        jax.block_until_ready(basis)
        t_basis = time.time() - t0
        coeffs = jnp.zeros((N, *dims, 3), jnp.float32)
        limit = jnp.asarray(0.4 * np.asarray(spacing), jnp.float32)

        def du(a, c, b, l):
            cand, n_big, e = kernels.deformable_update(
                a, movable, c, b, l, jnp.float32(0.02), 0.5, 100.0, True,
                has_constraints=False,
            )
            return cand.sum(), n_big, e

        f_du = jax.jit(du)
        t0 = time.time()
        jax.block_until_ready(f_du(arrays, coeffs, basis, limit))
        t_compile = time.time() - t0
        t = timeit(lambda: f_du(arrays, coeffs, basis, limit), reps=3)
        log(
            f"deformable_update L{level+1} dims={tuple(dims)} G1={g1_mb:.0f}MB:"
            f" {t*1e3:.1f} ms/iter (basis build {t_basis:.1f}s,"
            f" compile {t_compile:.1f}s)"
        )

    # ---- fused deformable_stage, 20 iters at level-3 dims
    from frog_tpu.transforms.bspline import grid_from_bbox

    dims, origin, spacing = grid_from_bbox(
        np.array([-35.0] * 3), np.array([385.0] * 3), 25.0, margin=0.0
    )
    origin_d = jnp.asarray(origin, jnp.float32)
    spacing_d = jnp.asarray(spacing, jnp.float32)
    basis = jax.jit(
        lambda x: kernels.bspline_basis(origin_d, spacing_d, tuple(dims), x)
    )(arrays.xyz)
    coeffs = jnp.zeros((N, *dims, 3), jnp.float32)
    limit = jnp.asarray(0.4 * np.asarray(spacing), jnp.float32)

    def stage(a, c0, b, l):
        c, xyz2, em, meas = kernels.deformable_stage(
            a, movable, c0, b, l, jnp.float32(0.02),
            0.5, 100.0, True, True, 20, jnp.int32(0), jnp.int32(20),
            10, 100, 1e-6, 1, None, 0, N, False,
        )
        return c.sum(), xyz2.sum(), em.sum(), meas.sum()

    f_stage = jax.jit(stage)
    t0 = time.time()
    jax.block_until_ready(f_stage(arrays, coeffs, basis, limit))
    log(f"deformable_stage(20 iters, L3) compile+run: {time.time()-t0:.1f}s")
    t = timeit(lambda: f_stage(arrays, coeffs, basis, limit), reps=2)
    log(f"deformable_stage(20 iters, L3): {t:.2f}s -> {t/20*1e3:.1f} ms/iter")

    # ---- fused linear_stage, 50 iters
    def lstage(a):
        af, xyz2, em, meas = kernels.linear_stage(
            a, movable, jnp.float32(0.5), True, 50, jnp.int32(0),
            jnp.int32(50), 10, 100, 1e-6, 1, None, 0,
        )
        return af.sum(), xyz2.sum(), em.sum(), meas.sum()

    f_l = jax.jit(lstage)
    t0 = time.time()
    jax.block_until_ready(f_l(arrays))
    log(f"linear_stage(50 iters) compile+run: {time.time()-t0:.1f}s")
    t = timeit(lambda: f_l(arrays), reps=2)
    log(f"linear_stage(50 iters): {t:.2f}s -> {t/50*1e3:.1f} ms/iter")

    # ---- pallas VMEM gather probes
    try:
        probe_pallas_gather()
    except Exception as e:  # noqa: BLE001
        log(f"pallas gather probe FAILED: {type(e).__name__}: {e}")

    # ---- matcher at 20k x 20k
    try:
        probe_matcher()
    except Exception as e:  # noqa: BLE001
        log(f"matcher probe FAILED: {type(e).__name__}: {e}")


def probe_pallas_gather():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = N * P  # table rows
    C = 1 << 14  # indices per grid step
    TOT = N * P * K
    rng = np.random.default_rng(1)
    idx = rng.integers(0, R, TOT).astype(np.int32)

    # packed table: row r lives at (r >> 3, (r & 7) * 16 : +16)  (16-wide
    # rows: 12 used + 4 pad so 8 rows fill 128 lanes exactly)
    table = rng.normal(size=(R // 8, 128)).astype(jnp.bfloat16)

    def gkernel(idx_ref, table_ref, out_ref):
        ids = idx_ref[:, 0] >> 3  # (C,)
        grp = jnp.take(table_ref[:], ids, axis=0)  # (C, 128)
        out_ref[:] = grp

    f = pl.pallas_call(
        gkernel,
        grid=(TOT // C,),
        in_specs=[
            pl.BlockSpec((C, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full table resident
        ],
        out_specs=pl.BlockSpec((C, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TOT, 128), jnp.bfloat16),
    )
    fj = jax.jit(lambda i, t: f(i, t).astype(jnp.float32).sum())
    t0 = time.time()
    out = jax.block_until_ready(fj(jnp.asarray(idx)[:, None], table))
    log(f"pallas take-gather: compiles+runs ({time.time()-t0:.1f}s), sum={out:.1f}")
    t = timeit(lambda: fj(jnp.asarray(idx)[:, None], table), reps=3)
    log(
        f"pallas take-gather: {t*1e3:.1f} ms for {TOT/1e6:.1f}M idx"
        f" ({t/TOT*1e9:.2f} ns/idx)"
    )


def probe_matcher():
    import jax
    import jax.numpy as jnp

    from frog_tpu.ops.pallas_matcher import pallas_top2, prep_meta

    PP = 20224
    rng = np.random.default_rng(2)
    da = rng.normal(size=(PP, 48)).astype(np.float32)
    db = rng.normal(size=(PP, 48)).astype(np.float32)
    lapl = rng.choice([-1.0, 1.0], PP).astype(np.float32)
    scale = rng.uniform(1.0, 2.0, PP).astype(np.float32)
    valid = np.ones(PP, bool)
    meta_a = prep_meta(jnp.asarray(lapl), jnp.asarray(scale), jnp.asarray(valid), jnp.asarray(da))
    meta_b = prep_meta(jnp.asarray(lapl), jnp.asarray(scale), jnp.asarray(valid), jnp.asarray(db))
    a16 = jnp.asarray(da, jnp.bfloat16)
    b16 = jnp.asarray(db, jnp.bfloat16)
    sr = jnp.asarray([[1.3 * 1.3]], jnp.float32)

    f = jax.jit(
        lambda: jnp.stack(pallas_top2(b16, meta_b, a16, meta_a, sr)[:2]).sum()
    )
    t0 = time.time()
    jax.block_until_ready(f())
    log(f"pallas_top2 20k compile+run: {time.time()-t0:.1f}s")
    t = timeit(f, reps=3)
    flops = 2.0 * PP * PP * 48
    log(
        f"pallas_top2 20kx20k: {t*1e3:.1f} ms ({flops/t/1e12:.2f} TFLOP/s"
        f" matmul-only)"
    )


if __name__ == "__main__":
    main()
