"""Does padding the Dx*Dy basis axis to 128 fix the small-grid einsum
pathology?  All inputs random (constants get algebraically folded)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from profile_scale import N, P, timeit, log


def main():
    import jax
    import jax.numpy as jnp

    _HI = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(0)

    for dims in ((7, 7, 7), (11, 11, 11), (20, 20, 20)):
        dx, dy, dz = dims
        q = dx * dy
        for qpad in sorted({q, ((q + 127) // 128) * 128}):
            g1 = jnp.asarray(
                rng.normal(size=(N, P, qpad)).astype(np.float32)
            )
            ez = jnp.asarray(rng.normal(size=(N, P, dz)).astype(np.float32))
            vals = jnp.asarray(rng.normal(size=(N, P, 4)).astype(np.float32))
            coeffs = jnp.asarray(
                rng.normal(size=(N, qpad, dz * 3)).astype(np.float32)
            )
            xyz = jnp.asarray(rng.normal(size=(N, P, 3)).astype(np.float32))

            def scatter(g1, ez, vals):
                vz = jnp.einsum("npz,npc->npzc", ez, vals, precision=_HI)
                n, p, dzz, c = vz.shape
                out = jnp.einsum(
                    "npq,npx->nqx", g1, vz.reshape(n, p, dzz * c), precision=_HI
                )
                return out.sum()

            def apply_(g1, ez, coeffs, xyz):
                t = jnp.einsum("npq,nqc->npc", g1, coeffs, precision=_HI)
                t = t.reshape(N, P, dz, 3)
                disp = jnp.einsum("npz,npzc->npc", ez, t, precision=_HI)
                return (xyz + disp).sum()

            f_sc = jax.jit(scatter)
            jax.block_until_ready(f_sc(g1, ez, vals))
            t_sc = timeit(lambda: f_sc(g1, ez, vals), reps=3)
            f_ap = jax.jit(apply_)
            jax.block_until_ready(f_ap(g1, ez, coeffs, xyz))
            t_ap = timeit(lambda: f_ap(g1, ez, coeffs, xyz), reps=3)
            log(
                f"dims={dims} q={q} qpad={qpad}: scatter {t_sc*1e3:.1f} ms,"
                f" apply {t_ap*1e3:.1f} ms"
            )

    # bf16 G1 variant at L3 (halve basis traffic)
    dims = (20, 20, 20)
    q = 512  # padded
    g1 = jnp.asarray(rng.normal(size=(N, P, q)).astype(np.float32))
    g1b = g1.astype(jnp.bfloat16)
    ez = jnp.asarray(rng.normal(size=(N, P, 20)).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=(N, P, 4)).astype(np.float32))

    def scatter_bf16(g1b, ez, vals):
        vz = jnp.einsum("npz,npc->npzc", ez, vals)
        n, p, dzz, c = vz.shape
        out = jax.lax.dot_general(
            jnp.swapaxes(g1b, 1, 2),
            vz.reshape(n, p, dzz * c).astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return out.sum()

    f = jax.jit(scatter_bf16)
    jax.block_until_ready(f(g1b, ez, vals))
    t = timeit(lambda: f(g1b, ez, vals), reps=3)
    log(f"L3 scatter bf16 G1 (q=512): {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
