"""Pallas VMEM-resident gather probes (Mosaic lowering variants)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from profile_scale import N, P, K, timeit, log


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = N * P
    TOT = N * P * K
    C = 1 << 14
    rng = np.random.default_rng(1)
    idx = rng.integers(0, R, TOT).astype(np.int32)
    table = jnp.asarray(rng.normal(size=(R // 8, 128)), jnp.bfloat16)
    idx_d = jnp.asarray(idx)[:, None]

    # V2: take_along_axis with per-lane indices (Mosaic dynamic-gather form)
    def k2(idx_ref, table_ref, out_ref):
        ids = idx_ref[:] >> 3  # (C, 1)
        ids = jnp.broadcast_to(ids, (ids.shape[0], 128))
        out_ref[:] = jnp.take_along_axis(table_ref[:], ids, axis=0)

    # V3: same but f32 table (bf16 sublane gather may be unsupported)
    table32 = table.astype(jnp.float32)

    for name, kern, tbl in (("take_along bf16", k2, table),
                            ("take_along f32", k2, table32)):
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
                out_shape=jax.ShapeDtypeStruct((TOT, 128), tbl.dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )
            fj = jax.jit(lambda i, t: f(i, t).astype(jnp.float32).sum())
            t0 = time.time()
            out = jax.block_until_ready(fj(idx_d, tbl))
            log(f"pallas {name}: compiled+ran {time.time()-t0:.1f}s sum={out:.0f}")
            t = timeit(lambda: fj(idx_d, tbl), reps=3)
            log(
                f"pallas {name}: {t*1e3:.1f} ms for {TOT/1e6:.1f}M idx"
                f" ({t/TOT*1e9:.2f} ns/idx)"
            )
        except Exception as e:  # noqa: BLE001
            log(f"pallas {name} FAILED: {type(e).__name__}: {str(e)[:400]}")


if __name__ == "__main__":
    main()
