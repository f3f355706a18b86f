"""Isolate linear_stage overhead: EM cadence, alive-cond, carry structure."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
import jax, jax.numpy as jnp, numpy as np
import dataclasses as dc
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tests.synthetic import make_synthetic_group
from frog_tpu.registration.state import build_group_state
from frog_tpu.registration import kernels

graph, _ = make_synthetic_group(
    seed=42, n_images=8, n_points=10000, extent=350.0,
    warp_amp=8.0, noise=0.5, outlier_fraction=0.0, match_fraction=1.0,
)
arrays, meta = build_group_state(graph)
movable = jnp.asarray(meta.movable)

def timed(name, fn, *args, n=50):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:52s} {min(ts)/n*1e3:8.3f} ms/iter")

stage = jax.jit(lambda a, si: kernels.linear_stage(
    a, movable, jnp.float32(0.5), True, 50, jnp.int32(0), jnp.int32(50),
    si, 100, 1e-3, 1), static_argnums=(1,))

timed("linear_stage stat_interval=10", stage, arrays, 10)
timed("linear_stage stat_interval=1000000", stage, arrays, 1000000)

# EM cost alone, dispatched once
em1 = jax.jit(lambda a: kernels.em_reestimate(a, a.xyz2, a.em, 100, 1e-3, 1))
timed("single em_reestimate", em1, arrays, n=1)

# variant: no alive cond
def stage_nocond(a):
    def body(carry, i):
        affine, xyz2, em = carry
        em2 = jax.lax.cond(
            i % 10 == 0,
            lambda: kernels.em_reestimate(a, xyz2, em, 100, 1e-3, 1),
            lambda: em,
        )
        aa = dc.replace(a, affine=affine, xyz2=xyz2, em=em2)
        new_affine, e = kernels.linear_update(aa, movable, 0.5, True)
        new_xyz2 = kernels.transform_points_affine(new_affine, a.xyz)
        return (new_affine, new_xyz2, em2), e
    (affine, xyz2, em), es = jax.lax.scan(
        body, (a.affine, a.xyz2, a.em), jnp.arange(50, dtype=jnp.int32))
    return affine, xyz2, em, es
timed("no alive-cond, EM cond every 10", jax.jit(stage_nocond), arrays)

# variant: no EM at all, with alive cond
def stage_noem(a):
    zero3 = jnp.zeros(3)
    def live(affine, xyz2, em, i):
        aa = dc.replace(a, affine=affine, xyz2=xyz2, em=em)
        new_affine, e = kernels.linear_update(aa, movable, 0.5, True)
        new_xyz2 = kernels.transform_points_affine(new_affine, a.xyz)
        return new_affine, new_xyz2, em, e, zero3
    def body(carry, i):
        affine, xyz2, em = carry
        alive = i < 50
        affine, xyz2, em, e, stats = jax.lax.cond(
            alive, lambda: live(affine, xyz2, em, i),
            lambda: (affine, xyz2, em, jnp.float32(0.0), zero3))
        return (affine, xyz2, em), (e, alive, stats)
    (affine, xyz2, em), out = jax.lax.scan(
        body, (a.affine, a.xyz2, a.em), jnp.arange(50, dtype=jnp.int32))
    return affine, xyz2, em, out
timed("alive-cond, no EM", jax.jit(stage_noem), arrays)
