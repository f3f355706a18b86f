"""Bisect: which detail makes kernels.linear_stage 3x slower than the
hand-inlined equivalent?"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
import jax, jax.numpy as jnp, numpy as np
import dataclasses as dc
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tests.synthetic import make_synthetic_group
from frog_tpu.registration.state import build_group_state
from frog_tpu.registration import kernels
from frog_tpu.registration.kernels import (
    em_reestimate, linear_update, transform_points_affine,
)

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
    print(f"{name:58s} {min(ts)/n*1e3:8.3f} ms/iter")


def make_stage(traced_alpha, traced_bounds, with_em_cond, use_scale=True):
    def stage(arrays, alpha, it0, n_live):
        if not traced_alpha:
            alpha = 0.5
        if not traced_bounds:
            it0, n_live = 0, 50
        zero3 = jnp.zeros(3)
        def live(affine, xyz2, em, i):
            if with_em_cond:
                em = jax.lax.cond(
                    (it0 + i) % 10 == 0,
                    lambda: em_reestimate(arrays, xyz2, em, 100, 1e-3, 1),
                    lambda: em,
                )
            a = dc.replace(arrays, affine=affine, xyz2=xyz2, em=em)
            new_affine, e = linear_update(a, movable, alpha, use_scale)
            new_xyz2 = transform_points_affine(new_affine, arrays.xyz)
            return new_affine, new_xyz2, em, e, zero3
        def body(carry, i):
            affine, xyz2, em = carry
            alive = i < n_live
            affine, xyz2, em, e, stats = jax.lax.cond(
                alive,
                lambda: live(affine, xyz2, em, i),
                lambda: (affine, xyz2, em, jnp.float32(0.0), zero3),
            )
            return (affine, xyz2, em), (e, alive, stats)
        (affine, xyz2, em), out = jax.lax.scan(
            body, (arrays.affine, arrays.xyz2, arrays.em),
            jnp.arange(50, dtype=jnp.int32))
        return affine, xyz2, em, out
    return jax.jit(stage)

a05 = jnp.float32(0.5); i0 = jnp.int32(0); i50 = jnp.int32(50)
timed("static alpha+bounds, EM cond", make_stage(False, False, True), arrays, a05, i0, i50)
timed("traced alpha, static bounds, EM cond", make_stage(True, False, True), arrays, a05, i0, i50)
timed("static alpha, traced bounds, EM cond", make_stage(False, True, True), arrays, a05, i0, i50)
timed("traced alpha+bounds, EM cond", make_stage(True, True, True), arrays, a05, i0, i50)
timed("traced alpha+bounds, no EM", make_stage(True, True, False), arrays, a05, i0, i50)
