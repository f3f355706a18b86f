"""Test: does optimization_barrier around the gather speed up linear_update?"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
import jax, jax.numpy as jnp, numpy as np
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

def scan_n(fn, n=50):
    def outer(x):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out
    return jax.jit(outer)

def timed(name, fn, arg, n=50):
    jax.block_until_ready(fn(arg))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(arg))
        ts.append(time.perf_counter() - t0)
    print(f"{name:46s} {min(ts)/n*1e3:8.3f} ms/iter")

import dataclasses as dc

def linear_iter(xyz2):
    a = dc.replace(arrays, xyz2=xyz2)
    new_affine, e = kernels.linear_update(a, movable, 0.5, True)
    return kernels.transform_points_affine(new_affine, arrays.xyz) + 1e-12 * e

timed("linear_update as-is", scan_n(linear_iter), arrays.xyz2)

# variant with materialized gather
def linear_iter_bar(xyz2):
    n, p, _ = xyz2.shape
    flat = xyz2.reshape(n * p, 3)
    pB = jax.lax.optimization_barrier(flat[arrays.link_dst])
    pA = xyz2[:, :, None, :]
    diff = pB - pA
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    w = kernels.link_weights(arrays, dist)
    w2 = w * w
    mov = movable.astype(jnp.float32)
    s_dist = jnp.sum(mov * jnp.sum(w2 * dist * dist, axis=(1, 2)))
    s_disp = jnp.sum(w[..., None] * diff, axis=(1, 2))
    s_pos_a = jnp.sum(w[..., None] * pA, axis=(1, 2))
    s_pos_b = jnp.sum(w[..., None] * pB, axis=(1, 2))
    s_pos_a2 = jnp.sum(w[..., None] * pA * pA, axis=(1, 2))
    s_pos_b2 = jnp.sum(w[..., None] * pB * pB, axis=(1, 2))
    s_w = jnp.sum(w, axis=(1, 2))[:, None]
    out = s_disp + s_pos_a + s_pos_b + s_pos_a2 + s_pos_b2 + s_w
    return xyz2 * (1.0 + 1e-12 * (out.sum() + s_dist))

timed("linear moments w/ barrier gather", scan_n(linear_iter_bar), arrays.xyz2)

# same but no barrier
def linear_iter_nobar(xyz2):
    n, p, _ = xyz2.shape
    flat = xyz2.reshape(n * p, 3)
    pB = flat[arrays.link_dst]
    pA = xyz2[:, :, None, :]
    diff = pB - pA
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    w = kernels.link_weights(arrays, dist)
    s_disp = jnp.sum(w[..., None] * diff, axis=(1, 2))
    s_pos_a = jnp.sum(w[..., None] * pA, axis=(1, 2))
    s_pos_b = jnp.sum(w[..., None] * pB, axis=(1, 2))
    s_pos_a2 = jnp.sum(w[..., None] * pA * pA, axis=(1, 2))
    s_pos_b2 = jnp.sum(w[..., None] * pB * pB, axis=(1, 2))
    s_w = jnp.sum(w, axis=(1, 2))[:, None]
    out = s_disp + s_pos_a + s_pos_b + s_pos_a2 + s_pos_b2 + s_w
    return xyz2 * (1.0 + 1e-12 * out.sum())

timed("linear moments no barrier", scan_n(linear_iter_nobar), arrays.xyz2)

# deformable with barrier
from frog_tpu.registration.group import grid_from_bbox
from frog_tpu.registration.state import bounding_box
lo, hi = bounding_box(arrays, meta.movable)
dims, origin, spacing = grid_from_bbox(lo, hi, 100.0, margin=0.1)
coeffs = jnp.zeros((8, *dims, 3), jnp.float32)
basis = jax.jit(lambda x: kernels.bspline_basis(
    jnp.asarray(origin, jnp.float32), jnp.asarray(spacing, jnp.float32),
    dims, x))(arrays.xyz)
limit = jnp.asarray(0.4 * np.asarray(spacing), jnp.float32)

def deform_iter(xyz2):
    a = dc.replace(arrays, xyz2=xyz2)
    cand, n_big, e = kernels.deformable_update(
        a, movable, coeffs, basis, limit, 0.02, 0.5, 0.0, True)
    return kernels.bspline_apply_sep(cand, basis, arrays.xyz) + 1e-12 * e

timed("deformable_update as-is", scan_n(deform_iter), arrays.xyz2)

# with barrier inside a monkeypatched _gather_dst
orig = kernels._gather_dst
def gd_bar(xyz2, link_dst):
    return jax.lax.optimization_barrier(orig(xyz2, link_dst))
kernels._gather_dst = gd_bar
timed("deformable_update barrier gather", scan_n(deform_iter), arrays.xyz2)
kernels._gather_dst = orig
