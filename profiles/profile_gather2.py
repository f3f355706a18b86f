"""Microbench the link-pass destination gather variants at reference
scale: one big gather vs per-destination-image gathers vs narrower rows,
plus the full link_pass and deformable_update in isolation.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from frog_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

N, P, K = 20, 20992, 20
R = N * P

rng = np.random.default_rng(0)
dst = rng.integers(0, R, size=(N, P, K)).astype(np.int32)
table12 = rng.normal(size=(R, 12)).astype(np.float32).astype(jnp.bfloat16)
table6 = table12[:, :6]
dst_d = jnp.asarray(dst)
t12 = jnp.asarray(table12)
t6 = jnp.asarray(table6)

# per-dst-image layout: same total index count, indices sorted by image
dst_img = dst // P
dst_row = dst % P
order = np.argsort(dst_img.reshape(N, -1), axis=1, kind="stable")
rows_sorted = np.take_along_axis(dst_row.reshape(N, -1), order, axis=1)
img_sorted = np.take_along_axis(dst_img.reshape(N, -1), order, axis=1)
rows_d = jnp.asarray(rows_sorted)
t12_img = t12.reshape(N, P, 12)


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:2]


def timeit(label, fn, *args, reps=3):
    sync(fn(*args))
    best = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn(*args))
        best.append(time.time() - t0)
    print(f"{label}: {min(best)*1000:.1f} ms", flush=True)
    return min(best)


@jax.jit
def big_gather(t, d):
    g = t[d.reshape(-1)]
    return jnp.sum(g.astype(jnp.float32), axis=0)


@jax.jit
def big_gather_3d(t, d):
    g = t[d]  # (N, P, K, 12)
    return jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))


@jax.jit
def per_image_gather(timg, rows):
    # rows (N, P*K) sorted by destination image; slice boundaries are
    # data-dependent in general — here we just measure 20 equal slabs of
    # gathers against per-image (P, 12) operands as a throughput probe.
    s = P * K // N
    out = jnp.zeros((12,), jnp.float32)
    for j in range(N):
        g = timg[j][rows[:, j * s:(j + 1) * s].reshape(-1)]
        out = out + jnp.sum(g.astype(jnp.float32), axis=0)
    return out


@jax.jit
def dyn_slice_gather(t, d):
    g = jnp.take(t, d.reshape(-1), axis=0)
    return jnp.sum(g.astype(jnp.float32), axis=0)


print(f"indices {N*P*K/1e6:.1f} M, table {t12.nbytes/1e6:.1f} MB bf16",
      flush=True)
timeit("one gather (R,12)bf16 flat idx", big_gather, t12, dst_d)
timeit("one gather (R,12)bf16 3d idx  ", big_gather_3d, t12, dst_d)
timeit("one gather (R,6)bf16          ", big_gather, t6, dst_d)
timeit("jnp.take (R,12)bf16           ", dyn_slice_gather, t12, dst_d)
timeit("20x per-image gather (P,12)   ", per_image_gather, t12_img, rows_d)

# full link_pass / deformable_update in isolation at the real state
from frog_tpu.io.pairs import read_pairs
from frog_tpu.registration import GroupConfig
from frog_tpu.registration import kernels
from frog_tpu.registration.group import grid_from_bbox
from frog_tpu.registration.state import bounding_box, build_group_state

graph = read_pairs("/tmp/frog_bench_ref/tpu_out/pairs.bin")
arrays, meta = build_group_state(graph)
movable = jnp.asarray(meta.movable)
n = arrays.xyz.shape[0]
cfg = GroupConfig()
lo, hi = bounding_box(arrays, meta.movable)
dims, origin, spacing = grid_from_bbox(lo, hi, 100.0, margin=0.1)
basis = jax.jit(lambda o, s, x: kernels.bspline_basis(o, s, dims, x))(
    jnp.asarray(origin, jnp.float32), jnp.asarray(spacing, jnp.float32),
    arrays.xyz)
coeffs = jnp.zeros((n, *dims, 3), jnp.float32)
limit = jnp.asarray(0.4 * np.asarray(spacing), jnp.float32)

print(f"real links {arrays.link_dst.shape}", flush=True)
timeit("link_pass only", jax.jit(lambda a: kernels.link_pass(a)[3]), arrays)
timeit(
    "deformable_update",
    jax.jit(lambda a, c: kernels.deformable_update(
        a, movable, c, basis, limit, jnp.float32(0.5), 0.5,
        float(n), True, n, False)[0]),
    arrays, coeffs,
)
timeit(
    "apply_sep",
    jax.jit(lambda c: kernels.bspline_apply_sep(c, basis, arrays.xyz)),
    coeffs,
)
