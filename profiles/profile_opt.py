"""Profile the optimizer's per-iteration cost components on the real TPU.

Builds the exact bench.py optimizer workload (8 images x 10k points,
synthetic match graph), then times isolated scans of each sub-kernel.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tests.synthetic import make_synthetic_group
from frog_tpu.registration.state import build_group_state
from frog_tpu.registration import kernels
from frog_tpu.registration.group import grid_from_bbox
from frog_tpu.registration.state import bounding_box

N_IMAGES, N_POINTS = 8, 10000

graph, _ = make_synthetic_group(
    seed=42, n_images=N_IMAGES, n_points=N_POINTS, extent=350.0,
    warp_amp=8.0, noise=0.5, outlier_fraction=0.0, match_fraction=1.0,
)
arrays, meta = build_group_state(graph)
movable = jnp.asarray(meta.movable)
print("shapes: xyz", arrays.xyz.shape, "link_dst", arrays.link_dst.shape,
      file=sys.stderr)

lo, hi = bounding_box(arrays, meta.movable)
dims, origin, spacing = grid_from_bbox(lo, hi, 100.0, margin=0.1)
print("grid dims", dims, "spacing", spacing, file=sys.stderr)
coeffs = jnp.zeros((N_IMAGES, *dims, 3), jnp.float32)
origin_d = jnp.asarray(origin, jnp.float32)
spacing_d = jnp.asarray(spacing, jnp.float32)
limit = jnp.asarray(0.4 * np.asarray(spacing), jnp.float32)

basis = jax.jit(
    lambda o, s, x: kernels.bspline_basis(o, s, dims, x),
    static_argnums=(),
)(origin_d, spacing_d, arrays.xyz)
basis = jax.block_until_ready(basis)
print("basis shapes", basis[0].shape, basis[1].shape, file=sys.stderr)


def timed(name, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:42s} {min(ts)*1e3:9.2f} ms")
    return out


# ---- full stages --------------------------------------------------------
def full_deform(arrays, coeffs):
    return kernels.deformable_stage(
        arrays, movable, coeffs, basis, limit, jnp.float32(0.02), 0.5,
        0.0, True, True, 100, jnp.int32(0), jnp.int32(100), 10, 100,
        1e-3, 1,
    )

def full_linear(arrays):
    return kernels.linear_stage(
        arrays, movable, jnp.float32(0.5), True, 50, jnp.int32(0),
        jnp.int32(50), 10, 100, 1e-3, 1,
    )

# ---- isolated pieces (scan of 100 to amortize dispatch) -----------------
def scan100(fn, init):
    def body(c, _):
        return fn(c), None
    out, _ = jax.lax.scan(body, init, None, length=100)
    return out

def link_pass_only(xyz2):
    a = arrays.__class__(**{**arrays.__dict__, "xyz2": xyz2})
    pA, diff, dist = kernels.link_geometry(a)
    w = kernels.link_weights(a, dist)
    w2 = jnp.where(w < 0.5, 0.0, w * w)
    s_disp = jnp.sum(w2[..., None] * diff, axis=2)
    s_w = jnp.sum(w2, axis=2)
    # feed something back so scan has a real dependency
    return xyz2 + 1e-9 * s_disp + 1e-12 * s_w[..., None]

def geometry_only(xyz2):
    a = arrays.__class__(**{**arrays.__dict__, "xyz2": xyz2})
    pA, diff, dist = kernels.link_geometry(a)
    return xyz2 + 1e-9 * jnp.sum(diff, axis=2) + 1e-12 * dist.sum(-1)[..., None]

def weights_only(xyz2):
    # fixed dist so only the weight computation is measured
    dist = jnp.ones(arrays.link_dst.shape, jnp.float32) * (
        1.0 + 1e-6 * xyz2[..., :1].sum()
    )
    a = arrays
    w = kernels.link_weights(a, dist)
    return xyz2 + 1e-9 * jnp.sum(w, axis=2)[..., None]

def apply_only(xyz2):
    out = kernels.bspline_apply_sep(coeffs + 1e-9 * xyz2[0, 0, 0], basis,
                                    arrays.xyz)
    return xyz2 + 1e-9 * out

def scatter_only(xyz2):
    vals = jnp.concatenate([xyz2, xyz2[..., :1]], axis=-1)
    grid = kernels._bspline_scatter_sep(basis, vals)
    return xyz2 + 1e-9 * grid.sum()

def em_only(xyz2):
    em = kernels.em_reestimate(arrays, xyz2, arrays.em, 100, 1e-3, 1)
    return xyz2 + 1e-9 * em.sum()

jit = jax.jit
timed("deformable_stage(100)", jit(full_deform), arrays, coeffs)
timed("linear_stage(50)", jit(full_linear), arrays)
timed("scan100 link pass (geom+weights+sums)", jit(lambda x: scan100(link_pass_only, x)), arrays.xyz2)
timed("scan100 geometry only (gather+dist)", jit(lambda x: scan100(geometry_only, x)), arrays.xyz2)
timed("scan100 weights only (onehot+prob)", jit(lambda x: scan100(weights_only, x)), arrays.xyz2)
timed("scan100 bspline apply", jit(lambda x: scan100(apply_only, x)), arrays.xyz2)
timed("scan100 scatter", jit(lambda x: scan100(scatter_only, x)), arrays.xyz2)
timed("scan100 EM re-estimate", jit(lambda x: scan100(em_only, x)), arrays.xyz2)
