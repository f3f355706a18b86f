"""Attribute the optimizer's IN-SITU per-iteration cost (the gap between
isolated-kernel timings and the production fused stage scans) and sweep
the extraction top-k variants — one process, every section independent.

TINY=1 runs a miniature CPU config to validate the script itself.
"""
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from frog_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

TINY = bool(int(os.environ.get("TINY", "0")))


def sync(x):
    """Force a real device->host sync (this backend's block_until_ready
    returns at remote-enqueue time)."""
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:4]


def timeit(label, fn, *args, reps=2):
    try:
        t0 = time.time()
        sync(fn(*args))
        print(f"{label}: warm(compile) {time.time() - t0:.1f}s", flush=True)
        best = []
        for _ in range(reps):
            t0 = time.time()
            sync(fn(*args))
            best.append(time.time() - t0)
        print(f"{label}: " + " ".join(f"{t:.3f}s" for t in best), flush=True)
        return min(best)
    except Exception:
        traceback.print_exc()
        return None


# ---------------------------------------------------------- A: top-k sweep
def section_topk():
    m = 200_000 if TINY else 8 * 192 ** 3
    k = 2000 if TINY else 20000
    rng = np.random.default_rng(0)
    resp = rng.normal(size=m).astype(np.float32)
    mask = rng.random(m) < 0.02  # NMS-like peak density
    flat = np.where(mask, np.abs(resp), -np.inf).astype(np.float32)
    x = jnp.asarray(flat)

    exact = jax.jit(lambda v: jax.lax.top_k(v, k))
    timeit(f"top_k exact ({m/1e6:.0f}M->{k})", exact, x)
    for recall in (0.999, 0.99, 0.95):
        fn = jax.jit(
            lambda v, r=recall: jax.lax.approx_max_k(v, k, recall_target=r)
        )
        t = timeit(f"approx_max_k recall={recall}", fn, x)
        if t is not None:
            vals, idx = jax.jit(
                lambda v, r=recall: jax.lax.approx_max_k(v, k, recall_target=r)
            )(x)
            got = set(np.asarray(idx).tolist())
            want = set(np.argsort(-flat)[:k].tolist())
            print(f"  recall vs exact: {len(got & want) / k:.4f}", flush=True)


# ------------------------------------------- B: in-situ stage attribution
def section_insitu():
    from frog_tpu.io.pairs import read_pairs
    from frog_tpu.registration import GroupConfig
    from frog_tpu.registration import kernels
    from frog_tpu.registration.group import grid_from_bbox
    from frog_tpu.registration.state import bounding_box, build_group_state

    if TINY:
        from tests.synthetic import make_synthetic_group

        graph, _ = make_synthetic_group(
            seed=1, n_images=3, n_points=200, extent=120.0, warp_amp=4.0,
            noise=0.5, outlier_fraction=0.1, match_fraction=0.8,
        )
        n_steps = 4
    else:
        graph = read_pairs("/tmp/frog_bench_ref/tpu_out/pairs.bin")
        n_steps = 30

    cfg = GroupConfig()
    arrays, meta = build_group_state(graph)
    movable = jnp.asarray(meta.movable)
    n = arrays.xyz.shape[0]
    print(f"shapes: xyz {arrays.xyz.shape} links {arrays.link_dst.shape}",
          flush=True)

    lo, hi = bounding_box(arrays, meta.movable)
    dims, origin, spacing = grid_from_bbox(lo, hi, cfg.initial_grid_size,
                                           margin=0.1)
    print(f"grid dims {dims} spacing {spacing}", flush=True)
    origin_d = jnp.asarray(origin, jnp.float32)
    spacing_d = jnp.asarray(spacing, jnp.float32)
    limit = jnp.asarray(
        cfg.max_displacement_ratio * np.asarray(spacing), jnp.float32
    )
    basis = jax.jit(
        lambda o, s, x: kernels.bspline_basis(o, s, dims, x)
    )(origin_d, spacing_d, arrays.xyz)
    coeffs = jnp.zeros((n, *dims, 3), jnp.float32)
    alpha = jnp.float32(cfg.deformable_alpha)
    cw = float(n * cfg.landmarks_constraint_weight)
    total_links = int(np.prod(arrays.link_dst.shape))
    stride10k = max(total_links // 10000, 1)

    def scan_update_only(arrays, coeffs, basis, limit, alpha):
        def body(carry, _):
            c, xyz2 = carry
            a = kernels._dc.replace(arrays, xyz2=xyz2)
            cand, n_big, e = kernels.deformable_update(
                a, movable, c, basis, limit, alpha, cfg.inlier_threshold,
                cw, True, n, False,
            )
            return (cand, xyz2), e

        (_, _), es = jax.lax.scan(
            body, (coeffs, arrays.xyz2), jnp.arange(n_steps))
        return es

    def scan_update_apply(arrays, coeffs, basis, limit, alpha):
        def body(carry, _):
            c, xyz2 = carry
            a = kernels._dc.replace(arrays, xyz2=xyz2)
            cand, n_big, e = kernels.deformable_update(
                a, movable, c, basis, limit, alpha, cfg.inlier_threshold,
                cw, True, n, False,
            )
            xyz2 = kernels.bspline_apply_sep(cand, basis, arrays.xyz)
            return (cand, xyz2), e

        (_, _), es = jax.lax.scan(
            body, (coeffs, arrays.xyz2), jnp.arange(n_steps))
        return es

    def stage(stat_interval, em_stride):
        def f(arrays, coeffs, basis, limit, alpha):
            return kernels.deformable_stage(
                arrays, movable, coeffs, basis, limit, alpha,
                cfg.inlier_threshold, cw, True, True,
                n_steps, jnp.int32(0), jnp.int32(n_steps), stat_interval,
                cfg.em_max_iterations, cfg.em_epsilon, em_stride,
                None, 0, n, False,
            )[3]
        return f

    a = (arrays, coeffs, basis, limit, alpha)
    timeit(f"scan{n_steps} update only", jax.jit(scan_update_only), *a)
    timeit(f"scan{n_steps} update+apply", jax.jit(scan_update_apply), *a)
    timeit(f"stage{n_steps} no-EM (cond compiled, never fires)",
           jax.jit(stage(10 ** 9, 1)), *a)
    timeit(f"stage{n_steps} EM full every 10", jax.jit(stage(10, 1)), *a)
    timeit(f"stage{n_steps} EM stride={stride10k} every 10",
           jax.jit(stage(10, stride10k)), *a)

    # linear for completeness
    def lstage(stat_interval):
        def f(arrays):
            return kernels.linear_stage(
                arrays, movable, jnp.float32(cfg.linear_alpha),
                cfg.use_scale, n_steps, jnp.int32(0),
                jnp.int32(n_steps), stat_interval, cfg.em_max_iterations,
                cfg.em_epsilon, 1, None, 0,
            )[3]
        return f

    timeit(f"linear stage{n_steps} no-EM", jax.jit(lstage(10 ** 9)), arrays)
    timeit(f"linear stage{n_steps} EM every 10", jax.jit(lstage(10)), arrays)


if __name__ == "__main__":
    for name in sys.argv[1:] or ["topk", "insitu"]:
        print(f"==== section {name}", flush=True)
        try:
            {"topk": section_topk, "insitu": section_insitu}[name]()
        except Exception:
            traceback.print_exc()
