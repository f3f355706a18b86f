"""Sweep the strided block-top-2 reduction factor feeding the detector's
top-k (ops/surf3d/extract.py::_detect_topk).

The NMS leaves ~35k finite candidates in a ~50M-slot response stack; the
top-k pays for sorting whatever the block reduction leaves.  Block B
keeps the top-2 of each of the n/B strided blocks (loss needs >= 3 of
the true top-k in one block: expected events ~ (k*B/n)^3/6 * n/B), so
larger B trades a vanishing recall loss for a B/16-fold smaller sort.

Usage: python profiles/profile_topk_blocks.py  (real TPU)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from frog_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

S, X = 7, 192
N = S * X * X * X
K = 20000
rng = np.random.default_rng(0)
# ~35k finite candidates, like the NMS output
resp = np.full(N, -np.inf, np.float32)
idx = rng.choice(N, size=35000, replace=False)
resp[idx] = rng.gamma(2.0, 1.0, size=35000).astype(np.float32)
resp_d = jnp.asarray(resp)

exact = np.sort(resp[idx])[::-1][:K]
thresh = exact[-1]
true_top = set(np.flatnonzero(resp >= thresh))


@partial(jax.jit, static_argnames=("b", "approx"))
def topk_blocks(flat, b, approx):
    blocks = flat.reshape(b, -1)
    ncol = blocks.shape[1]
    a1 = jnp.argmax(blocks, axis=0)
    m1 = jnp.max(blocks, axis=0)
    masked = jnp.where(jnp.arange(b)[:, None] == a1[None, :], -jnp.inf, blocks)
    a2 = jnp.argmax(masked, axis=0)
    m2 = jnp.max(masked, axis=0)
    vals = jnp.concatenate([m1, m2])
    rows = jnp.concatenate([a1, a2]).astype(jnp.int32)
    if approx:
        tv, bi = jax.lax.approx_max_k(vals, K, recall_target=0.999)
    else:
        tv, bi = jax.lax.top_k(vals, K)
    ti = rows[bi] * ncol + bi % ncol
    return tv, ti


def bench(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


for b in (16, 32, 64, 128):
    for approx in (True, False):
        try:
            ms = bench(topk_blocks, resp_d, b, approx)
            tv, ti = topk_blocks(resp_d, b, approx)
            got = set(np.asarray(ti)[np.isfinite(np.asarray(tv))].tolist())
            overlap = len(got & true_top) / K
            print(f"b={b:4d} approx={approx}: {ms:7.2f} ms  overlap {overlap:.5f}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"b={b:4d} approx={approx}: FAILED {type(e).__name__}: {e}",
                  flush=True)
