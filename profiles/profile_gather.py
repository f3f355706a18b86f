"""Microbenchmark: destination-position gather formulations on TPU.

Table: 80896 x 3 f32 positions; indices: (8,10112,8) int32 -> 647k rows.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
import jax, jax.numpy as jnp, numpy as np

N, P, K = 8, 10112, 8
rng = np.random.default_rng(0)
table = jnp.asarray(rng.normal(size=(N * P, 3)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, N * P, size=(N, P, K)).astype(np.int32))

def scan100(fn):
    def body(c, _):
        return fn(c), None
    def outer(t):
        out, _ = jax.lax.scan(body, t, None, length=100)
        return out
    return jax.jit(outer)

def timed(name, fn, arg):
    out = jax.block_until_ready(fn(arg))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(arg))
        ts.append(time.perf_counter() - t0)
    print(f"{name:46s} {min(ts)/100*1e3:8.3f} ms/iter")

# v0: current — rows of (NP,3)
def v0(t):
    g = t[idx]                      # (N,P,K,3)
    return t + 1e-9 * jnp.sum(g, axis=(0, 2)).reshape(-1, 3)[:t.shape[0] // (N*P//(N*P))] if False else t.at[0,0].add(1e-9*g.sum())
def v0b(t):
    g = t[idx]
    return t * (1.0 + 1e-12 * g.sum())
timed("v0 rows (NP,3) f32", scan100(v0b), table)

# v1: transposed (3, NP), gather on lanes
tableT = table.T.copy()
def v1(t):
    g = t[:, idx]                   # (3,N,P,K)
    return t * (1.0 + 1e-12 * g.sum())
timed("v1 lanes (3,NP) f32", scan100(v1), tableT)

# v2: jnp.take along axis 0 rows
def v2(t):
    g = jnp.take(t, idx, axis=0)
    return t * (1.0 + 1e-12 * g.sum())
timed("v2 take axis0 rows", scan100(v2), table)

# v3: width-padded table (NP, 128) — gather full tiles
table128 = jnp.zeros((N * P, 128), jnp.float32).at[:, :3].set(table)
def v3(t):
    g = t[idx[..., :1].squeeze(-1)]  # (N,P,128) only K=1 equivalent? no — do all K
    return t * (1.0 + 1e-12 * g.sum())
# proper: gather (N,P,K) rows of width 128 — 42x data, skip if slow
def v3b(t):
    g = t[idx]                      # (N,P,K,128)
    return t * (1.0 + 1e-12 * g.sum())
timed("v3 rows (NP,128) f32 (x42 data)", scan100(v3b), table128)

# v4: flat 1-D gathers, one per component (3 gathers of (NP,))
tx, ty, tz = table[:, 0].copy(), table[:, 1].copy(), table[:, 2].copy()
packed = jnp.stack([tx, ty, tz])
def v4(t):
    fi = idx.reshape(-1)
    gx = t[0][fi]; gy = t[1][fi]; gz = t[2][fi]
    return t * (1.0 + 1e-12 * (gx.sum() + gy.sum() + gz.sum()))
timed("v4 three 1-D gathers", scan100(v4), packed)

# v5: bf16 rows
table_bf = table.astype(jnp.bfloat16)
def v5(t):
    g = t[idx]
    return t * (1.0 + 1e-12 * g.astype(jnp.float32).sum()).astype(jnp.bfloat16)
timed("v5 rows (NP,3) bf16", scan100(v5), table_bf)

# v6: gather from (N, P, 3) with two-level index (img, pt)
table3 = table.reshape(N, P, 3)
img_i = (idx // P).astype(jnp.int32)
pt_i = (idx % P).astype(jnp.int32)
def v6(t):
    g = t[img_i, pt_i]
    return t * (1.0 + 1e-12 * g.sum())
timed("v6 two-level (N,P,3)", scan100(v6), table3)

# v7: sorted indices (coherence test)
idx_sorted = jnp.sort(idx.reshape(-1)).reshape(N, P, K)
def v7(t):
    g = t[idx_sorted]
    return t * (1.0 + 1e-12 * g.sum())
timed("v7 rows sorted idx", scan100(v7), table)

# v8: one-hot matmul gather per dst image block:
#     for each img j: onehot(pt within j) @ table[j]  — (NPK, P) too big; skip
# v9: packed width-4 rows (NP,4) — aligned power of two
table4 = jnp.zeros((N * P, 4), jnp.float32).at[:, :3].set(table)
def v9(t):
    g = t[idx]
    return t * (1.0 + 1e-12 * g.sum())
timed("v9 rows (NP,4) f32", scan100(v9), table4)

# v10: (NP, 8) width 8 = sublane tile row
table8 = jnp.zeros((N * P, 8), jnp.float32).at[:, :3].set(table)
def v10(t):
    g = t[idx]
    return t * (1.0 + 1e-12 * g.sum())
timed("v10 rows (NP,8) f32", scan100(v10), table8)
