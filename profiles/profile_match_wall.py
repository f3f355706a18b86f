"""Attribute the match stage's WALL clock on the real TPU: file reads,
host stacking, upload, prep, kernel dispatches, readback, postprocess.

Needs a prior bench run's keypoints in /tmp/frog_bench_ref/tpu_out.
"""
import glob
import os
import re
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

from frog_tpu.io.keypoints import read_keypoints
from frog_tpu.ops import matcher as M

files = sorted(
    glob.glob("/tmp/frog_bench_ref/tpu_out/points*.csv.gz"),
    key=lambda f: int(re.search(r"points(\d+)", f).group(1)),
)
print(f"{len(files)} keypoint files", flush=True)

t0 = time.time()
from concurrent.futures import ThreadPoolExecutor

with ThreadPoolExecutor(max_workers=4) as pool:
    kps = list(pool.map(read_keypoints, files))
t_read = time.time() - t0
print(f"read: {t_read:.2f}s", flush=True)

params = M.MatchParams(max_distance=1.0, second_ratio=0.9)
n = len(kps)
pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]

for rep in range(2):
    label = "cold" if rep == 0 else "warm"
    t0 = time.time()
    n_max = max(len(kp) for kp in kps)
    pad = max(M._TILE, ((n_max + M._TILE - 1) // M._TILE) * M._TILE)
    stacked_np = {
        "desc": np.stack([M._pad_to(kp.desc.astype(np.float32), pad) for kp in kps]),
        "lapl": np.stack([M._pad_to(kp.laplacian.astype(np.float32), pad) for kp in kps]),
        "scale": np.stack([M._pad_to(kp.scale.astype(np.float32), pad, fill=1.0) for kp in kps]),
        "pos": np.stack([M._pad_to(kp.xyz.astype(np.float32), pad) for kp in kps]),
        "valid": np.stack([np.arange(pad) < len(kp) for kp in kps]),
    }
    t_stack = time.time() - t0

    t0 = time.time()
    stacked = {k: jnp.asarray(v) for k, v in stacked_np.items()}
    for v in stacked.values():
        v.block_until_ready()
    # force a real sync (remote backend returns at enqueue)
    _ = np.asarray(stacked["valid"][0][:1])
    t_upload = time.time() - t0
    nbytes = sum(v.nbytes for v in stacked_np.values())
    print(f"[{label}] stack {t_stack:.2f}s upload {t_upload:.2f}s"
          f" ({nbytes/1e6:.0f} MB host-side)", flush=True)

    t0 = time.time()
    q_aug, r_aug, ls = M._jit_prep_aug(
        stacked["desc"], stacked["lapl"], stacked["scale"], stacked["valid"]
    )
    _ = np.asarray(ls[0][:1])
    t_prep = time.time() - t0
    print(f"[{label}] prep_aug {t_prep:.2f}s", flush=True)

    # chunk dispatches
    t0 = time.time()
    acc_chunks, idx_chunks = [], []
    sr = jnp.asarray([[params.scale_ratio]], jnp.float32)
    c = M._PAIR_CHUNK
    for start in range(0, len(pairs), c):
        chunk = pairs[start:start + c]
        while len(chunk) < c:
            chunk = chunk + [chunk[-1]]
        ia = jnp.asarray([x[0] for x in chunk])
        ib = jnp.asarray([x[1] for x in chunk])
        d1, d2, i1, i2 = M._pallas_chunk_top2(
            q_aug[ib], ls[ib], r_aug[ia], ls[ia], sr
        )
        d1, d2, i1 = M._BATCHED_RESCORE_GATED(
            stacked["desc"][ib], stacked["lapl"][ib], stacked["scale"][ib],
            stacked["desc"][ia], stacked["lapl"][ia], stacked["scale"][ia],
            stacked["valid"][ia], i1, i2, d1, d2,
            jnp.float32(params.scale_ratio),
        )
        acc, idxn = M._accept_device(
            d1, d2, i1, jnp.float32(params.max_distance),
            jnp.float32(params.second_ratio), pad < 32768,
        )
        acc_chunks.append(acc)
        idx_chunks.append(idxn)
    acc_cat = jnp.concatenate(acc_chunks)
    idx_cat = jnp.concatenate(idx_chunks)
    _ = np.asarray(acc_cat[0, :1])  # sync: all dispatches done
    t_disp = time.time() - t0
    print(f"[{label}] dispatch+compute {t_disp:.2f}s"
          f" ({len(pairs)} pairs, {t_disp/len(pairs)*1000:.1f} ms/pair wall)",
          flush=True)

    t0 = time.time()
    acc_all = np.asarray(acc_cat)
    t_rb1 = time.time() - t0
    t0 = time.time()
    idx_all = np.asarray(idx_cat)
    t_rb2 = time.time() - t0
    print(f"[{label}] readback acc {acc_all.nbytes/1e6:.1f} MB {t_rb1:.2f}s"
          f" | idx {idx_all.nbytes/1e6:.1f} MB {t_rb2:.2f}s", flush=True)
