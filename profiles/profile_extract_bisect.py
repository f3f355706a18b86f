"""Bisect the fused extraction kernel's device time on the real TPU:
resample, detect, NMS, top-k, descriptors — each timed as its own jit at
the bench shapes (192^3 @ 2 mm -> 192^3 bucket)."""
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from frog_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

WORK = "/tmp/frog_bench_ref"
vol_dir = os.path.join(WORK, "volumes_20x192")
files = sorted(os.path.join(vol_dir, f) for f in os.listdir(vol_dir))[:2]

from frog_tpu.io.mhd import read_volume
from frog_tpu.ops.surf3d import SurfParams
from frog_tpu.ops.surf3d.detector import detect, non_max_mask, scale_stack_sizes
from frog_tpu.ops.surf3d.resample import resample_to_device

surf = SurfParams(spacing=2.0, n_points=20000)
vol = read_volume(files[0])
lobes = tuple(scale_stack_sizes(surf.n_octaves))
print(f"lobes: {lobes}", flush=True)

data, extent, origin = resample_to_device(vol, surf.spacing)
data.block_until_ready()
print(f"volume on device: {data.shape}", flush=True)


def sync(out):
    # axon's block_until_ready returns at remote-enqueue time; the only
    # true barrier is a readback, so pull 8 floats of every output
    for x in jax.tree_util.tree_leaves(out):
        if hasattr(x, "ravel"):
            np.asarray(x.ravel()[:8])


def bench(name, fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        sync(out)
    print(f"{name}: {(time.time() - t0) / reps * 1e3:.1f} ms", flush=True)
    return out


# 1. resample (re-run; includes upload)
def resample_once():
    d, _, _ = resample_to_device(vol, surf.spacing)
    return d
bench("resample+upload", resample_once)

# 2. detect
jit_detect = jax.jit(lambda d: detect(d, lobes))
responses, laps = bench("detect (responses+laps)", jit_detect, data)

# 3. NMS
jit_nms = jax.jit(lambda r: non_max_mask(r, 0.0))
peaks = bench("non_max_mask", jit_nms, responses)

# 4. top-k over masked responses: full sort vs TPU partial reduction
@jax.jit
def topk(r, p):
    flat = jnp.where(p, r, -jnp.inf).reshape(-1)
    return jax.lax.top_k(flat, 20000)
tv, ti = bench("where+top_k(50M -> 20k)", topk, responses, peaks)

@jax.jit
def topk_approx(r, p):
    flat = jnp.where(p, r, -jnp.inf).reshape(-1)
    return jax.lax.approx_max_k(flat, 20000, recall_target=0.999)
tva, tia = bench("where+approx_max_k(50M -> 20k)", topk_approx, responses, peaks)
overlap = np.intersect1d(np.asarray(ti), np.asarray(tia)).size / 20000
print(f"approx vs exact top-k overlap: {overlap:.4f}", flush=True)

# 5. descriptors at 20k points
from frog_tpu.ops.surf3d.descriptor import descriptors_dense
s_shape = responses.shape
sx = s_shape[1] * s_shape[2] * s_shape[3]
s_idx = ti // sx
rem = ti % sx
vx = rem // (s_shape[2] * s_shape[3])
vy = (rem % (s_shape[2] * s_shape[3])) // s_shape[3]
vz = rem % s_shape[3]
pos = jnp.stack([vx, vy, vz], 1).astype(jnp.float32)
sigma = 1.2 * (3.0 * jnp.asarray(lobes, jnp.float32)[s_idx]) / 9.0
jit_desc = jax.jit(lambda d, p, s, si: descriptors_dense(d, p, s, si, lobes))
bench("descriptors_dense(20k)", jit_desc, data, pos, sigma, s_idx)

# 6. the full fused kernel for reference
from frog_tpu.ops.surf3d.extract import extract_keypoints_async
def full():
    (h, d), _, _ = extract_keypoints_async(vol, surf)
    return h, d
bench("full fused extract (incl upload)", full)
