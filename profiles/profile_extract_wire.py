"""Measure extraction wall time vs volume wire dtype (f32 vs f16 upload)
on the real TPU, plus the keypoint agreement between the two paths."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from frog_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np

WORK = "/tmp/frog_bench_ref"
vol_dir = os.path.join(WORK, "volumes_20x192")
files = sorted(os.path.join(vol_dir, f) for f in os.listdir(vol_dir))[:5]

from frog_tpu.io.keypoints import read_keypoints
from frog_tpu.ops.surf3d import SurfParams
from frog_tpu.pipeline import extract_stage

out = {}
for dtype in ("float32", "float16"):
    surf = SurfParams(spacing=2.0, n_points=20000, transfer_dtype=dtype)
    d = os.path.join(WORK, f"wire_{dtype}")
    os.makedirs(d, exist_ok=True)
    # warm pass (compile), then timed pass
    extract_stage(files[:1], surf, d, verbose=False)
    t0 = time.time()
    kpf = extract_stage(files, surf, d, verbose=False)
    dt = time.time() - t0
    print(f"{dtype}: {dt:.2f}s for {len(files)} volumes"
          f" ({dt / len(files):.2f}s/vol)", flush=True)
    out[dtype] = [read_keypoints(f) for f in kpf]

# agreement: fraction of f32 keypoints with an f16 keypoint within 1 voxel
for i in range(len(files)):
    a, b = out["float32"][i], out["float16"][i]
    from scipy.spatial import cKDTree
    d, j = cKDTree(b.xyz).query(a.xyz, k=1)
    ok = d < 2.0
    cos = np.sum(a.desc[ok] * b.desc[j[ok]], axis=1) / (
        np.linalg.norm(a.desc[ok], axis=1) * np.linalg.norm(b.desc[j[ok]], axis=1)
        + 1e-12)
    print(f"vol{i}: {ok.mean():.4f} matched <2mm, median pos err"
          f" {np.median(d[ok]):.4f} mm, median desc cos {np.median(cos):.5f}",
          flush=True)
