"""One-process deep profile on the real TPU: extraction per-phase
breakdown + register plumbing attribution, using cached bench fixtures."""
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
files = sorted(os.path.join(vol_dir, f) for f in os.listdir(vol_dir))[:4]

from frog_tpu.io.mhd import read_volume
from frog_tpu.ops.surf3d import SurfParams
from frog_tpu.ops.surf3d.extract import extract_keypoints_async, finalize_keypoints

surf = SurfParams(spacing=2.0, n_points=20000)
print("warming extraction...", flush=True)
t0 = time.time()
r = extract_keypoints_async(read_volume(files[0]), surf)
finalize_keypoints(*r)
print(f"extraction warm in {time.time() - t0:.1f}s", flush=True)

for f in files[1:4]:
    t0 = time.time(); vol = read_volume(f); t_read = time.time() - t0
    t0 = time.time()
    (header, desc), iso_origin, params = extract_keypoints_async(vol, surf)
    t_disp = time.time() - t0
    t0 = time.time(); header.block_until_ready(); desc.block_until_ready()
    t_compute = time.time() - t0
    t0 = time.time(); h = np.asarray(header); t_h = time.time() - t0
    t0 = time.time(); d = np.asarray(desc); t_d = time.time() - t0
    print(f"{os.path.basename(f)}: read {t_read:.2f} dispatch {t_disp:.2f}"
          f" compute {t_compute:.2f} header-rb {t_h:.2f} ({h.nbytes/1e6:.2f} MB)"
          f" desc-rb {t_d:.2f} ({d.nbytes/1e6:.2f} MB)", flush=True)

# ---- register with plumbing attribution
from frog_tpu.io.pairs import read_pairs
from frog_tpu.registration import GroupConfig, GroupRegistration
from frog_tpu.registration import group as G

graph = read_pairs(os.path.join(WORK, "tpu_out", "pairs.bin"))
cfg = GroupConfig(
    linear_iterations=50, deformable_levels=3, deformable_iterations=200,
    initial_grid_size=100.0, verbose=False,
)

acc = {}
def timed(obj, name):
    fn = getattr(obj, name)
    def wrap(*a, **k):
        t0 = time.time()
        out = fn(*a, **k)
        acc[name] = acc.get(name, 0.0) + (time.time() - t0)
        return out
    return wrap

print("register (compile + warm run)...", flush=True)
t0 = time.time()
reg = GroupRegistration(graph, cfg)
reg.run()
print(f"register first run {time.time() - t0:.1f}s", flush=True)

for trial in range(2):
    acc.clear()
    reg = GroupRegistration(graph, cfg)
    for name in ("_refresh_report", "_record_chunk", "_bake_bspline",
                 "_freeze_grid", "count_inliers", "_warm_stages"):
        setattr(reg, name, timed(reg, name))
    # module-level jitted helpers
    import functools
    orig_basis = G._jit_basis
    tb = [0.0]
    def basis_timer(*a, **k):
        t0 = time.time()
        out = orig_basis(*a, **k)
        out.block_until_ready() if hasattr(out, "block_until_ready") else None
        tb[0] += time.time() - t0
        return out
    G._jit_basis = basis_timer
    t0 = time.time()
    reg.run()
    total = time.time() - t0
    G._jit_basis = orig_basis
    print(f"warm register trial {trial}: total {total:.2f}s, basis {tb[0]:.2f}s, "
          + ", ".join(f"{k} {v:.2f}s" for k, v in sorted(acc.items())),
          flush=True)
