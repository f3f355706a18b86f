"""Real-TPU breakdown of the warm match and register stages at reference
scale, using the cached bench fixtures (/tmp/frog_bench_ref)."""
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
OUT = os.path.join(WORK, "tpu_out")
kp_files = sorted(
    (os.path.join(OUT, f) for f in os.listdir(OUT)
     if f.startswith("points") and f.endswith(".csv.gz")),
    key=lambda p: int("".join(ch for ch in os.path.basename(p) if ch.isdigit())),
)
print(f"{len(kp_files)} keypoint files", flush=True)

from frog_tpu.io.keypoints import read_keypoints
from frog_tpu.io.pairs import read_pairs
from frog_tpu.ops.matcher import MatchParams, match_graph
from frog_tpu.pipeline import match_stage

params = MatchParams(max_distance=1.0, second_ratio=0.9)

# ---- match stage, instrumented
for trial in range(2):
    t0 = time.time()
    kps = []
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=4) as pool:
        kps = list(pool.map(read_keypoints, kp_files))
    t_read = time.time() - t0

    t0 = time.time()
    graph = match_graph(kps, params)
    t_dev = time.time() - t0

    t0 = time.time()
    from frog_tpu.io.pairs import write_pairs
    write_pairs(os.path.join(WORK, "prof_pairs.bin"), graph)
    t_write = time.time() - t0
    print(f"match trial {trial}: read {t_read:.2f}s device+host {t_dev:.2f}s"
          f" write {t_write:.2f}s total {t_read + t_dev + t_write:.2f}s",
          flush=True)

# ---- full match_stage for comparison
t0 = time.time()
match_stage(kp_files, params, out_file=os.path.join(WORK, "prof_pairs.bin"),
            verbose=False)
print(f"match_stage total: {time.time() - t0:.2f}s", flush=True)

# ---- register, per-phase
from frog_tpu.registration import GroupConfig, GroupRegistration

graph = read_pairs(os.path.join(OUT, "pairs.bin"))
cfg = GroupConfig(
    linear_iterations=50, deformable_levels=3, deformable_iterations=200,
    initial_grid_size=100.0, verbose=False,
)
for trial in range(2):
    t0 = time.time()
    reg = GroupRegistration(graph, cfg)
    t_init = time.time() - t0
    t0 = time.time()
    reg.run()
    t_run = time.time() - t0
    print(f"register trial {trial}: init {t_init:.2f}s run {t_run:.2f}s"
          f" ({len(reg.measures)} iters)", flush=True)
    if os.environ.get("FROG_PROF_ONE_REG"):
        break
