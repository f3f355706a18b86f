"""Attribute GroupRegistration.run()'s WALL clock at reference scale:
how much is stage scans vs reports/census/basis/host between-work.

Needs a prior bench run's pairs.bin in /tmp/frog_bench_ref/tpu_out.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from frog_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np

from frog_tpu.io.pairs import read_pairs
from frog_tpu.registration import GroupConfig, GroupRegistration
from frog_tpu.registration import group as G

graph = read_pairs("/tmp/frog_bench_ref/tpu_out/pairs.bin")

acc = {}
def wrap(obj, name, key=None):
    fn = getattr(obj, name)
    k = key or name
    def timed(*a, **kw):
        t0 = time.time()
        out = fn(*a, **kw)
        acc[k] = acc.get(k, 0.0) + (time.time() - t0)
        acc[k + "#"] = acc.get(k + "#", 0) + 1
        return out
    setattr(obj, name, timed)

wrap(GroupRegistration, "_run_linear")
wrap(GroupRegistration, "_run_level")
wrap(GroupRegistration, "_refresh_report")
wrap(GroupRegistration, "count_inliers")
wrap(GroupRegistration, "_record_chunk")
wrap(GroupRegistration, "_warm_stages")
wrap(GroupRegistration, "_bake_bspline")

_orig_basis = G._jit_basis
def timed_basis(*a, **kw):
    t0 = time.time()
    out = _orig_basis(*a, **kw)
    acc["_jit_basis"] = acc.get("_jit_basis", 0.0) + (time.time() - t0)
    acc["_jit_basis#"] = acc.get("_jit_basis#", 0) + 1
    return out
G._jit_basis = timed_basis

_orig_stage = G._jit_deformable_stage
def timed_stage(*a, **kw):
    t0 = time.time()
    out = _orig_stage(*a, **kw)
    acc["deform_dispatch"] = acc.get("deform_dispatch", 0.0) + (time.time() - t0)
    acc["deform_dispatch#"] = acc.get("deform_dispatch#", 0) + 1
    return out
G._jit_deformable_stage = timed_stage

cfg = GroupConfig(
    linear_iterations=50, deformable_levels=3, deformable_iterations=200,
    initial_grid_size=100.0, em_max_samples=10000, verbose=False,
)

for rep in range(2):
    for k in list(acc):
        acc[k] = 0 if k.endswith("#") else 0.0
    t0 = time.time()
    reg = GroupRegistration(graph, cfg)
    reg.run()
    total = time.time() - t0
    print(f"run{rep}: total {total:.2f}s  iters {len(reg.measures)}"
          f"  grids {reg.grids_per_level}", flush=True)
    for k in sorted(acc):
        if k.endswith("#"):
            continue
        print(f"  {k:18s} {acc[k]:7.2f}s  x{acc.get(k + '#', 0)}", flush=True)
