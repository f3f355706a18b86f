"""Wall-clock breakdown of GroupRegistration.run() on the bench workload."""
import os
import sys
import time
import cProfile, pstats

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tests.synthetic import make_synthetic_group
from frog_tpu.registration import GroupConfig, GroupRegistration

graph, _ = make_synthetic_group(
    seed=42, n_images=8, n_points=10000, extent=350.0,
    warp_amp=8.0, noise=0.5, outlier_fraction=0.0, match_fraction=1.0,
)
cfg = GroupConfig(
    linear_iterations=50, deformable_levels=1, deformable_iterations=100,
    initial_grid_size=100.0, verbose=False,
)
# warm
t0 = time.time(); GroupRegistration(graph, cfg).run()
print(f"warm run: {time.time()-t0:.2f}s", file=sys.stderr)

t0 = time.time()
reg = GroupRegistration(graph, cfg)
t1 = time.time()
reg.run()
t2 = time.time()
print(f"construct: {t1-t0:.3f}s  run: {t2-t1:.3f}s", file=sys.stderr)

pr = cProfile.Profile()
pr.enable()
reg = GroupRegistration(graph, cfg)
reg.run()
pr.disable()
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(35)
