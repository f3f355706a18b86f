"""Benchmark: groupwise registration throughput, TPU vs reference-equivalent CPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (fixed standard config, FROG-like defaults scaled to a bench
budget): N_IMAGES synthetic volumes' keypoint sets (P points, 48-d unit
descriptors with planted correspondences + deformation), full pipeline
minus extraction: all-pairs descriptor matching, then groupwise linear
(50 iters) + one deformable level (100 iters, grid 100 mm).

value        = end-to-end TPU seconds for match + optimize (post-compile)
vs_baseline  = cpu_seconds / tpu_seconds, where cpu_seconds comes from the
               reference-equivalent C++ implementation (native/baseline_*,
               same algorithms, OpenMP over this machine's cores; matching
               extrapolated from a pair subset)

Sub-metrics go to stderr.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

# Persistent compilation cache: warm-up compiles (which can take many
# minutes through the remote-compile service) are reused across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

N_IMAGES = int(os.environ.get("FROG_BENCH_IMAGES", 8))
N_POINTS = int(os.environ.get("FROG_BENCH_POINTS", 10000))
LINEAR_ITERS = int(os.environ.get("FROG_BENCH_LINEAR", 50))
DEFORM_ITERS = int(os.environ.get("FROG_BENCH_DEFORM", 100))
GRID_SIZE = 100.0
CPP_MATCH_PAIRS = int(os.environ.get("FROG_BENCH_CPP_PAIRS", 3))

ROOT = os.path.dirname(os.path.abspath(__file__))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_keypoints(rng, truth_cloud, inv_fn):
    from frog_tpu.io.keypoints import Keypoints

    n = truth_cloud.shape[0]
    desc = rng.normal(size=(n, 48)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    return desc, Keypoints(
        xyz=inv_fn(truth_cloud).astype(np.float32),
        scale=rng.uniform(1.0, 2.0, n).astype(np.float32),
        laplacian=rng.choice([-1.0, 1.0], n).astype(np.float32),
        response=rng.uniform(0, 1, n).astype(np.float32),
        desc=desc,
    )


def build_workload():
    sys.path.insert(0, ROOT)
    from frog_tpu.io.keypoints import Keypoints
    from tests.synthetic import make_synthetic_group

    graph, truth = make_synthetic_group(
        seed=42,
        n_images=N_IMAGES,
        n_points=N_POINTS,
        extent=350.0,
        warp_amp=8.0,
        noise=0.5,
        outlier_fraction=0.0,
        match_fraction=1.0,
    )
    rng = np.random.default_rng(7)
    base_desc = rng.normal(size=(N_POINTS, 48)).astype(np.float32)
    base_desc /= np.linalg.norm(base_desc, axis=1, keepdims=True)
    base_scale = rng.uniform(1.0, 2.0, N_POINTS).astype(np.float32)
    base_lapl = rng.choice([-1.0, 1.0], N_POINTS).astype(np.float32)
    kps = []
    for i in range(N_IMAGES):
        desc = base_desc + rng.normal(scale=0.05, size=base_desc.shape).astype(
            np.float32
        )
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)
        kps.append(
            Keypoints(
                xyz=graph.images[i].xyz,
                scale=base_scale.copy(),
                laplacian=base_lapl.copy(),
                response=rng.uniform(0, 1, N_POINTS).astype(np.float32),
                desc=desc,
            )
        )
    return kps


def run_tpu(kps, workdir):
    import jax

    from frog_tpu.ops.matcher import MatchParams, match_graph, match_pair
    from frog_tpu.registration import GroupConfig, GroupRegistration

    params = MatchParams(max_distance=1e10, second_ratio=0.95)

    # warm-up compile at the EXACT workload shapes (the stacked prep and
    # gathers specialize on the image count, not just the pad size)
    t0 = time.time()
    match_graph(kps, params)
    log(f"match compile+first full pass: {time.time() - t0:.1f}s")

    t0 = time.time()
    graph = match_graph(kps, params)
    jax.effects_barrier()
    t_match = time.time() - t0
    n_pairs = N_IMAGES * (N_IMAGES - 1) // 2
    log(
        f"TPU match: {n_pairs} pairs in {t_match:.2f}s"
        f" ({n_pairs / t_match:.2f} pairs/s), {graph.n_matches} matches"
    )

    cfg = GroupConfig(
        linear_iterations=LINEAR_ITERS,
        deformable_levels=1,
        deformable_iterations=DEFORM_ITERS,
        initial_grid_size=GRID_SIZE,
        verbose=False,
    )
    # Warm-up run for compile at the EXACT static stage shapes of the timed
    # run (each stage is one fused scan whose length is the stage's full
    # iteration count, so the warm config must equal the real one).
    t0 = time.time()
    GroupRegistration(graph, cfg).run()
    log(f"optimizer compile+warmup: {time.time() - t0:.1f}s")

    t0 = time.time()
    reg = GroupRegistration(graph, cfg)
    reg.run()
    t_opt = time.time() - t0
    iters = LINEAR_ITERS + DEFORM_ITERS
    log(
        f"TPU optimize: {iters} iters in {t_opt:.2f}s"
        f" ({iters / t_opt:.1f} iters/s), final E={reg.measures[-1].E:.3f}"
    )
    return graph, t_match, t_opt


def run_cpu_baseline(kps, graph, workdir):
    from frog_tpu.io.pairs import write_pairs

    # matching baseline (subset, extrapolated)
    match_file = os.path.join(workdir, "bench_desc.bin")
    with open(match_file, "wb") as f:
        np.asarray([N_IMAGES, N_POINTS, 48], np.int32).tofile(f)
        for kp in kps:
            kp.to_matrix().astype(np.float32).tofile(f)
    out = subprocess.run(
        [
            os.path.join(ROOT, "native", "baseline_match"),
            match_file,
            str(CPP_MATCH_PAIRS),
            "1e10",
            "0.95",
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    m = json.loads(out.stdout)
    n_pairs = N_IMAGES * (N_IMAGES - 1) // 2
    t_match_cpu = m["secsPerPair"] * n_pairs
    log(
        f"CPU match: {m['secsPerPair']:.2f}s/pair x {n_pairs} pairs ="
        f" {t_match_cpu:.1f}s ({m['threads']} threads)"
    )

    pairs_file = os.path.join(workdir, "bench_pairs.bin")
    write_pairs(pairs_file, graph)
    out = subprocess.run(
        [
            os.path.join(ROOT, "native", "baseline_frog"),
            pairs_file,
            str(LINEAR_ITERS),
            str(DEFORM_ITERS),
            str(GRID_SIZE),
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    r = json.loads(out.stdout)
    t_opt_cpu = r["stats_s"] + r["linear_s"] + r["deform_s"]
    log(
        f"CPU optimize: {t_opt_cpu:.1f}s (stats {r['stats_s']:.1f} + linear"
        f" {r['linear_s']:.1f} + deform {r['deform_s']:.1f}), {r['threads']} threads"
    )
    return t_match_cpu, t_opt_cpu


def ensure_binaries():
    for name in ("baseline_frog", "baseline_match"):
        path = os.path.join(ROOT, "native", name)
        if not os.path.exists(path):
            subprocess.run(
                [
                    "g++",
                    "-O3",
                    "-march=native",
                    "-fopenmp",
                    "-o",
                    path,
                    path + ".cpp",
                    "-lm",
                ],
                check=True,
            )


def main():
    ensure_binaries()
    workdir = "/tmp/frog_bench"
    os.makedirs(workdir, exist_ok=True)
    log(f"workload: {N_IMAGES} images x {N_POINTS} points, 48-d descriptors")
    kps = build_workload()
    graph, t_match, t_opt = run_tpu(kps, workdir)
    t_match_cpu, t_opt_cpu = run_cpu_baseline(kps, graph, workdir)

    tpu_total = t_match + t_opt
    cpu_total = t_match_cpu + t_opt_cpu
    result = {
        "metric": "groupwise_registration_wallclock_8x10k",
        "value": round(tpu_total, 3),
        "unit": "s",
        "vs_baseline": round(cpu_total / tpu_total, 3),
    }
    log(
        f"TPU total {tpu_total:.2f}s vs CPU-reference total {cpu_total:.2f}s"
        f" -> speedup {cpu_total / tpu_total:.2f}x"
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
