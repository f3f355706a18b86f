"""Benchmark: the REFERENCE-DEFAULT workload, full pipeline, TPU vs
reference-equivalent C++ baselines on this machine's CPUs.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (reference defaults, imageGroup.h:52-82 / params.sh:12-14):
N_IMAGES synthetic CT-like volumes (one band-limited texture observed
through per-image smooth warps + translations, 192^3 voxels at 2 mm =
reference-like ~384 mm bbox), 20k keypoints/volume, 48-d descriptors:

  extract   3D-SURF keypoints per volume           (surf3d)
  match     all-pairs brute-force descriptor match (match)
  register  50 linear + 3 levels x 200 deformable iterations,
            grids 100 -> 50 -> 25 mm, diffeo guarantee ON  (frog)

value        = end-to-end WARM TPU seconds (extract + match + register,
               post-compile; cold timings incl. compile go to stderr)
vs_baseline  = cpu_seconds / tpu_seconds from the reference-equivalent
               C++ implementations (native/baseline_*, same algorithms,
               OpenMP over this machine's cores; extraction and matching
               measured on subsets and scaled, the optimizer extrapolated
               from short runs at each level's true grid dims)

Sub-metrics and quality gates (E decrease, inlier census) go to stderr.
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

N_IMAGES = int(os.environ.get("FROG_BENCH_IMAGES", 20))
N_POINTS = int(os.environ.get("FROG_BENCH_POINTS", 20000))
SHAPE = int(os.environ.get("FROG_BENCH_SHAPE", 192))
SPACING = float(os.environ.get("FROG_BENCH_SPACING", 2.0))
LINEAR_ITERS = int(os.environ.get("FROG_BENCH_LINEAR", 50))
DEFORM_ITERS = int(os.environ.get("FROG_BENCH_DEFORM", 200))
LEVELS = int(os.environ.get("FROG_BENCH_LEVELS", 3))
GRID_SIZE = float(os.environ.get("FROG_BENCH_GRID", 100.0))
MAX_DISTANCE = float(os.environ.get("FROG_BENCH_DIST", 1.0))
SECOND_RATIO = float(os.environ.get("FROG_BENCH_RATIO", 0.9))
CPP_PAIRS = int(os.environ.get("FROG_BENCH_CPP_PAIRS", 3))
CPP_EXTRACTS = int(os.environ.get("FROG_BENCH_CPP_EXTRACTS", 2))
CPP_LIN_ITERS = int(os.environ.get("FROG_BENCH_CPP_LIN", 10))
CPP_DEF_ITERS = int(os.environ.get("FROG_BENCH_CPP_DEF", 10))
WORKDIR = os.environ.get("FROG_BENCH_DIR", "/tmp/frog_bench_ref")

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ensure_binaries():
    for name in ("baseline_frog", "baseline_match", "baseline_extract"):
        path = os.path.join(ROOT, "native", name)
        src = path + ".cpp"
        if os.path.exists(path) and os.path.getmtime(path) >= os.path.getmtime(src):
            continue
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-o", path, src, "-lm"],
            check=True,
        )


def build_volumes():
    from tests.synthetic import make_synthetic_volumes

    t0 = time.time()
    files = make_synthetic_volumes(
        os.path.join(WORKDIR, f"volumes_{N_IMAGES}x{SHAPE}"),
        n_images=N_IMAGES,
        shape=(SHAPE,) * 3,
        spacing=SPACING,
        seed=17,
    )
    log(f"fixture: {N_IMAGES} volumes ({SHAPE}^3 @ {SPACING} mm)"
        f" in {time.time() - t0:.1f}s (cached across runs)")
    return files


# --------------------------------------------------------------------- TPU

def run_tpu(volumes):
    import jax

    from frog_tpu.io.keypoints import read_keypoints
    from frog_tpu.ops.matcher import MatchParams
    from frog_tpu.ops.surf3d import SurfParams
    from frog_tpu.pipeline import extract_stage, match_stage
    from frog_tpu.registration import GroupConfig, GroupRegistration

    out_dir = os.path.join(WORKDIR, "tpu_out")
    os.makedirs(out_dir, exist_ok=True)
    surf = SurfParams(spacing=SPACING, threshold=0.0, n_points=N_POINTS)

    # ---- extract (cold = includes the one compile; warm = re-run subset)
    from frog_tpu.ops.matcher import warm_matcher

    warm_matcher(N_POINTS)  # matcher compiles overlap extraction
    t0 = time.time()
    kp_files = extract_stage(volumes, surf, out_dir, verbose=False)
    t_extract_cold = time.time() - t0
    n_warm = min(3, len(volumes))
    warm_dir = os.path.join(WORKDIR, "tpu_warm")
    os.makedirs(warm_dir, exist_ok=True)
    t0 = time.time()
    extract_stage(volumes[:n_warm], surf, warm_dir, verbose=False)
    t_extract = (time.time() - t0) / n_warm * N_IMAGES
    log(f"TPU extract: cold {t_extract_cold:.1f}s for {N_IMAGES} volumes,"
        f" warm {t_extract:.1f}s ({t_extract / N_IMAGES:.2f}s/volume)")

    # ---- match
    params = MatchParams(max_distance=MAX_DISTANCE, second_ratio=SECOND_RATIO)
    pairs_file = os.path.join(out_dir, "pairs.bin")
    t0 = time.time()
    graph = match_stage(kp_files, params, out_file=pairs_file, verbose=False)
    t_match_cold = time.time() - t0
    t0 = time.time()
    graph = match_stage(kp_files, params, out_file=pairs_file, verbose=False)
    t_match = time.time() - t0
    n_pairs = N_IMAGES * (N_IMAGES - 1) // 2
    log(f"TPU match: cold {t_match_cold:.1f}s, warm {t_match:.1f}s"
        f" ({n_pairs} pairs, {graph.n_matches} matches)")

    # ---- register
    cfg = GroupConfig(
        linear_iterations=LINEAR_ITERS,
        deformable_levels=LEVELS,
        deformable_iterations=DEFORM_ITERS,
        initial_grid_size=GRID_SIZE,
        # the reference's EM always subsamples to a 10k buffer
        # (stats.cxx:10, stats.h:36-76); match its default workload
        # instead of running full-sample EM (strictly more work)
        em_max_samples=10000,
        verbose=False,
    )
    t0 = time.time()
    reg = GroupRegistration(graph, cfg)
    reg.run()
    t_reg_cold = time.time() - t0
    t0 = time.time()
    reg = GroupRegistration(graph, cfg)
    reg.run()
    t_reg = time.time() - t0
    es = [m.E for m in reg.measures]
    n_iters = len(es)
    log(f"TPU register: cold {t_reg_cold:.1f}s, warm {t_reg:.1f}s"
        f" ({n_iters} iters, {n_iters / t_reg:.1f} iters/s,"
        f" grids/level {reg.grids_per_level})")
    log(f"quality: E {es[0]:.3f} -> {es[LINEAR_ITERS - 1]:.3f} (linear)"
        f" -> {es[-1]:.3f} (deformable); outliers"
        f" {100 * reg.stats_record['outlierRatio']:.1f}%")
    assert es[-1] < es[0], "energy must decrease"

    cold = {
        "extract": t_extract_cold,
        "match": t_match_cold,
        "register": t_reg_cold,
    }
    warm = {"extract": t_extract, "match": t_match, "register": t_reg}
    return graph, kp_files, warm, cold


# --------------------------------------------------------------------- CPU

def cpu_extract(volumes):
    from frog_tpu.io.mhd import read_volume

    total = 0.0
    for f in volumes[:CPP_EXTRACTS]:
        vol = read_volume(f)
        raw = os.path.join(WORKDIR, "cpp_vol.raw")
        with open(raw, "wb") as fh:
            np.asarray(vol.data.shape, np.int32).tofile(fh)
            np.asarray(vol.spacing, np.float32).tofile(fh)
            vol.data.astype(np.float32).tofile(fh)
        out = subprocess.run(
            [os.path.join(ROOT, "native", "baseline_extract"), raw,
             str(SPACING), str(N_POINTS)],
            capture_output=True, text=True, check=True,
        )
        total += json.loads(out.stdout)["total_s"]
    per_vol = total / CPP_EXTRACTS
    t = per_vol * N_IMAGES
    log(f"CPU extract: {per_vol:.1f}s/volume x {N_IMAGES} = {t:.1f}s"
        f" (measured on {CPP_EXTRACTS})")
    return t


def cpu_match(kp_files):
    from frog_tpu.io.keypoints import read_keypoints

    kps = [read_keypoints(f) for f in kp_files[: CPP_PAIRS + 1]]
    p = min(len(k) for k in kps)
    match_file = os.path.join(WORKDIR, "cpp_desc.bin")
    with open(match_file, "wb") as f:
        np.asarray([len(kps), p, 48], np.int32).tofile(f)
        for kp in kps:
            kp.to_matrix()[:p].astype(np.float32).tofile(f)
    out = subprocess.run(
        [os.path.join(ROOT, "native", "baseline_match"), match_file,
         str(CPP_PAIRS), str(MAX_DISTANCE), str(SECOND_RATIO)],
        capture_output=True, text=True, check=True,
    )
    m = json.loads(out.stdout)
    n_pairs = N_IMAGES * (N_IMAGES - 1) // 2
    t = m["secsPerPair"] * n_pairs
    log(f"CPU match: {m['secsPerPair']:.2f}s/pair x {n_pairs} = {t:.1f}s"
        f" ({m['threads']} threads)")
    return t


def cpu_register(pairs_file):
    """Extrapolate per-iteration cost from short runs: the baseline runs
    CPP_LIN_ITERS linear and CPP_DEF_ITERS deformable iterations per
    level at the TRUE level grid dims (3-level schedule), scaled to the
    full 50 + 3x200 iteration counts.  EM cost scales with its every-10
    cadence."""
    bin_path = os.path.join(ROOT, "native", "baseline_frog")
    out = subprocess.run(
        [bin_path, pairs_file, str(CPP_LIN_ITERS), str(CPP_DEF_ITERS),
         str(GRID_SIZE), "10000", "", str(LEVELS), "0", "0.4", "0", "0.02"],
        capture_output=True, text=True, check=True,
    )
    r = json.loads(out.stdout)
    lin_per = r["linear_s"] / max(r["linear_iters"], 1)
    def_per = r["deform_s"] / max(r["deform_iters"], 1)
    # stats fired ceil(iters/10) times per stage in the short run
    n_em_short = -(-CPP_LIN_ITERS // 10) + LEVELS * -(-CPP_DEF_ITERS // 10)
    n_em_full = -(-LINEAR_ITERS // 10) + LEVELS * -(-DEFORM_ITERS // 10)
    em_per = r["stats_s"] / max(n_em_short, 1)
    t = (lin_per * LINEAR_ITERS + def_per * LEVELS * DEFORM_ITERS
         + em_per * n_em_full)
    log(f"CPU register: {lin_per * 1e3:.0f} ms/linear-iter,"
        f" {def_per * 1e3:.0f} ms/deformable-iter, {em_per * 1e3:.0f} ms/EM"
        f" -> {t:.1f}s extrapolated ({r['threads']} threads,"
        f" measured {CPP_LIN_ITERS}+{LEVELS}x{CPP_DEF_ITERS} iters)")
    return t


def main():
    ensure_binaries()
    os.makedirs(WORKDIR, exist_ok=True)
    volumes = build_volumes()
    graph, kp_files, warm, cold = run_tpu(volumes)

    pairs_file = os.path.join(WORKDIR, "tpu_out", "pairs.bin")
    cpu = {
        "extract": cpu_extract(volumes),
        "match": cpu_match(kp_files),
        "register": cpu_register(pairs_file),
    }

    tpu_total = sum(warm.values())
    tpu_cold = sum(cold.values())
    cpu_total = sum(cpu.values())
    for stage in ("extract", "match", "register"):
        log(f"  {stage:9s}: TPU {warm[stage]:7.1f}s (cold {cold[stage]:7.1f}s)"
            f"  CPU {cpu[stage]:8.1f}s  -> {cpu[stage] / warm[stage]:6.1f}x")
    log(f"TPU total {tpu_total:.1f}s warm / {tpu_cold:.1f}s cold vs"
        f" CPU-reference {cpu_total:.1f}s -> {cpu_total / tpu_total:.2f}x warm,"
        f" {cpu_total / tpu_cold:.2f}x cold")
    result = {
        "metric": f"ref_pipeline_{N_IMAGES}x{N_POINTS // 1000}k"
                  f"_{LEVELS}lvl_wallclock",
        "value": round(tpu_total, 3),
        "unit": "s",
        "vs_baseline": round(cpu_total / tpu_total, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
