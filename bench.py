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
               are medians of 3 interleaved subset measurements with the
               spread reported, the optimizer a FULL measured run of the
               whole 50 + levels x 200 schedule)

Sub-metrics and quality gates go to stderr, including ground-truth
accuracy: the synthetic fixture's warps are known, so the bench samples
GT correspondence sets and reports mean/max TRE (the paper's landmark
metric, imageGroup.cxx:1229-1282) after linear and after deformable for
BOTH the TPU pipeline and the C++ baseline, plus an E-trajectory parity
check between the two optimizers at reference scale.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

# Persistent compilation cache: warm-up compiles (which can take many
# minutes through the remote-compile service) are reused across runs.
# Must be set via jax.config (NOT the env var): this container's
# sitecustomize imports jax before any user code, so env vars set here
# are read too late (utils/cache.py).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

from frog_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

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
REPEATS = max(1, int(os.environ.get("FROG_BENCH_REPEATS", 3)))
# table-stride EM parity: C++ oracle mirrors the TPU's EM subsample so
# the diffeomorphism-guard schedules must agree decision-for-decision
EM_TABLE_PARITY = os.environ.get("FROG_BENCH_EM_TABLE", "1") != "0"
SWEEP_SEEDS = int(os.environ.get("FROG_BENCH_SWEEP", 3))
CPP_PAIRS = int(os.environ.get("FROG_BENCH_CPP_PAIRS", 3))
CPP_EXTRACTS = int(os.environ.get("FROG_BENCH_CPP_EXTRACTS", 2))
CPP_LIN_ITERS = int(os.environ.get("FROG_BENCH_CPP_LIN", 10))
CPP_DEF_ITERS = int(os.environ.get("FROG_BENCH_CPP_DEF", 10))
WORKDIR = os.environ.get("FROG_BENCH_DIR", "/tmp/frog_bench_ref")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _spread(vals):
    return (max(vals) - min(vals)) / 2.0


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
    files, truths = make_synthetic_volumes(
        os.path.join(WORKDIR, f"volumes_{N_IMAGES}x{SHAPE}"),
        n_images=N_IMAGES,
        shape=(SHAPE,) * 3,
        spacing=SPACING,
        seed=17,
        return_truth=True,
    )
    log(f"fixture: {N_IMAGES} volumes ({SHAPE}^3 @ {SPACING} mm)"
        f" in {time.time() - t0:.1f}s (cached across runs)")
    return files, truths


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

    # ---- extract (cold = includes the one compile; warm = REPEATED
    # subset re-runs, median +- spread: the chip and its compile service
    # are shared, so a single contended measurement must not smear the
    # round's record — the JSON value is the median of 3)
    from frog_tpu.ops.matcher import warm_matcher

    warm_matcher(N_POINTS)  # matcher compiles overlap extraction
    t0 = time.time()
    kp_files = extract_stage(volumes, surf, out_dir, verbose=False)
    t_extract_cold = time.time() - t0
    n_warm = min(6, len(volumes))  # enough volumes to amortize pipeline fill
    warm_dir = os.path.join(WORKDIR, "tpu_warm")
    os.makedirs(warm_dir, exist_ok=True)
    ex_reps = []
    for _ in range(REPEATS):
        t0 = time.time()
        extract_stage(volumes[:n_warm], surf, warm_dir, verbose=False)
        ex_reps.append((time.time() - t0) / n_warm * N_IMAGES)
    t_extract = float(np.median(ex_reps))
    log(f"TPU extract: cold {t_extract_cold:.1f}s for {N_IMAGES} volumes,"
        f" warm {t_extract:.1f}s +- {_spread(ex_reps):.1f}s over {REPEATS}"
        f" ({t_extract / N_IMAGES:.2f}s/volume)")

    # ---- match
    params = MatchParams(max_distance=MAX_DISTANCE, second_ratio=SECOND_RATIO)
    pairs_file = os.path.join(out_dir, "pairs.bin")
    t0 = time.time()
    graph = match_stage(kp_files, params, out_file=pairs_file, verbose=False)
    t_match_cold = time.time() - t0
    ma_reps = []
    for _ in range(REPEATS):
        t0 = time.time()
        graph = match_stage(kp_files, params, out_file=pairs_file,
                            verbose=False)
        ma_reps.append(time.time() - t0)
    t_match = float(np.median(ma_reps))
    n_pairs = N_IMAGES * (N_IMAGES - 1) // 2
    log(f"TPU match: cold {t_match_cold:.1f}s, warm {t_match:.1f}s"
        f" +- {_spread(ma_reps):.1f}s over {REPEATS}"
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
    re_reps = []
    for _ in range(REPEATS):
        t0 = time.time()
        reg = GroupRegistration(graph, cfg)
        reg.run()
        re_reps.append(time.time() - t0)
    t_reg = float(np.median(re_reps))
    es = [m.E for m in reg.measures]
    n_iters = len(es)
    log(f"TPU register: cold {t_reg_cold:.1f}s, warm {t_reg:.1f}s"
        f" +- {_spread(re_reps):.1f}s over {REPEATS}"
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
    return graph, kp_files, warm, cold, reg


def tre_tpu(reg, probes):
    """Apply the warm run's final transform chains to the GT probes:
    returns (after_linear, final) stacks shaped like ``probes``."""
    import jax.numpy as jnp

    lin, fin = [], []
    for i in range(probes.shape[0]):
        chain = reg.chains[i]
        p = jnp.asarray(probes[i])
        lin.append(np.asarray(chain.transforms[0](p)))
        fin.append(np.asarray(chain(p)))
    return np.stack(lin), np.stack(fin)


# --------------------------------------------------------------------- CPU

def cpu_extract_once(volumes):
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
    return total / CPP_EXTRACTS * N_IMAGES


def cpu_match_once(kp_files):
    from frog_tpu.io.keypoints import read_keypoints

    match_file = os.path.join(WORKDIR, "cpp_desc.bin")
    if not os.path.exists(match_file):
        kps = [read_keypoints(f) for f in kp_files[: CPP_PAIRS + 1]]
        p = min(len(k) for k in kps)
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
    return m["secsPerPair"] * n_pairs


def cpu_register_extrapolated(pairs_file):
    """Per-iteration cost from a short run at the TRUE level grid dims,
    scaled to the full 50 + levels x 200 schedule (cross-check for the
    full measured run; EM cost scales with its every-10 cadence)."""
    bin_path = os.path.join(ROOT, "native", "baseline_frog")
    out = subprocess.run(
        [bin_path, pairs_file, str(CPP_LIN_ITERS), str(CPP_DEF_ITERS),
         str(GRID_SIZE), "10000", "", str(LEVELS), "0", "0.4", "0", "0.02"],
        capture_output=True, text=True, check=True,
    )
    r = json.loads(out.stdout)
    lin_per = r["linear_s"] / max(r["linear_iters"], 1)
    def_per = r["deform_s"] / max(r["deform_iters"], 1)
    n_em_short = -(-CPP_LIN_ITERS // 10) + LEVELS * -(-CPP_DEF_ITERS // 10)
    n_em_full = -(-LINEAR_ITERS // 10) + LEVELS * -(-DEFORM_ITERS // 10)
    em_per = r["stats_s"] / max(n_em_short, 1)
    return (lin_per * LINEAR_ITERS + def_per * LEVELS * DEFORM_ITERS
            + em_per * n_em_full)


def cpu_register_full(pairs_file, probes, em_table=None):
    """ONE full (non-extrapolated) run of the reference schedule with the
    diffeomorphism guarantee ON — the C++ wall-clock the TPU register
    stage is compared against — carrying the GT probes through every
    transform and dumping the E trajectory for the parity check.

    ``em_table`` = (P, K) of the TPU run's padded link table arms the
    TABLE-STRIDE EM parity mode (baseline_frog.cpp argv 17/18): both
    optimizers then draw the IDENTICAL EM subsample, so the trajectories
    and the diffeomorphism-guard decisions are comparable
    decision-for-decision (group.py::_em_stride)."""
    bin_path = os.path.join(ROOT, "native", "baseline_frog")
    probes_bin = os.path.join(WORKDIR, "cpp_probes.bin")
    with open(probes_bin, "wb") as f:
        np.asarray([probes.shape[0], probes.shape[1]], np.int32).tofile(f)
        probes.astype(np.float32).tofile(f)
    dump = os.path.join(WORKDIR, "cpp_full_dump.json")
    cmd = [bin_path, pairs_file, str(LINEAR_ITERS), str(DEFORM_ITERS),
           str(GRID_SIZE), "10000", dump, str(LEVELS), "1", "0.4", "0",
           "0.02", probes_bin]
    if em_table is not None:
        cmd += ["0", "0", "0", "0", str(em_table[0]), str(em_table[1])]
    out = subprocess.run(
        cmd,
        capture_output=True, text=True, check=True,
    )
    r = json.loads(out.stdout)
    t = r["stats_s"] + r["linear_s"] + r["deform_s"]
    with open(dump) as f:
        d = json.load(f)
    n, m = probes.shape[:2]
    raw = np.fromfile(probes_bin + ".out", np.float32)
    plin = raw[: n * m * 3].reshape(n, m, 3)
    pfin = raw[n * m * 3:].reshape(n, m, 3)
    return t, r, d, plin, pfin


def quality_report(reg, cpp_dump, cpp_plin, cpp_pfin, probes):
    """Ground-truth TRE for both sides + E-trajectory parity at
    reference scale (the paper's landmark metric, automated:
    imageGroup.cxx:1229-1282)."""
    from tests.synthetic import tre_stats

    t0m, t0x = tre_stats(probes)
    lin, fin = tre_tpu(reg, probes)
    tlm, tlx = tre_stats(lin)
    tfm, tfx = tre_stats(fin)
    clm, clx = tre_stats(cpp_plin)
    cfm, cfx = tre_stats(cpp_pfin)
    log(f"TRE (mean/max mm over {probes.shape[1]} GT correspondence sets):")
    log(f"  initial        : {t0m:7.2f} / {t0x:7.2f}")
    log(f"  TPU linear     : {tlm:7.2f} / {tlx:7.2f}   C++ linear: "
        f"{clm:7.2f} / {clx:7.2f}")
    log(f"  TPU deformable : {tfm:7.2f} / {tfx:7.2f}   C++ final : "
        f"{cfm:7.2f} / {cfx:7.2f}")
    assert tfm < 0.5 * t0m, "TPU registration must reduce GT TRE >= 2x"
    # a 2x TRE regression must FAIL this gate: 10% of the C++ final TRE,
    # floored at 0.02 mm (far under the synthetic fixture's noise)
    assert abs(tfm - cfm) < max(0.1 * cfm, 0.02), (
        f"TPU final TRE {tfm:.3f} vs C++ {cfm:.3f} diverge"
    )

    # E-trajectory parity.  With the table-stride EM mode both sides draw
    # the IDENTICAL EM subsample (bitwise — tests/test_parity_native.py::
    # test_em_table_stride_sample_sets_bitwise_equal), so the residual
    # divergence is pure arithmetic.  The measured decomposition
    # (docs/BENCHMARKS.md "Strict parity"): with a SHARED libm the whole
    # guarded schedule binds decision-for-decision (grids equal, E rel
    # ~4e-5 — the CPU referee test); on TPU HARDWARE the EM fixed point
    # shifts ~3e-4 through the hardware exp (contraction-amplified ulps),
    # bounding E rel at ~3e-3 and leaving knife-edge guard decisions
    # legitimately forkable.  Gates below are those measured bounds; the
    # fork_sweep line quantifies the fork rate on hardware.
    es_tpu = np.asarray([m.E for m in reg.measures])
    es_cpp = np.asarray(cpp_dump["es_linear"] + cpp_dump["es_deform"])
    n_lin = len(cpp_dump["es_linear"])
    rel_lin = np.abs(es_tpu[:n_lin] - es_cpp[:n_lin]) / es_cpp[:n_lin]
    k = min(len(es_tpu), len(es_cpp))
    rel_all = np.abs(es_tpu[:k] - es_cpp[:k]) / es_cpp[:k]
    same_grids = list(reg.grids_per_level) == list(cpp_dump["grids_per_level"])
    # compare the trajectories only while the guard schedules agree: the
    # first fork inserts a fresh-grid retry on one side and the iteration
    # streams stop being alignable
    tg, cg = list(reg.grids_per_level), list(cpp_dump["grids_per_level"])
    n_pref = n_lin
    for lvl in range(min(len(tg), len(cg))):
        if tg[lvl] != cg[lvl]:
            break
        n_pref += DEFORM_ITERS
    n_pref = min(n_pref, k)
    rel_pref = np.abs(es_tpu[:n_pref] - es_cpp[:n_pref]) / es_cpp[:n_pref]
    log(f"E-trajectory parity vs C++ oracle ({k} iters): linear median rel"
        f" {np.median(rel_lin):.2e} max {rel_lin.max():.2e};"
        f" pre-fork ({n_pref} iters) median {np.median(rel_pref):.2e};"
        f" overall median {np.median(rel_all):.2e};"
        f" final E tpu {es_tpu[-1]:.4f} vs cpp {es_cpp[-1]:.4f};"
        f" grids/level tpu {tg} vs cpp {cg}")
    assert np.median(rel_lin) < 5e-3, "linear-stage E parity broken"
    # deformable iterations compound the ~3e-3 hardware-exp band through
    # the coefficient feedback (measured: 1.5e-2 median over 50 linear +
    # 200 level-1 iterations in the r5 capture)
    assert np.median(rel_pref) < 5e-2, "aligned-schedule E parity broken"
    if same_grids:
        assert abs(es_tpu[-1] - es_cpp[-1]) / es_cpp[-1] < 0.05, (
            "final E diverges from C++ oracle"
        )
    else:
        # A knife-edge guard decision forked (hardware-exp EM shift, see
        # above): schedules legitimately differ from that level on.  The
        # binding gates are the aligned-prefix parity above, the GT TRE
        # agreement (0.1 gate), and hard convergence on both sides.
        log(f"  GUARD FORK at level {lvl + 1}: schedules diverge past"
            f" iter {n_pref} (hardware-exp EM shift, measured ~3e-4;"
            " see docs/BENCHMARKS.md)")
        assert es_tpu[-1] < 0.05 * es_tpu[0], "TPU E failed to converge"
        assert es_cpp[-1] < 0.05 * es_cpp[0], "C++ E failed to converge"


def fork_sweep(seeds=3):
    """Guard-fork statistics at small scale: for each seed run the TPU
    optimizer and the C++ oracle (table-stride EM, identical subsamples)
    on the same synthetic group with the diffeomorphism guarantee ON, and
    report how often the guard schedules fork plus the TRE spread —
    making 'stochastic EM forks the schedule' a measured statement
    (imageGroup.cxx:88-121).  Same shapes across seeds -> one compile."""
    import jax.numpy as jnp

    from frog_tpu.io.pairs import write_pairs
    from frog_tpu.registration import GroupConfig, GroupRegistration
    from tests.synthetic import make_synthetic_group, tre_stats

    bin_path = os.path.join(ROOT, "native", "baseline_frog")
    forks, tre_t, tre_c = 0, [], []
    for seed in range(101, 101 + seeds):
        # warp/alpha chosen so the guard genuinely trips (several stacked
        # grids + alpha halvings per run) — fork-PRONE decisions, not a
        # vacuous guard
        graph, truth = make_synthetic_group(
            seed=seed, n_images=6, n_points=2000, extent=300.0,
            warp_amp=18.0, noise=0.5, outlier_fraction=0.1,
            match_fraction=0.9,
        )
        cap = 2000
        cfg = GroupConfig(
            linear_iterations=20, deformable_levels=2,
            deformable_iterations=40, initial_grid_size=80.0,
            deformable_alpha=0.2, guarantee_diffeomorphism=True,
            em_max_samples=cap, verbose=False,
        )
        reg = GroupRegistration(graph, cfg)
        reg.run()

        pairs = os.path.join(WORKDIR, f"sweep_{seed}.bin")
        write_pairs(pairs, graph)
        # GT probes: each image's exact (noise-free) view of a cloud
        # subset rides the C++ transforms via the probes side channel
        sel = np.arange(0, 2000, 20)
        probes = np.stack(
            [t["inv"](truth["cloud"][sel]) for t in truth["images"]]
        ).astype(np.float32)
        probes_bin = os.path.join(WORKDIR, f"sweep_{seed}_probes.bin")
        with open(probes_bin, "wb") as f:
            np.asarray([probes.shape[0], probes.shape[1]], np.int32).tofile(f)
            probes.tofile(f)
        dump = os.path.join(WORKDIR, f"sweep_{seed}.json")
        p_pad = reg.arrays.xyz.shape[1]
        k_pad = reg.arrays.link_dst.shape[2]
        subprocess.run(
            [bin_path, pairs, "20", "40", "80.0", str(cap), dump, "2", "1",
             "0.4", "0", "0.2", probes_bin, "0", "0", "0", "0",
             str(p_pad), str(k_pad)],
            capture_output=True, text=True, check=True,
        )
        with open(dump) as f:
            d = json.load(f)
        forked = list(reg.grids_per_level) != list(d["grids_per_level"])
        if forked:
            forks += 1
        n_trips = sum(reg.grids_per_level) - len(reg.grids_per_level)
        log(f"  seed {seed}: grids/level tpu {reg.grids_per_level} vs cpp"
            f" {d['grids_per_level']} ({n_trips} guard trips)"
            + ("  <-- FORK" if forked else ""))
        # TPU-side TRE through the final chains; C++-side via probes out
        fin = np.stack([
            np.asarray(reg.chains[i](jnp.asarray(probes[i])))
            for i in range(probes.shape[0])
        ])
        n, m = probes.shape[:2]
        raw = np.fromfile(probes_bin + ".out", np.float32)
        cfin = raw[n * m * 3:].reshape(n, m, 3)
        tre_t.append(tre_stats(fin)[0])
        tre_c.append(tre_stats(cfin)[0])
    tre_t, tre_c = np.asarray(tre_t), np.asarray(tre_c)
    log(f"fork sweep ({seeds} seeds, guard ON, identical EM subsamples):"
        f" {forks}/{seeds} guard-schedule forks;"
        f" TRE tpu {tre_t.mean():.3f} +- {tre_t.std():.3f} mm"
        f" vs cpp {tre_c.mean():.3f} +- {tre_c.std():.3f} mm"
        f" (max |diff| {np.abs(tre_t - tre_c).max():.3f})")
    return forks, tre_t, tre_c


def main():
    ensure_binaries()
    os.makedirs(WORKDIR, exist_ok=True)
    volumes, truths = build_volumes()
    graph, kp_files, warm, cold, reg = run_tpu(volumes)

    from tests.synthetic import gt_correspondences

    probes = gt_correspondences(truths, n_probes=100)
    pairs_file = os.path.join(WORKDIR, "tpu_out", "pairs.bin")

    # interleaved subset measurements: median + spread over the same
    # REPEATS count as the TPU warm loops (one knob, comparable medians)
    ex_runs, ma_runs = [], []
    for rep in range(REPEATS):
        ex_runs.append(cpu_extract_once(volumes))
        ma_runs.append(cpu_match_once(kp_files))
    extrapolated = cpu_register_extrapolated(pairs_file)
    n_pairs = N_IMAGES * (N_IMAGES - 1) // 2
    log(f"CPU extract: median {np.median(ex_runs):.1f}s"
        f" +- {_spread(ex_runs):.1f}s over {REPEATS} runs"
        f" ({CPP_EXTRACTS} volumes scaled to {N_IMAGES})")
    log(f"CPU match: median {np.median(ma_runs):.1f}s"
        f" +- {_spread(ma_runs):.1f}s over {REPEATS} runs"
        f" ({CPP_PAIRS} pairs scaled to {n_pairs})")

    if os.environ.get("FROG_BENCH_CPP_FULL", "1") != "0":
        em_table = None
        if EM_TABLE_PARITY:
            em_table = (
                int(reg.arrays.xyz.shape[1]),
                int(reg.arrays.link_dst.shape[2]),
            )
            log(f"parity leg: table-stride EM (P={em_table[0]},"
                f" K={em_table[1]}) — identical subsamples on both sides")
        t_full, r_full, cpp_dump, cpp_plin, cpp_pfin = cpu_register_full(
            pairs_file, probes, em_table=em_table
        )
        log(f"CPU register: {t_full:.1f}s FULL measured run"
            f" ({r_full['threads']} threads,"
            f" {LINEAR_ITERS}+{LEVELS}x{DEFORM_ITERS} iters;"
            f" extrapolated cross-check {extrapolated:.1f}s)")
        quality_report(reg, cpp_dump, cpp_plin, cpp_pfin, probes)
        t_register = t_full
    else:
        t_register = extrapolated
        log(f"CPU register: {t_register:.1f}s extrapolated")

    if SWEEP_SEEDS:
        fork_sweep(SWEEP_SEEDS)

    cpu = {
        "extract": float(np.median(ex_runs)),
        "match": float(np.median(ma_runs)),
        "register": t_register,
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
