"""Numeric cross-validation of the JAX optimizer against the
reference-equivalent C++ implementation (native/baseline_frog.cpp).

Both run the same algorithm — EM chi-mixture weighting
(registration/stats.cxx:14-70), groupwise linear similarity update
(registration/imageGroup.cxx:1063-1149) and one deformable B-spline level
(imageGroup.cxx:234-472) — on the same pairs.bin.  The C++ side is an
independent scalar/OpenMP implementation; agreement of the energy
trajectories, final affines and final control-grid coefficients is the
strongest parity evidence obtainable without the upstream binaries
(SURVEY.md §6: the baseline is self-measured parity).
"""
import json
import os
import subprocess

import numpy as np
import pytest

from frog_tpu.io.pairs import write_pairs
from frog_tpu.registration import GroupConfig, GroupRegistration
from tests.synthetic import make_synthetic_group

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(ROOT, "native", "baseline_frog")

N_LINEAR = 20
N_DEFORM = 20
GRID_SIZE = 60.0


def _ensure_binary():
    src = BIN + ".cpp"
    if os.path.exists(BIN) and os.path.getmtime(BIN) >= os.path.getmtime(src):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-fopenmp", "-o", BIN, src, "-lm"],
            check=True,
            capture_output=True,
        )
    except (OSError, subprocess.CalledProcessError):
        return False
    return True


@pytest.fixture(scope="module")
def parity_runs(tmp_path_factory):
    if not _ensure_binary():
        pytest.skip("no C++ toolchain for native baseline")
    tmp = tmp_path_factory.mktemp("parity")
    graph, _ = make_synthetic_group(
        seed=21,
        n_images=4,
        n_points=300,
        extent=200.0,
        warp_amp=5.0,
        noise=0.5,
        outlier_fraction=0.1,
        match_fraction=0.9,
    )
    pairs = str(tmp / "pairs.bin")
    write_pairs(pairs, graph)
    dump = str(tmp / "dump.json")
    subprocess.run(
        [BIN, pairs, str(N_LINEAR), str(N_DEFORM), str(GRID_SIZE), "1000000000", dump],
        check=True,
        capture_output=True,
    )
    with open(dump) as f:
        native = json.load(f)

    cfg = GroupConfig(
        linear_iterations=N_LINEAR,
        deformable_levels=1,
        deformable_iterations=N_DEFORM,
        initial_grid_size=GRID_SIZE,
        guarantee_diffeomorphism=False,
        verbose=False,
    )
    reg = GroupRegistration(graph, cfg)
    reg.run()
    return native, reg


def test_grid_geometry_matches(parity_runs):
    native, reg = parity_runs
    dims, origin, spacing = reg._last_level_geometry
    assert list(dims) == native["grid"]["dims"]
    # the bbox comes from f32-baked coordinates on both sides; tiny
    # accumulation differences shift it by O(1e-6) relative
    np.testing.assert_allclose(origin, native["grid"]["origin"], rtol=1e-5)
    np.testing.assert_allclose(spacing, native["grid"]["spacing"], rtol=1e-5)


def test_energy_trajectories_match(parity_runs):
    native, reg = parity_runs
    es = [m.E for m in reg.measures]
    assert len(es) == N_LINEAR + N_DEFORM
    np.testing.assert_allclose(es[:N_LINEAR], native["es_linear"], rtol=2e-3)
    np.testing.assert_allclose(es[N_LINEAR:], native["es_deform"], rtol=2e-3)


def test_final_affines_match(parity_runs):
    native, reg = parity_runs
    affine = np.asarray(reg.arrays.affine)
    for i, im in enumerate(native["images"]):
        np.testing.assert_allclose(
            np.diagonal(affine[i])[:3], im["scale"], rtol=1e-4
        )
        np.testing.assert_allclose(
            affine[i, :3, 3], im["trans"], atol=5e-3 * np.abs(im["trans"]).max() + 1e-2
        )


def test_final_em_params_match(parity_runs):
    native, reg = parity_runs
    em = np.asarray(reg.arrays.em)
    native_em = np.asarray([im["em"] for im in native["images"]])
    np.testing.assert_allclose(em, native_em, rtol=5e-3)


@pytest.fixture(scope="module")
def parity_runs_hard(tmp_path_factory):
    """The HARD control-flow paths: 2 deformable levels with the
    diffeomorphism guarantee ON, aggressive alpha so the guard trips,
    stacks fresh grids and halves alpha (imageGroup.cxx:88-121)."""
    if not _ensure_binary():
        pytest.skip("no C++ toolchain for native baseline")
    tmp = tmp_path_factory.mktemp("parity_hard")
    graph, _ = make_synthetic_group(
        seed=31,
        n_images=4,
        n_points=250,
        extent=200.0,
        warp_amp=18.0,
        noise=0.3,
        outlier_fraction=0.05,
        match_fraction=0.9,
    )
    pairs = str(tmp / "pairs.bin")
    write_pairs(pairs, graph)
    dump = str(tmp / "dump.json")
    alpha = 0.2  # decisive guard trips (borderline trips would be flaky)
    subprocess.run(
        [
            BIN, pairs, "10", "15", "80.0", "1000000000", dump,
            "2",  # levels
            "1",  # guarantee
            "0.4",
            "0",  # nFixed
            str(alpha),
        ],
        check=True,
        capture_output=True,
    )
    with open(dump) as f:
        native = json.load(f)

    cfg = GroupConfig(
        linear_iterations=10,
        deformable_levels=2,
        deformable_iterations=15,
        initial_grid_size=80.0,
        deformable_alpha=alpha,
        guarantee_diffeomorphism=True,
        verbose=False,
    )
    reg = GroupRegistration(graph, cfg)
    reg.run()
    return native, reg


def test_hard_guard_actually_trips(parity_runs_hard):
    native, reg = parity_runs_hard
    # the point of this fixture: at least one stacked grid / alpha halving
    assert sum(native["grids_per_level"]) > 2, native["grids_per_level"]


def test_hard_grids_and_alpha_match(parity_runs_hard):
    native, reg = parity_runs_hard
    assert reg.grids_per_level == native["grids_per_level"]


def test_hard_energy_trajectories_match(parity_runs_hard):
    native, reg = parity_runs_hard
    es = [m.E for m in reg.measures]
    assert len(es) == 10 + 2 * 15
    np.testing.assert_allclose(es[:10], native["es_linear"], rtol=2e-3)
    np.testing.assert_allclose(es[10:], native["es_deform"], rtol=5e-3)


def test_hard_final_positions_match(parity_runs_hard):
    native, reg = parity_runs_hard
    xyz2 = np.asarray(reg.arrays.xyz2)
    for i, im in enumerate(native["images"]):
        want = np.asarray(im["xyz2"], np.float32).reshape(-1, 3)
        got = xyz2[i, : want.shape[0]]
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=2e-3 * scale)


@pytest.fixture(scope="module")
def parity_runs_fixed(tmp_path_factory):
    """Fixed-image mode: first image frozen, no mean subtraction, E over
    movable images only (imageGroup.cxx:398-409, RANSAC disabled on both
    sides so the linear path is the plain gradient one)."""
    if not _ensure_binary():
        pytest.skip("no C++ toolchain for native baseline")
    tmp = tmp_path_factory.mktemp("parity_fixed")
    graph, _ = make_synthetic_group(
        seed=41,
        n_images=4,
        n_points=250,
        extent=200.0,
        warp_amp=4.0,
        noise=0.4,
        outlier_fraction=0.1,
        match_fraction=0.9,
    )
    pairs = str(tmp / "pairs.bin")
    write_pairs(pairs, graph)
    dump = str(tmp / "dump.json")
    subprocess.run(
        [
            BIN, pairs, str(N_LINEAR), str(N_DEFORM), str(GRID_SIZE),
            "1000000000", dump, "1", "0", "0.4", "1",
        ],
        check=True,
        capture_output=True,
    )
    with open(dump) as f:
        native = json.load(f)

    cfg = GroupConfig(
        linear_iterations=N_LINEAR,
        deformable_levels=1,
        deformable_iterations=N_DEFORM,
        initial_grid_size=GRID_SIZE,
        guarantee_diffeomorphism=False,
        n_fixed=1,
        use_ransac=False,
        verbose=False,
    )
    reg = GroupRegistration(graph, cfg)
    reg.run()
    return native, reg


def test_fixed_mode_trajectories_match(parity_runs_fixed):
    native, reg = parity_runs_fixed
    es = [m.E for m in reg.measures]
    np.testing.assert_allclose(es[:N_LINEAR], native["es_linear"], rtol=2e-3)
    np.testing.assert_allclose(es[N_LINEAR:], native["es_deform"], rtol=5e-3)


def test_fixed_mode_fixed_image_untouched(parity_runs_fixed):
    native, reg = parity_runs_fixed
    affine = np.asarray(reg.arrays.affine)
    np.testing.assert_array_equal(affine[0], np.eye(4))
    want = np.asarray(native["images"][0]["xyz2"], np.float32).reshape(-1, 3)
    got = np.asarray(reg.arrays.xyz2)[0, : want.shape[0]]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fixed_mode_positions_match(parity_runs_fixed):
    native, reg = parity_runs_fixed
    xyz2 = np.asarray(reg.arrays.xyz2)
    for i, im in enumerate(native["images"]):
        want = np.asarray(im["xyz2"], np.float32).reshape(-1, 3)
        got = xyz2[i, : want.shape[0]]
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=2e-3 * scale)


@pytest.mark.parametrize("mode", ["stride", "reservoir"])
def test_em_subsample_modes_match_native(tmp_path, mode):
    """EM subsampling (the reference's 10k reservoir, stats.h:36-76) in
    both the deterministic-stride and the random-acceptance mode: sample
    SETS necessarily differ across implementations (different link
    orderings / RNGs), so the bar is statistical — the energy
    trajectories and final EM parameters must land in the same regime as
    the C++ oracle's strided run."""
    if not _ensure_binary():
        pytest.skip("no C++ toolchain for native baseline")
    graph, _ = make_synthetic_group(
        seed=51,
        n_images=4,
        n_points=300,
        extent=200.0,
        warp_amp=4.0,
        noise=0.5,
        outlier_fraction=0.15,
        match_fraction=0.9,
    )
    pairs = str(tmp_path / "pairs.bin")
    write_pairs(pairs, graph)
    dump = str(tmp_path / "dump.json")
    cap = 1500
    subprocess.run(
        [BIN, pairs, "12", "12", str(GRID_SIZE), str(cap), dump],
        check=True,
        capture_output=True,
    )
    with open(dump) as f:
        native = json.load(f)

    cfg = GroupConfig(
        linear_iterations=12,
        deformable_levels=1,
        deformable_iterations=12,
        initial_grid_size=GRID_SIZE,
        guarantee_diffeomorphism=False,
        em_max_samples=cap,
        em_sampling=mode,
        verbose=False,
    )
    reg = GroupRegistration(graph, cfg)
    reg.run()
    es = np.asarray([m.E for m in reg.measures])
    native_es = np.asarray(native["es_linear"] + native["es_deform"])
    np.testing.assert_allclose(es, native_es, rtol=0.05)
    em = np.asarray(reg.arrays.em)
    native_em = np.asarray([im["em"] for im in native["images"]])
    # same inlier/outlier regime: c1 within 25%, ratio within 0.15
    assert np.all(np.abs(em[:, 0] - native_em[:, 0])
                  <= 0.25 * native_em[:, 0] + 0.5)
    assert np.all(np.abs(em[:, 2] - native_em[:, 2]) <= 0.15)


def test_em_table_stride_mode_binds_strict_parity(tmp_path):
    """The TABLE-STRIDE parity mode (baseline_frog argv 17/18): the C++
    oracle mirrors the TPU's padded (P, K) link-table layout and samples
    the EM buffer at the same static stride over the same flattened
    positions (group.py::_em_stride) — the sample SETS are then
    identical, so unlike the statistical bar of
    test_em_subsample_modes_match_native, subsampled runs must agree as
    tightly as full-sample ones (f32-vs-double arithmetic only)."""
    if not _ensure_binary():
        pytest.skip("no C++ toolchain for native baseline")
    graph, _ = make_synthetic_group(
        seed=51,
        n_images=4,
        n_points=300,
        extent=200.0,
        warp_amp=4.0,
        noise=0.5,
        outlier_fraction=0.15,
        match_fraction=0.9,
    )
    pairs = str(tmp_path / "pairs.bin")
    write_pairs(pairs, graph)
    cap = 1500

    cfg = GroupConfig(
        linear_iterations=12,
        deformable_levels=1,
        deformable_iterations=12,
        initial_grid_size=GRID_SIZE,
        guarantee_diffeomorphism=False,
        em_max_samples=cap,
        em_sampling="stride",
        verbose=False,
    )
    reg = GroupRegistration(graph, cfg)
    reg.run()

    dump = str(tmp_path / "dump.json")
    p_pad = reg.arrays.xyz.shape[1]
    k_pad = reg.arrays.link_dst.shape[2]
    subprocess.run(
        [BIN, pairs, "12", "12", str(GRID_SIZE), str(cap), dump,
         "1", "0", "0.4", "0", "0.02", "", "0", "0", "0", "0",
         str(p_pad), str(k_pad)],
        check=True,
        capture_output=True,
    )
    with open(dump) as f:
        native = json.load(f)

    # identical sample sets: agreement is f32-vs-double only (measured
    # ~4e-6 max E rel here, vs ~4e-4 for the compact-stride oracle)
    es = np.asarray([m.E for m in reg.measures])
    native_es = np.asarray(native["es_linear"] + native["es_deform"])
    np.testing.assert_allclose(es, native_es, rtol=1e-4)
    em = np.asarray(reg.arrays.em)
    native_em = np.asarray([im["em"] for im in native["images"]])
    np.testing.assert_allclose(em, native_em, rtol=1e-3)


def test_em_table_stride_guard_decisions_bind(tmp_path):
    """Same-libm referee for the reference-scale bench gate: with the
    table-stride EM mode (identical subsamples), the diffeomorphism
    guarantee ON and an alpha that genuinely trips the guard, the
    stacked-grid SCHEDULES must agree decision-for-decision and the E
    trajectories tightly — on CPU, where jax and the C++ oracle share
    libm transcendentals.  (On TPU hardware the EM fixed points shift
    ~3e-4 through the hardware exp — measured and documented in
    docs/BENCHMARKS.md — which is why the bench's TPU-side gate is the
    measured hardware bound rather than this strict one.)"""
    if not _ensure_binary():
        pytest.skip("no C++ toolchain for native baseline")
    graph, _ = make_synthetic_group(
        seed=31,
        n_images=4,
        n_points=250,
        extent=200.0,
        warp_amp=18.0,
        noise=0.3,
        outlier_fraction=0.05,
        match_fraction=0.9,
    )
    pairs = str(tmp_path / "pairs.bin")
    write_pairs(pairs, graph)
    cap = 800
    alpha = 0.2

    cfg = GroupConfig(
        linear_iterations=10,
        deformable_levels=2,
        deformable_iterations=15,
        initial_grid_size=80.0,
        deformable_alpha=alpha,
        guarantee_diffeomorphism=True,
        em_max_samples=cap,
        em_sampling="stride",
        verbose=False,
    )
    reg = GroupRegistration(graph, cfg)
    reg.run()
    assert sum(reg.grids_per_level) > 2  # the guard genuinely tripped

    dump = str(tmp_path / "dump.json")
    p_pad = reg.arrays.xyz.shape[1]
    k_pad = reg.arrays.link_dst.shape[2]
    subprocess.run(
        [BIN, pairs, "10", "15", "80.0", str(cap), dump,
         "2", "1", "0.4", "0", str(alpha), "", "0", "0", "0", "0",
         str(p_pad), str(k_pad)],
        check=True,
        capture_output=True,
    )
    with open(dump) as f:
        native = json.load(f)
    assert reg.grids_per_level == native["grids_per_level"]
    es = np.asarray([m.E for m in reg.measures])
    native_es = np.asarray(native["es_linear"] + native["es_deform"])
    np.testing.assert_allclose(es, native_es, rtol=1e-3)


def test_em_table_stride_sample_sets_bitwise_equal():
    """The TPU's strided EM subsample and the C++ mirror's (baseline_frog
    argv 17/18) must select the SAME links at the same table positions —
    bit-for-bit, virtual rows included.  This is the static half of the
    strict-parity argument: with equal sample sets, any remaining EM
    divergence is arithmetic (libm/hardware transcendentals), not
    sampling (measured: same-libm trajectories agree to ~4e-5, TPU-exp
    EM fixed points shift ~3e-4 — docs/BENCHMARKS.md)."""
    from frog_tpu.registration.state import build_group_state

    graph, _ = make_synthetic_group(
        seed=51,
        n_images=5,
        n_points=400,
        extent=200.0,
        warp_amp=4.0,
        noise=0.5,
        outlier_fraction=0.15,
        match_fraction=0.9,
    )
    # force a narrow row width so virtual rows engage
    arrays, meta = build_group_state(graph, links_per_row=4)
    P = arrays.xyz.shape[1]
    K = arrays.link_dst.shape[2]
    link_dst = np.asarray(arrays.link_dst)
    link_valid = np.asarray(arrays.link_valid)
    cap = 700
    total = P * K
    stride = -(-total // cap) if total > cap else 1

    for i in range(graph.n_images):
        # ---- C++-mirror layout, reimplemented in numpy from the graph
        nPts = len(graph.images[i].xyz)
        src_list, di_list, dp_list = [], [], []
        for (a, b), m in graph.matches.items():
            if a == i:
                src_list.append(m[:, 0])
                di_list.append(np.full(m.shape[0], b))
                dp_list.append(m[:, 1])
            if b == i:
                src_list.append(m[:, 1])
                di_list.append(np.full(m.shape[0], a))
                dp_list.append(m[:, 0])
        src = np.concatenate(src_list)
        di = np.concatenate(di_list)
        dp = np.concatenate(dp_list)
        counts = np.bincount(src, minlength=nPts)
        order = np.argsort(src, kind="stable")
        starts_pt = np.concatenate([[0], np.cumsum(counts)])
        extra = np.maximum(-(-counts // K) - 1, 0)
        vstart = nPts + np.concatenate([[0], np.cumsum(extra)[:-1]])
        rowSrc = np.full(P, -1, np.int64)
        rowBlock = np.zeros(P, np.int64)
        rowSrc[:nPts] = np.arange(nPts)
        for pnt in range(nPts):
            for b in range(1, -(-counts[pnt] // K)):
                rowSrc[vstart[pnt] + b - 1] = pnt
                rowBlock[vstart[pnt] + b - 1] = b
        n_valid = 0
        for t in range(0, total, stride):
            row, col = divmod(t, K)
            s = rowSrc[row]
            tpu_ok = bool(link_valid[i].reshape(-1)[t])
            if s < 0:
                assert not tpu_ok, (i, t)
                continue
            rank = rowBlock[row] * K + col
            cpp_ok = rank < counts[s]
            assert tpu_ok == cpp_ok, (i, t, row, col)
            if cpp_ok:
                l = order[starts_pt[s] + rank]
                assert link_dst[i].reshape(-1)[t] == di[l] * P + dp[l], (i, t)
                n_valid += 1
        assert n_valid > 100  # the subsample is non-trivial


def test_final_coefficients_match(parity_runs):
    native, reg = parity_runs
    dims = native["grid"]["dims"]
    for i, im in enumerate(native["images"]):
        # chain = [Affine, BSpline] (guarantee off -> exactly one grid)
        chain = reg.chains[i]
        assert len(chain) == 2
        coeffs = np.asarray(chain.transforms[1].coeffs)  # (Dx, Dy, Dz, 3)
        assert coeffs.shape == (dims[0], dims[1], dims[2], 3)
        # native layout: flat[3 * ((z*Dy + y)*Dx + x) + k]
        native_coeffs = np.asarray(im["coeffs"], np.float32).reshape(
            dims[2], dims[1], dims[0], 3
        )
        ours = coeffs.transpose(2, 1, 0, 3)
        scale = np.abs(native_coeffs).max() + 1e-6
        np.testing.assert_allclose(ours, native_coeffs, atol=2e-3 * scale)


@pytest.fixture(scope="module")
def parity_runs_ransac(tmp_path_factory):
    """Fixed-image RANSAC path end-to-end (register-one with RANSAC ON):
    3 fixed images + 1 moving image displaced by a planted similarity
    (rotation + scale + translation) with planted outlier matches.  Both
    sides run 4-point-hypothesis RANSAC + inlier refit (Horn similarity =
    vtkLandmarkTransform's method, imageGroup.cxx:629-804); random draws
    differ, so the parity bar is statistical."""
    if not _ensure_binary():
        pytest.skip("no C++ toolchain for native baseline")
    tmp = tmp_path_factory.mktemp("parity_ransac")
    rng = np.random.default_rng(61)
    n_points = 400
    cloud = rng.uniform(0, 200.0, (n_points, 3)).astype(np.float32)

    # planted similarity: moving-image coords = S^-1(common)
    ang = np.deg2rad(18.0)
    rot = np.asarray(
        [[np.cos(ang), -np.sin(ang), 0],
         [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1]], np.float32)
    scale = 1.15
    trans = np.asarray([12.0, -9.0, 5.0], np.float32)
    moving = ((cloud - trans) @ rot) / scale  # R^-1 (x - t) / s, row form

    from frog_tpu.io.pairs import ImagePoints, PairGraph

    images = []
    for i in range(3):  # fixed images: common cloud + small noise
        images.append(ImagePoints(
            name=f"fix{i}", ref_translation=np.zeros(3),
            xyz=cloud + rng.normal(scale=0.3, size=cloud.shape).astype(np.float32),
            other=np.ones((n_points, 3), np.float32)))
    images.append(ImagePoints(
        name="mov", ref_translation=np.zeros(3),
        xyz=moving + rng.normal(scale=0.3, size=cloud.shape).astype(np.float32),
        other=np.ones((n_points, 3), np.float32)))

    matches = {}
    ids = np.arange(n_points)
    for i in range(3):
        m = np.stack([ids, ids], axis=1)
        out_rows = rng.choice(n_points, size=n_points // 4, replace=False)
        m[out_rows, 1] = rng.integers(0, n_points, size=out_rows.size)
        matches[(i, 3)] = m.astype(np.int64)
    graph = PairGraph(images=images, matches=matches)

    pairs = str(tmp / "pairs.bin")
    write_pairs(pairs, graph)
    dump = str(tmp / "dump.json")
    subprocess.run(
        [BIN, pairs, "0", "0", "100.0", "1000000000", dump, "1", "0",
         "0.4", "3", "0.02", "", "1", "5000", "8.0", "10.0"],
        check=True, capture_output=True,
    )
    with open(dump) as f:
        native = json.load(f)

    cfg = GroupConfig(
        linear_iterations=0,
        deformable_levels=0,
        n_fixed=3,
        use_ransac=True,
        ransac_iterations=5000,
        ransac_inlier_distance=8.0,
        verbose=False,
        aot_warm=False,
    )
    reg = GroupRegistration(graph, cfg)
    reg.run()
    return native, reg, cloud


def test_ransac_both_sides_recover_planted_similarity(parity_runs_ransac):
    native, reg, cloud = parity_runs_ransac
    cpp_mov = np.asarray(native["images"][3]["xyz2"], np.float32).reshape(-1, 3)
    jax_mov = np.asarray(reg.arrays.xyz2)[3, : cloud.shape[0]]
    # both sides must place the moving image back onto the common cloud
    # (noise floor ~0.3 mm/axis; refits average it down)
    for name, got in (("cpp", cpp_mov), ("jax", jax_mov)):
        err = np.linalg.norm(got - cloud, axis=1)
        assert np.median(err) < 2.0, (name, np.median(err))


def test_ransac_inlier_counts_agree(parity_runs_ransac):
    native, reg, cloud = parity_runs_ransac
    cpp_inl = native["ransac_inliers"][0]
    jax_inl = reg.stats_record["RANSAC"][0]["inliers"]
    # ~75% of 3*400 half-links are true inliers; different draws land
    # within a few percent of each other
    assert cpp_inl > 600 and jax_inl > 600, (cpp_inl, jax_inl)
    assert abs(cpp_inl - jax_inl) < 0.1 * max(cpp_inl, jax_inl), (
        cpp_inl, jax_inl)


def test_ransac_transforms_agree(parity_runs_ransac):
    native, reg, cloud = parity_runs_ransac
    cpp_mov = np.asarray(native["images"][3]["xyz2"], np.float32).reshape(-1, 3)
    jax_mov = np.asarray(reg.arrays.xyz2)[3, : cloud.shape[0]]
    d = np.linalg.norm(cpp_mov - jax_mov, axis=1)
    assert np.median(d) < 1.0, np.median(d)
