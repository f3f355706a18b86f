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
