"""Numeric cross-validation of the JAX 3D-SURF extractor against the
reference-equivalent C++ implementation (native/baseline_extract.cpp).

Both run the same algorithm — isotropic resample, integral-volume
box-filter Hessian stack over lobes 3..33 (Sylvester blobness gate,
imageGroup's surf3d component C1), 26+scale NMS, top-n, per-axis
sub-voxel refinement, M-SURF-3D descriptor — the C++ side in the
reference's per-voxel OpenMP style, the JAX side as fused device passes.
Agreement of keypoint positions/scales/signs/responses and descriptor
direction is the extractor analog of test_parity_native.py.
"""
import os
import struct
import subprocess

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(ROOT, "native", "baseline_extract")

# 60 blobs and a 60-point budget: the top-k is then dominated by real
# structure, where both implementations must agree; a larger budget would
# fill with noise peaks whose NMS outcome is float32-vs-double noise.
N_POINTS = 60


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


def _blobby_volume(shape=(72, 72, 72), n_blobs=60, seed=11):
    """Interior Gaussian blobs of mixed polarity and size — far enough
    from the border that descriptor Haar boxes stay inside the volume."""
    rng = np.random.default_rng(seed)
    g = np.stack(
        np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"), -1
    ).astype(np.float32)
    data = np.zeros(shape, np.float32)
    for _ in range(n_blobs):
        c = rng.uniform(18, shape[0] - 18, 3).astype(np.float32)
        sigma = rng.uniform(1.8, 4.5)
        amp = rng.uniform(60, 200) * rng.choice([-1.0, 1.0])
        d2 = np.sum((g - c) ** 2, axis=-1)
        data += amp * np.exp(-d2 / (2 * sigma * sigma))
    data += rng.normal(scale=0.5, size=shape).astype(np.float32)
    return data


@pytest.fixture(scope="module")
def parity_runs(tmp_path_factory):
    if not _ensure_binary():
        pytest.skip("no C++ toolchain for native baseline")
    tmp = tmp_path_factory.mktemp("extract_parity")
    data = _blobby_volume()

    # --- C++ baseline
    raw = str(tmp / "vol.raw")
    with open(raw, "wb") as f:
        np.asarray(data.shape, np.int32).tofile(f)
        np.asarray([1.0, 1.0, 1.0], np.float32).tofile(f)
        data.astype(np.float32).tofile(f)
    out_bin = str(tmp / "kp.bin")
    subprocess.run(
        [BIN, raw, "1.0", str(N_POINTS), out_bin],
        check=True,
        capture_output=True,
    )
    with open(out_bin, "rb") as f:
        (n,) = struct.unpack("<i", f.read(4))
        rows = np.fromfile(f, np.float32).reshape(n, 54)
    cpp = {
        "xyz": rows[:, 0:3],
        "sigma": rows[:, 3],
        "lapl": rows[:, 4],
        "resp": rows[:, 5],
        "desc": rows[:, 6:54],
    }

    # --- JAX extractor (spacing 1.0 on a spacing-1.0 volume: identity
    # resample, so both sides see the same voxel grid)
    from frog_tpu.io.volume import Volume
    from frog_tpu.ops.surf3d import SurfParams, extract_keypoints

    vol = Volume(data, origin=(0.0, 0.0, 0.0), spacing=(1.0, 1.0, 1.0))
    kp = extract_keypoints(
        vol, SurfParams(spacing=1.0, threshold=0.0, n_points=N_POINTS)
    )
    return cpp, kp


def _match(cpp, kp, tol=0.75):
    """Greedy nearest-position matching between the two keypoint sets."""
    d = np.linalg.norm(cpp["xyz"][:, None, :] - kp.xyz[None, :, :], axis=-1)
    j = np.argmin(d, axis=1)
    ok = d[np.arange(len(j)), j] < tol
    return j, ok


def test_keypoint_sets_agree(parity_runs):
    cpp, kp = parity_runs
    j, ok = _match(cpp, kp)
    # Strong detections (real blobs, top third by response) must all be
    # shared; weaker peaks live in scale-space tie regions where
    # float32-vs-double cancellation in the Hessian determinant can move
    # the winner a voxel or a scale slot, so the overall bar is looser.
    strong = np.argsort(-cpp["resp"])[: len(cpp["resp"]) // 3]
    assert ok[strong].mean() > 0.97, (
        f"only {ok[strong].mean():.0%} of strong C++ keypoints matched"
    )
    assert ok.mean() > 0.75, f"only {ok.mean():.0%} of C++ keypoints matched"


def test_scales_signs_responses_agree(parity_runs):
    cpp, kp = parity_runs
    j, ok = _match(cpp, kp)
    sel = np.flatnonzero(ok)
    pj = j[sel]
    # scale: world scale = sigma_vox * spacing (spacing 1.0 here)
    np.testing.assert_allclose(kp.scale[pj], cpp["sigma"][sel], rtol=1e-5)
    assert (kp.laplacian[pj] == cpp["lapl"][sel]).mean() > 0.98
    # responses: double vs float32 accumulation
    rel = np.abs(kp.response[pj] - cpp["resp"][sel]) / np.maximum(
        cpp["resp"][sel], 1e-12
    )
    assert np.median(rel) < 1e-3, f"median resp rel err {np.median(rel):.2g}"
    assert np.quantile(rel, 0.9) < 1e-2


def test_descriptors_agree(parity_runs):
    cpp, kp = parity_runs
    j, ok = _match(cpp, kp)
    sel = np.flatnonzero(ok)
    pj = j[sel]
    a = cpp["desc"][sel]
    b = np.asarray(kp.desc)[pj]
    cos = np.sum(a * b, axis=1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-12
    )
    # dense-Haar JAX formulation vs integral-volume corner reads: exactly
    # the same boxes (descriptor.py _haar == baseline_extract.cpp), bf16
    # sampling on the JAX side
    assert np.median(cos) > 0.9995, f"median desc cosine {np.median(cos):.5f}"
    assert np.quantile(cos, 0.1) > 0.995, (
        f"p10 desc cosine {np.quantile(cos, 0.1):.5f}"
    )
