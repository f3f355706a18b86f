"""End-to-end CLI tests: the full pipeline on tiny synthetic volumes."""
import json
import os

import numpy as np
import pytest

from frog_tpu.cli import main
from frog_tpu.io.mhd import read_volume, write_volume
from frog_tpu.io.volume import Volume


@pytest.fixture(scope="module")
def volume_dir(tmp_path_factory):
    """Three small blob volumes, translated copies of each other."""
    d = tmp_path_factory.mktemp("vols")
    rng = np.random.default_rng(0)
    shape = (48, 48, 48)
    g = np.stack(np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"), -1)
    data = np.zeros(shape, np.float32)
    centers = rng.uniform(10, 38, (25, 3))
    for c in centers:
        r2 = np.sum((g - c) ** 2, -1)
        data += np.float32(rng.uniform(40, 100)) * np.exp(
            -r2 / (2 * rng.uniform(1.5, 3.0) ** 2)
        ).astype(np.float32)
    shifts = [np.zeros(3), np.array([4.0, -2.0, 1.0]), np.array([-3.0, 5.0, -2.0])]
    for i, s in enumerate(shifts):
        write_volume(
            str(d / f"vol{i}.nii.gz"),
            Volume(data, origin=s, spacing=np.ones(3)),
        )
    return d, shifts


@pytest.fixture(scope="module")
def pipeline_run(volume_dir, tmp_path_factory):
    d, shifts = volume_dir
    out = tmp_path_factory.mktemp("out")
    rc = main(
        [
            "run",
            str(d),
            "-o",
            str(out),
            "-s",
            "1.0",
            "-p",
            "200",
            "-li",
            "20",
            "-dl",
            "1",
            "-di",
            "10",
            "-g",
            "40",
        ]
    )
    assert rc == 0
    return d, shifts, out


def test_run_outputs(pipeline_run):
    d, shifts, out = pipeline_run
    for f in (
        "pairs.bin",
        "volumes.txt",
        "measures.csv",
        "histograms.csv",
        "bbox.json",
    ):
        assert (out / f).exists(), f
    for i in range(3):
        assert (out / f"points{i}.csv.gz").exists()
        assert (out / "transforms" / f"{i}.json").exists()
    rec = json.loads((out / "bbox.json").read_text())
    assert rec["halfPairs"] > 0


def test_run_recovers_shifts(pipeline_run):
    """The recovered transforms must map the shifted volumes onto a common
    space: relative translations equal the planted shifts."""
    from frog_tpu.transforms import read_transform
    import jax.numpy as jnp

    d, shifts, out = pipeline_run
    probe = jnp.asarray([[24.0, 24.0, 24.0]])
    mapped = []
    for i in range(3):
        chain = read_transform(str(out / "transforms" / f"{i}.json"))
        mapped.append(np.asarray(chain(probe + jnp.asarray(shifts[i])))[0])
    # all images map their (shifted) anatomy to the same common point
    spread = np.linalg.norm(np.asarray(mapped) - np.mean(mapped, axis=0), axis=1)
    assert spread.max() < 1.0, (mapped, spread)


def test_cli_transform_average_dummy(pipeline_run):
    d, shifts, out = pipeline_run
    cwd = os.getcwd()
    os.chdir(out)
    try:
        rc = main(["dummy", "bbox.json", "2.0", "-o", "dummy.mhd"])
        assert rc == 0 and os.path.exists("dummy.mhd")
        for i in range(3):
            rc = main(
                [
                    "transform",
                    str(d / f"vol{i}.nii.gz"),
                    "dummy.mhd",
                    "-t",
                    f"transforms/{i}.json",
                    "-o",
                    f"warped{i}.nii.gz",
                ]
            )
            assert rc == 0
        rc = main(["average", "warped0.nii.gz", "warped1.nii.gz", "warped2.nii.gz"])
        assert rc == 0
        avg = read_volume("average.nii.gz")
        std = read_volume("stdev.nii.gz")
        assert np.isfinite(avg.data).all()
        # registered copies of the same volume: stdev must be small in the
        # interior compared to the mean's dynamic range
        interior = tuple(slice(4, -4) for _ in range(3))
        assert np.median(std.data[interior]) < 0.1 * avg.data.max()
    finally:
        os.chdir(cwd)


def test_cli_check_diffeomorphism(pipeline_run):
    d, shifts, out = pipeline_run
    rc = main(
        [
            "check",
            str(d / "vol0.nii.gz"),
            str(out / "transforms" / "0.json"),
            "4.0",
        ]
    )
    assert rc == 0  # no negative Jacobians


def test_cli_points_and_mesh(pipeline_run, tmp_path):
    d, shifts, out = pipeline_run
    rc = main(["points", "-p", "10", "10", "10", "-t", str(out / "transforms" / "0.json")])
    assert rc == 0
    from frog_tpu.io.polydata import PolyData, write_polydata, read_polydata

    mesh = PolyData(
        points=np.asarray([[10, 10, 10], [12, 10, 10], [10, 12, 10]], np.float32),
        faces=[[0, 1, 2]],
    )
    src = str(tmp_path / "m.ply")
    dst = str(tmp_path / "m_out.ply")
    write_polydata(src, mesh)
    rc = main(["mesh", src, dst, "-t", str(out / "transforms" / "0.json")])
    assert rc == 0
    back = read_polydata(dst)
    assert back.points.shape == (3, 3)


def test_cli_extract_and_match(volume_dir, tmp_path):
    d, shifts = volume_dir
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        for i in range(2):
            rc = main(
                [
                    "extract",
                    str(d / f"vol{i}.nii.gz"),
                    "-o",
                    f"pts{i}",
                    "-s",
                    "1.0",
                    "-n",
                    "150",
                ]
            )
            assert rc == 0
        with open("list.txt", "w") as f:
            f.write("pts0.csv.gz\npts1.csv.gz\n")
        rc = main(["match", "list.txt", "-o", "pairs.bin", "-d", "1e10"])
        assert rc == 0
        from frog_tpu.io.pairs import read_pairs

        g = read_pairs("pairs.bin")
        assert g.n_images == 2 and g.n_matches > 50
        rc = main(["register", "pairs.bin", "-li", "10", "-dl", "0"])
        assert rc == 0
        assert os.path.exists("transforms/0.json")
    finally:
        os.chdir(cwd)


def test_cli_view(pipeline_run):
    """frog-tpu view writes a self-contained HTML page embedding every
    image's transformed keypoint cloud in BOTH states (linear-only and
    final chain) with per-point link residuals (L5 viewer:
    js/pointsViewer.js scope + the residual inspection of the demo apps)."""
    d, shifts, out = pipeline_run
    rc = main(["view", str(out), "-o", str(out / "view.html"), "-n", "500"])
    assert rc == 0
    html = (out / "view.html").read_text()
    assert "<canvas" in html and "webgl" in html
    start = html.index("const DATA = ") + len("const DATA = ")
    data = json.loads(html[start : html.index(";\n", start)])
    assert len(data) == 3
    import base64

    def arr(b64):
        return np.frombuffer(base64.b64decode(b64), "<f4")

    for entry in data:
        for key in ("fin", "lin"):
            xyz = arr(entry[key])
            assert xyz.shape[0] == entry["count"] * 3
            assert np.isfinite(xyz).all()
        for key in ("efin", "elin"):
            e = arr(entry[key])
            assert e.shape[0] == entry["count"]
            assert (e >= 0).all() and (e <= 1).all()
        assert entry["count"] > 50
    start = html.index("const STATS = ") + len("const STATS = ")
    stats = json.loads(html[start : html.index(";\n", start)])
    # registration must have reduced the mean link residual
    assert stats["mean_fin"] <= stats["mean_lin"]
