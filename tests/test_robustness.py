"""Robustness fixtures beyond the happy path (VERDICT r4 #8).

The synthetic bench fixture is one texture under smooth warps with full
overlap; these tests exercise the reference's degraded-input behaviors
end-to-end through the CLI / optimizer:

* partial-overlap pairs via the z-slab filter (-zmin/-zmax,
  match.cpp:538-546)
* masked extraction (surf3d -m, FROG.py:203)
* a match graph with an ISOLATED image: the linear update's NaN gate
  freezes it at its anchor-centering init, the deformable update leaves
  its grid at the (mean-subtracted) hubless compensation, and the run
  completes finite — while the rigid Laplacian path repairs the graph
  (laplaceSolver.js:185-212) and stochastic mode ejects outliers
  (stochasticRigidRegistration.js:416-418), both covered in
  tests/test_rigid.py.
"""
import gzip
import os

import numpy as np
import pytest

from frog_tpu.cli import main
from frog_tpu.io.keypoints import Keypoints, write_keypoints
from frog_tpu.io.pairs import read_pairs
from frog_tpu.registration import GroupConfig, GroupRegistration
from tests.synthetic import make_synthetic_group


def _cloud_keypoints(rng, n, extent=100.0, z_shift=0.0):
    xyz = rng.uniform(0, extent, (n, 3)).astype(np.float32)
    xyz[:, 2] += z_shift
    desc = rng.normal(size=(n, 48)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    return xyz, desc


@pytest.fixture(scope="module")
def partial_overlap_files(tmp_path_factory):
    """Two keypoint files observing one cloud, each covering only part of
    the z range: image 0 sees z in [0, 120], image 1 sees z in [60, 180]
    — the overlap slab is [60, 120]."""
    tmp = tmp_path_factory.mktemp("zslab")
    rng = np.random.default_rng(7)
    n = 400
    cloud = rng.uniform(0, 100, (n, 3)).astype(np.float32)
    cloud[:, 2] = rng.uniform(0, 180, n).astype(np.float32)
    desc = rng.normal(size=(n, 48)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    files = []
    for i, (lo, hi) in enumerate([(0.0, 120.0), (60.0, 180.0)]):
        keep = (cloud[:, 2] >= lo) & (cloud[:, 2] <= hi)
        kp = Keypoints(
            xyz=cloud[keep] + rng.normal(scale=0.05, size=(keep.sum(), 3)
                                         ).astype(np.float32),
            scale=np.full(keep.sum(), 2.0, np.float32),
            laplacian=np.ones(keep.sum(), np.float32),
            response=np.ones(keep.sum(), np.float32),
            desc=desc[keep] + rng.normal(
                scale=0.01, size=(keep.sum(), 48)).astype(np.float32),
        )
        f = str(tmp / f"points{i}.csv.gz")
        write_keypoints(f, kp)
        files.append(f)
    lst = str(tmp / "list.txt")
    with open(lst, "w") as fh:
        fh.write("\n".join(os.path.basename(f) for f in files))
    return tmp, lst, files


def test_cli_match_zslab_partial_overlap(partial_overlap_files, tmp_path):
    """-zmin/-zmax restricts matching to the overlap slab
    (match.cpp:538-546): every accepted match lies inside it, and the
    graph still forms (partial overlap is the use case the flag exists
    for)."""
    tmp, lst, files = partial_overlap_files
    out = str(tmp_path / "pairs.bin")
    rc = main(["match", lst, "-o", out, "-d", "1.0", "-d2", "0.95",
               "-zmin", "60", "-zmax", "120"])
    assert rc == 0
    graph = read_pairs(out)
    m = graph.matches[(0, 1)]
    assert m.shape[0] > 10  # the overlap slab yields a usable graph
    za = graph.images[0].xyz[m[:, 0], 2]
    zb = graph.images[1].xyz[m[:, 1], 2]
    assert za.min() >= 60 - 0.5 and za.max() <= 120 + 0.5
    assert zb.min() >= 60 - 0.5 and zb.max() <= 120 + 0.5


def test_cli_match_no_zslab_spans_full_range(partial_overlap_files, tmp_path):
    tmp, lst, files = partial_overlap_files
    out = str(tmp_path / "pairs_full.bin")
    rc = main(["match", lst, "-o", out, "-d", "1.0", "-d2", "0.95"])
    assert rc == 0
    graph = read_pairs(out)
    m = graph.matches[(0, 1)]
    za = graph.images[0].xyz[m[:, 0], 2]
    # without the slab, matches cover the whole shared support
    assert za.max() - za.min() > 55.0
    assert m.shape[0] > 10


def test_cli_masked_extraction(tmp_path):
    """surf3d -m end-to-end: keypoints land only where mask > 0
    (FROG.py:203)."""
    from frog_tpu.io.mhd import write_volume
    from frog_tpu.io.volume import Volume

    rng = np.random.default_rng(3)
    shape = (48, 48, 48)
    g = np.stack(np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"),
                 -1)
    data = np.zeros(shape, np.float32)
    for c in rng.uniform(8, 40, (20, 3)):
        r2 = np.sum((g - c) ** 2, -1)
        data += np.float32(80.0) * np.exp(-r2 / 8.0).astype(np.float32)
    vol = str(tmp_path / "vol.nii.gz")
    write_volume(vol, Volume(data, origin=np.zeros(3), spacing=np.ones(3)))
    mask = np.zeros(shape, np.float32)
    mask[:, :, :24] = 1.0  # only the lower-z half is admissible
    mask_f = str(tmp_path / "mask.nii.gz")
    write_volume(mask_f, Volume(mask, origin=np.zeros(3), spacing=np.ones(3)))

    out = str(tmp_path / "pts")
    rc = main(["extract", vol, "-o", out, "-s", "1.0", "-n", "100",
               "-m", mask_f])
    assert rc == 0
    with gzip.open(out + ".csv.gz", "rt") as f:
        rows = np.asarray(
            [[float(c) for c in line.split(",") if c.strip()]
             for line in f if line.strip()]
        )
    assert rows.shape[0] > 5
    assert rows[:, 2].max() < 24.5  # all keypoints inside the mask


def test_isolated_image_full_deformable_run():
    """An image with NO matches at all rides through the FULL optimizer
    (linear + multi-grid deformable with the guarantee ON): the run
    stays finite, the connected images converge, and the isolated image
    receives only its anchor-centering init plus the hubless
    mean-subtraction compensation — exactly the reference's behavior
    (its per-image sums are empty -> NaN-gated, imageGroup.cxx:1124-1141;
    mean subtraction applies to every image, :379-432)."""
    graph, truth = make_synthetic_group(
        seed=77, n_images=4, n_points=250, extent=200.0, warp_amp=6.0,
        noise=0.4, outlier_fraction=0.05, match_fraction=0.9,
    )
    # disconnect image 3 completely
    graph.matches = {
        k: m for k, m in graph.matches.items() if 3 not in k
    }
    cfg = GroupConfig(
        linear_iterations=15,
        deformable_levels=2,
        deformable_iterations=15,
        initial_grid_size=60.0,
        guarantee_diffeomorphism=True,
        verbose=False,
    )
    reg = GroupRegistration(graph, cfg)
    reg.run()
    es = np.asarray([m.E for m in reg.measures])
    assert np.all(np.isfinite(es))
    assert es[-1] < es[0]
    xyz2 = np.asarray(reg.arrays.xyz2)
    assert np.all(np.isfinite(xyz2))
    affine = np.asarray(reg.arrays.affine)
    # isolated image: linear scale NaN-gated to identity, translation =
    # anchor-centering init (no link gradient ever applies)
    np.testing.assert_allclose(np.diagonal(affine[3])[:3], 1.0, atol=1e-6)
    # census reports its emptiness honestly
    census = reg.stats_record["images"][3]
    assert census["pairs"] == 0
    # connected images still registered: their spread shrank
    before = np.stack([im.xyz for im in graph.images[:3]])
    d0 = np.linalg.norm(before[0] - before[1], axis=1).mean()
    d1 = np.linalg.norm(
        xyz2[0, :250] - xyz2[1, :250], axis=1
    ).mean()
    assert d1 < 0.35 * d0


def test_isolated_image_rigid_graph_repair():
    """The rigid Laplacian path REPAIRS a disconnected graph instead of
    freezing the node (laplaceSolver.js:185-216): after repair every
    image gets a finite position estimate."""
    from frog_tpu.rigid.laplace import Edge, RigidGraph, solve_positions

    edges = [
        Edge(0, 1, np.array([1.0, 0, 0]), 1.0, 50),
        Edge(1, 2, np.array([0, 1.0, 0]), 1.0, 40),
    ]
    g = RigidGraph(4, edges)  # node 3 has no edges at all
    assert not g.is_connected()
    g.fix_connectivity()
    assert g.is_connected()
    pos = solve_positions(g)
    assert np.all(np.isfinite(pos))
