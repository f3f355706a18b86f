"""Per-file rigid offsets in the match list, -n file cap, EM reservoir
mode, and the -dlinear/-dstats debug prints.

Reference semantics: match list rows are ``file[,tx,ty,tz]``
(match.cpp:454-493); the z offset shifts the z-slab filter
(match.cpp:538-546) and the whole offset is written to pairs.bin as
refTranslation (match.cpp:698-708).
"""
import numpy as np
import pytest

from frog_tpu.io.keypoints import Keypoints, write_keypoints
from frog_tpu.io.pairs import read_pairs
from frog_tpu.pipeline import match_stage, parse_match_list
from frog_tpu.ops.matcher import MatchParams


def _keypoints(rng, n, z_lo=0.0, z_hi=100.0):
    desc = rng.normal(size=(n, 48)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    xyz = rng.uniform(0, 100, (n, 3)).astype(np.float32)
    xyz[:, 2] = rng.uniform(z_lo, z_hi, n)
    return Keypoints(
        xyz=xyz,
        scale=np.full(n, 2.0, np.float32),
        laplacian=np.ones(n, np.float32),
        response=rng.uniform(0, 1, n).astype(np.float32),
        desc=desc,
    )


@pytest.fixture(scope="module")
def point_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("pts")
    rng = np.random.default_rng(3)
    files = []
    for i in range(3):
        kp = _keypoints(rng, 60)
        f = str(d / f"points{i}.csv.gz")
        write_keypoints(f, kp)
        files.append(f)
    return d, files


def test_parse_match_list_offsets(point_files, tmp_path):
    d, files = point_files
    lst = tmp_path / "list.txt"
    lst.write_text(
        f"{files[0]}\n{files[1]},1.5,-2.0,30\n{files[2]},0,0,0\n"
    )
    parsed, rigids = parse_match_list(str(lst))
    assert parsed == files
    assert rigids is not None
    np.testing.assert_allclose(rigids[1], [1.5, -2.0, 30.0])
    np.testing.assert_allclose(rigids[0], 0.0)


def test_parse_match_list_relative_appends_csv(tmp_path):
    lst = tmp_path / "list.txt"
    lst.write_text("pointsA\n")
    parsed, rigids = parse_match_list(str(lst))
    assert parsed == [str(tmp_path / "pointsA.csv")]
    assert rigids is None


def test_ref_translations_written_and_z_slab_shifted(point_files, tmp_path):
    d, files = point_files
    rigids = np.array([[0, 0, 0], [1.0, 2.0, 1000.0], [0, 0, 0]], float)
    out = str(tmp_path / "pairs.bin")
    # zmax=200: image 1's z offset of +1000 pushes every point out of the
    # slab, so it contributes no matches; its refTranslation still lands in
    # pairs.bin.
    graph = match_stage(
        files,
        MatchParams(max_distance=1e10, second_ratio=1.0),
        out_file=out,
        zmax=200.0,
        rigids=rigids,
        verbose=False,
    )
    assert len(graph.images[1].xyz) == 0
    assert len(graph.images[0].xyz) == 60
    rt = read_pairs(out)
    np.testing.assert_allclose(rt.images[1].ref_translation, [1.0, 2.0, 1000.0])
    np.testing.assert_allclose(rt.images[0].ref_translation, 0.0)


def test_max_files_cap(point_files, tmp_path):
    d, files = point_files
    graph = match_stage(
        files,
        MatchParams(max_distance=1e10, second_ratio=1.0),
        out_file=str(tmp_path / "pairs.bin"),
        max_files=2,
        verbose=False,
    )
    assert graph.n_images == 2


def test_write_points_dumps_pruned_keypoints(point_files, tmp_path, monkeypatch):
    """-p writes the post-prune keypoints to points<i>.csv
    (match.cpp:600-605)."""
    from frog_tpu.io.keypoints import read_keypoints

    _, files = point_files
    monkeypatch.chdir(tmp_path)
    match_stage(
        files,
        MatchParams(max_distance=1e10, second_ratio=1.0),
        out_file=str(tmp_path / "pairs.bin"),
        n_points=25,
        write_points=True,
        verbose=False,
    )
    for i in range(3):
        kp = read_keypoints(str(tmp_path / f"points{i}.csv"))
        assert len(kp) == 25
        # top-by-response pruning kept the highest responses
        orig = read_keypoints(files[i])
        assert kp.response.min() >= np.sort(orig.response)[-25]


def test_em_reservoir_mode():
    """Reservoir sampling EM lands near the full-sample EM parameters."""
    import dataclasses

    from frog_tpu.registration import GroupConfig, GroupRegistration
    from tests.synthetic import make_synthetic_group

    graph, _ = make_synthetic_group(seed=5, n_images=3, n_points=150)
    base_cfg = GroupConfig(
        linear_iterations=8, deformable_levels=0, verbose=False,
        use_ransac=False,
    )
    full = GroupRegistration(graph, base_cfg)
    full.run()
    res_cfg = dataclasses.replace(
        base_cfg, em_max_samples=64, em_sampling="reservoir"
    )
    res = GroupRegistration(graph, res_cfg)
    res.run()
    em_full = np.asarray(full.arrays.em)
    em_res = np.asarray(res.arrays.em)
    # subsampled EM is noisy but must stay in the same regime
    assert np.all(np.abs(em_res[:, 0] - em_full[:, 0]) < 5.0)
    assert np.all(em_res[:, 2] > 0) and np.all(em_res[:, 2] <= 1.0)
    # and the final affines must land near the full-sample result
    np.testing.assert_allclose(
        np.asarray(res.arrays.affine), np.asarray(full.arrays.affine),
        atol=1.0,
    )


def test_display_flags_print(capsys):
    from frog_tpu.registration import GroupConfig, GroupRegistration
    from tests.synthetic import make_synthetic_group

    graph, _ = make_synthetic_group(seed=6, n_images=3, n_points=100)
    cfg = GroupConfig(
        linear_iterations=4, deformable_levels=1, deformable_iterations=3,
        initial_grid_size=60.0, verbose=False, use_ransac=False,
        display_linear=True, display_stats=True,
    )
    reg = GroupRegistration(graph, cfg)
    reg.run()
    out = capsys.readouterr().out
    assert "translation=" in out and "scale=" in out  # imageGroup.cxx:600-627
    assert "c1=" in out and "nSamples=" in out  # stats.cxx:72-93
