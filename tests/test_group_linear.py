import numpy as np

from frog_tpu.registration import GroupConfig, GroupRegistration
from tests.synthetic import landmark_dict, make_synthetic_group


def landmark_spread(reg):
    xyz2 = np.asarray(reg.arrays.xyz2)
    spreads = []
    for name, entries in reg.meta.landmarks.items():
        pos = np.stack([xyz2[img, pt] for img, pt in entries])
        center = pos.mean(axis=0)
        spreads.append(np.linalg.norm(pos - center, axis=1).mean())
    return float(np.mean(spreads))


def test_linear_recovers_similarity():
    graph, truth = make_synthetic_group(
        n_images=4, n_points=200, warp_amp=0.0, noise=0.3, outlier_fraction=0.1
    )
    lms = landmark_dict(graph, truth)
    cfg = GroupConfig(
        linear_iterations=50,
        deformable_levels=0,
        verbose=False,
    )
    reg = GroupRegistration(graph, cfg, landmarks=lms)
    reg.run()

    # Landmark spread after linear registration should be small: the
    # images differ by pure similarities, so the group must converge to a
    # common space up to noise.
    spread = landmark_spread(reg)
    assert spread < 2.0, f"landmark spread {spread}"

    # Energy decreased monotonically-ish and substantially.
    es = [m.E for m in reg.measures]
    assert es[-1] < es[0] * 0.5

    # Measures recorded per iteration.
    assert len(reg.measures) == 50
    assert reg.measures[-1].landmark_av < 1.0


def test_linear_respects_fixed_images():
    graph, truth = make_synthetic_group(n_images=3, n_points=150)
    cfg = GroupConfig(
        linear_iterations=10, deformable_levels=0, n_fixed=1,
        use_ransac=False, verbose=False,
    )
    reg = GroupRegistration(graph, cfg)
    x0 = np.asarray(reg.arrays.xyz[0]).copy()
    reg.run()
    # Fixed image's coordinates and transform must be untouched.
    np.testing.assert_allclose(np.asarray(reg.arrays.xyz[0]), x0)
    np.testing.assert_allclose(
        np.asarray(reg.arrays.affine[0]), np.eye(4), atol=1e-6
    )


def test_outputs_written(tmp_path):
    graph, truth = make_synthetic_group(n_images=3, n_points=100)
    lms = landmark_dict(graph, truth, n_landmarks=4)
    cfg = GroupConfig(
        linear_iterations=5, deformable_levels=0, verbose=False, write_pairs=True,
        single_file_transforms=True,
    )
    reg = GroupRegistration(graph, cfg, landmarks=lms, output_dir=str(tmp_path))
    reg.run().save_outputs()

    assert (tmp_path / "measures.csv").exists()
    assert (tmp_path / "histograms.csv").exists()
    assert (tmp_path / "histograms_linear.csv").exists()
    assert (tmp_path / "bbox.json").exists()
    assert (tmp_path / "distances.txt").exists()
    assert (tmp_path / "transformedLandmarks.json").exists()
    assert (tmp_path / "pairs.csv.gz").exists()
    for i in range(3):
        assert (tmp_path / "transforms" / f"{i}.json").exists()

    import json

    rec = json.loads((tmp_path / "bbox.json").read_text())
    assert "bbox" in rec and "images" in rec and len(rec["images"]) == 3
    assert rec["halfPairs"] == rec["inliers"] + rec["outliers"]

    # Transforms parse back and reproduce xyz2 from the original points.
    from frog_tpu.transforms import read_transform
    import jax.numpy as jnp

    chain = read_transform(str(tmp_path / "transforms" / "1.json"))
    src = jnp.asarray(graph.images[1].xyz)
    got = np.asarray(chain(src))
    want = np.asarray(reg.arrays.xyz2[1][: src.shape[0]])
    np.testing.assert_allclose(got, want, atol=1e-3)
