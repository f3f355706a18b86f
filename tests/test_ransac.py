import numpy as np
import jax.numpy as jnp

from frog_tpu.registration import GroupConfig, GroupRegistration
from frog_tpu.registration.ransac import horn_similarity
from frog_tpu.transforms import Affine, TransformChain
from tests.synthetic import landmark_dict, make_synthetic_group
from tests.test_group_linear import landmark_spread


def test_horn_similarity_exact():
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 50, (20, 3)).astype(np.float32)
    # ground truth: rotation about z + scale + translation
    th = 0.4
    rot = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
        np.float32,
    )
    s, t = 1.3, np.array([5.0, -2.0, 7.0], np.float32)
    dst = (src @ rot.T) * s + t
    mat = np.asarray(horn_similarity(jnp.asarray(src), jnp.asarray(dst)))
    got = src @ mat[:3, :3].T + mat[:3, 3]
    np.testing.assert_allclose(got, dst, atol=1e-2)
    np.testing.assert_allclose(np.abs(np.linalg.det(mat[:3, :3])), s**3, rtol=1e-3)


def test_ransac_fixed_image_registration():
    """Register one new image against a frozen group via RANSAC
    (reference fixed-image mode, imageGroup.cxx:40-49 + tools/register.py)."""
    graph, truth = make_synthetic_group(
        n_images=3, n_points=250, warp_amp=0.0, noise=0.3,
        outlier_fraction=0.3, translation_scale=25.0, seed=11,
    )
    lms = landmark_dict(graph, truth, n_landmarks=6)
    # Fixed images 0 and 1 enter with their ground-truth image->common maps.
    fixed_chains = []
    for i in range(2):
        t, s = truth["images"][i]["t"], truth["images"][i]["s"]
        m = np.diag([s[0], s[1], s[2], 1.0]).astype(np.float32)
        m[:3, 3] = t
        fixed_chains.append(
            TransformChain(transforms=(Affine(matrix=jnp.asarray(m)),))
        )
    cfg = GroupConfig(
        n_fixed=2,
        use_ransac=True,
        ransac_iterations=2000,
        ransac_inlier_distance=10.0,
        deformable_levels=0,
        verbose=False,
    )
    reg = GroupRegistration(graph, cfg, landmarks=lms, fixed_chains=fixed_chains)
    reg.run()

    # The moving image must land on the true common space: its recovered
    # affine composed with the true inverse is near identity on points.
    spread = landmark_spread(reg)
    assert spread < 2.0, f"landmark spread {spread}"
    assert reg.stats_record["RANSAC"][0]["inliers"] > 100
    # Fixed images untouched.
    np.testing.assert_allclose(
        np.asarray(reg.arrays.affine[0]), np.eye(4), atol=1e-6
    )
