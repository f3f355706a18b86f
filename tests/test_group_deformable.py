import numpy as np
import pytest

from frog_tpu.registration import GroupConfig, GroupRegistration
from tests.synthetic import landmark_dict, make_synthetic_group
from tests.test_group_linear import landmark_spread


@pytest.fixture(scope="module")
def warped_run():
    graph, truth = make_synthetic_group(
        n_images=4,
        n_points=300,
        warp_amp=6.0,
        noise=0.3,
        outlier_fraction=0.05,
        seed=5,
    )
    lms = landmark_dict(graph, truth)
    cfg = GroupConfig(
        linear_iterations=30,
        deformable_levels=2,
        deformable_iterations=40,
        initial_grid_size=60.0,
        verbose=False,
    )
    reg = GroupRegistration(graph, cfg, landmarks=lms)
    reg.run()
    return graph, truth, reg


def test_deformable_improves_over_linear(warped_run):
    graph, truth, reg = warped_run
    es = [m.E for m in reg.measures]
    e_linear = es[29]
    e_final = es[-1]
    assert e_final < e_linear * 0.7, (e_linear, e_final)
    spread = landmark_spread(reg)
    spread_linear = reg.measures[29].landmark_av
    assert spread < spread_linear * 0.75, (spread_linear, spread)
    assert spread < 3.5, f"landmark spread {spread}"


def test_chain_reproduces_final_positions(warped_run):
    import jax.numpy as jnp

    graph, truth, reg = warped_run
    i = 2
    chain = reg.chains[i]
    assert len(chain) >= 3  # affine + >= 2 grids
    src = jnp.asarray(graph.images[i].xyz)
    got = np.asarray(chain(src))
    want = np.asarray(reg.arrays.xyz2[i][: src.shape[0]])
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_diffeomorphism_of_result(warped_run):
    """The guaranteed-diffeomorphism constraint must hold: sample the
    Jacobian of every chain over the group bbox (the CheckDiffeomorphism
    invariant, tools/CheckDiffeomorphism.cxx:67-91)."""
    import jax.numpy as jnp

    graph, truth, reg = warped_run
    lo, hi = reg._movable_bbox()
    g = np.stack(
        np.meshgrid(*[np.linspace(lo[k], hi[k], 8) for k in range(3)], indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    pts = jnp.asarray(g, jnp.float32)
    for chain in reg.chains:
        jac = np.asarray(chain.jacobian(pts))
        dets = np.linalg.det(jac)
        assert (dets > 0).all(), f"negative Jacobians: {(dets <= 0).sum()}"


def test_stats_record_complete(warped_run):
    graph, truth, reg = warped_run
    rec = reg.stats_record
    assert rec["halfPairs"] == rec["inliers"] + rec["outliers"]
    assert 0 <= rec["outlierRatio"] <= 1
    assert len(rec["images"]) == 4
    assert rec["images"][1]["EMStats"]["c1"] < rec["images"][1]["EMStats"]["c2"]
    assert len(reg.grids_per_level) == 2
