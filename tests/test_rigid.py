import numpy as np
import pytest

from frog_tpu.io.keypoints import Keypoints
from frog_tpu.rigid import (
    Edge,
    Match3DParams,
    RigidGraph,
    RigidGroupParams,
    StochasticParams,
    match3d,
    rigid_groupwise,
    solve_positions,
    stochastic_rigid,
)


def make_rigid_group(n=5, p=120, spread=60.0, seed=0):
    """Volumes = same keypoint cloud + per-volume translation, descriptors
    nearly identical."""
    rng = np.random.default_rng(seed)
    cloud = rng.uniform(0, 100, (p, 3)).astype(np.float32)
    desc = rng.normal(size=(p, 48)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    scale = rng.uniform(1.0, 2.0, p).astype(np.float32)
    lapl = rng.choice([-1.0, 1.0], p).astype(np.float32)
    kps = []
    offsets = []
    for i in range(n):
        t = rng.uniform(-spread, spread, 3).astype(np.float32)
        offsets.append(t)
        nd = desc + rng.normal(scale=0.01, size=desc.shape).astype(np.float32)
        kps.append(
            Keypoints(
                xyz=cloud + t,
                scale=scale.copy(),
                laplacian=lapl.copy(),
                response=rng.uniform(0, 1, p).astype(np.float32),
                desc=nd,
            )
        )
    return kps, np.asarray(offsets)


def test_match3d_recovers_translation():
    kps, offsets = make_rigid_group(n=2)
    rec = match3d(kps[0], kps[1], Match3DParams(matching_distance=1.0))
    assert not rec["fail"]
    assert rec["inliers"] > 80
    true_t = offsets[1] - offsets[0]
    np.testing.assert_allclose(rec["translation"], true_t, atol=0.5)
    assert abs(rec["scale"] - 1.0) < 0.05


def test_laplace_solver_exact_chain():
    # 3 nodes in a line with known relative offsets; model: b adds +t to i
    # and -t to j for edge (i,j), so t_ij = p_i - p_j.
    edges = [
        Edge(0, 1, np.array([1.0, 0, 0]), 1.0, 10),
        Edge(1, 2, np.array([2.0, 0, 0]), 1.0, 10),
    ]
    g = RigidGraph(3, edges)
    pos = solve_positions(g)
    # p0 - p1 = 1, p1 - p2 = 2, anchored p0 = 0
    np.testing.assert_allclose(pos[:, 0], [0.0, -1.0, -3.0], atol=1e-8)


def test_connectivity_repair_and_edge_removal():
    edges = [
        Edge(0, 1, np.zeros(3), 1.0, 5),
        Edge(1, 2, np.zeros(3), 1.0, 3),
    ]
    g = RigidGraph(4, edges)  # node 3 disconnected
    assert not g.is_connected()
    g.fix_connectivity()
    assert g.is_connected()
    # removing the only bridge must be refused
    g2 = RigidGraph(3, [Edge(0, 1, np.zeros(3), 1.0, 1), Edge(1, 2, np.zeros(3), 1.0, 2)])
    g2.remove_edge_batch(1.0)
    assert g2.is_connected()
    assert g2.n_edges() == 2


def test_rigid_groupwise_recovers_layout():
    kps, offsets = make_rigid_group(n=5)
    result = rigid_groupwise(
        kps,
        RigidGroupParams(match=Match3DParams(matching_distance=1.0)),
    )
    pos = result["positions"][:, :3]
    rel = pos - pos[0]
    true_rel = offsets - offsets[0]
    np.testing.assert_allclose(rel, true_rel, atol=1.0)
    assert result["numberOfEdges"] >= 4


def test_stochastic_rigid_converges():
    kps, offsets = make_rigid_group(n=12, p=80, seed=3)
    result = stochastic_rigid(
        kps,
        StochasticParams(
            batch_size=5,
            max_iterations=30,
            group=RigidGroupParams(match=Match3DParams(matching_distance=1.0)),
        ),
    )
    pos = result["positions"]
    # centered positions should match centered true offsets
    rel = pos - pos.mean(0)
    true_rel = offsets - offsets.mean(0)
    err = np.linalg.norm(rel - true_rel, axis=1)
    assert np.median(err) < 3.0, err
