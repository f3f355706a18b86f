import numpy as np
import pytest

from frog_tpu.io.keypoints import Keypoints
from frog_tpu.ops.matcher import MatchParams, match_all_pair, match_graph, match_pair


def brute_force_reference(kp_a, kp_b, params):
    """Direct port of the reference matching semantics (match.cpp:255-336)
    in numpy, used as ground truth for the tiled kernel."""
    out = []
    for i in range(len(kp_b)):
        d1 = d2 = np.inf
        match = 0
        for j in range(len(kp_a)):
            if kp_b.laplacian[i] != kp_a.laplacian[j]:
                continue
            s = kp_b.scale[i] / kp_a.scale[j]
            if s > params.scale_ratio or 1 / s > params.scale_ratio:
                continue
            if params.anat_distance > 0:
                if (
                    np.linalg.norm(kp_b.xyz[i] - kp_a.xyz[j])
                    > params.anat_distance
                ):
                    continue
            dist = float(np.sum((kp_b.desc[i] - kp_a.desc[j]) ** 2))
            if dist < d1:
                d2 = d1
                d1 = dist
                match = j
            elif dist < d2:
                d2 = dist
        if (np.sqrt(d1 / d2) < params.second_ratio or np.isinf(d2)) and np.sqrt(
            d1
        ) < params.max_distance:
            out.append((match, i))
    return np.asarray(out, dtype=np.int64).reshape(-1, 2)


def random_keypoints(rng, n, planted_from=None, noise=0.01):
    desc = rng.normal(size=(n, 48)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    if planted_from is not None:
        desc = planted_from.desc + rng.normal(scale=noise, size=(n, 48)).astype(
            np.float32
        )
    return Keypoints(
        xyz=rng.uniform(0, 100, (n, 3)).astype(np.float32),
        scale=rng.uniform(1.0, 3.0, n).astype(np.float32),
        laplacian=rng.choice([-1.0, 1.0], n).astype(np.float32),
        response=rng.uniform(0, 1, n).astype(np.float32),
        desc=desc,
    )


def test_match_pair_equals_brute_force():
    rng = np.random.default_rng(0)
    kp_a = random_keypoints(rng, 300)
    kp_b = random_keypoints(rng, 200)
    # make half of B's points near-copies of A's so real matches exist
    kp_b.desc[:100] = kp_a.desc[:100] + rng.normal(
        scale=0.02, size=(100, 48)
    ).astype(np.float32)
    kp_b.scale[:100] = kp_a.scale[:100]
    kp_b.laplacian[:100] = kp_a.laplacian[:100]
    params = MatchParams(max_distance=0.5, second_ratio=0.9, fast=False)
    got = match_pair(kp_a, kp_b, params)
    want = brute_force_reference(kp_a, kp_b, params)
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.sort(got, axis=0), np.sort(want, axis=0))


def test_match_pair_threshold_only():
    rng = np.random.default_rng(1)
    kp_a = random_keypoints(rng, 150)
    kp_b = random_keypoints(rng, 130)
    params = MatchParams(max_distance=2.0, second_ratio=1.0, fast=False)
    got = match_pair(kp_a, kp_b, params)
    want = brute_force_reference(kp_a, kp_b, params)
    np.testing.assert_array_equal(np.sort(got, axis=0), np.sort(want, axis=0))


def test_planted_correspondences_found():
    rng = np.random.default_rng(2)
    kp_a = random_keypoints(rng, 400)
    kp_b = Keypoints(
        xyz=kp_a.xyz.copy(),
        scale=kp_a.scale.copy(),
        laplacian=kp_a.laplacian.copy(),
        response=kp_a.response.copy(),
        desc=(kp_a.desc + rng.normal(scale=0.005, size=kp_a.desc.shape)).astype(
            np.float32
        ),
    )
    params = MatchParams(max_distance=0.3, second_ratio=0.8)
    m = match_pair(kp_a, kp_b, params)
    # nearly all planted correspondences recovered as identity pairs
    assert m.shape[0] > 350
    frac_correct = np.mean(m[:, 0] == m[:, 1])
    assert frac_correct > 0.98


def test_match_all_mode():
    rng = np.random.default_rng(3)
    kp_a = random_keypoints(rng, 50)
    kp_b = random_keypoints(rng, 40)
    params = MatchParams(max_distance=1.2, match_all=True)
    m = match_all_pair(kp_a, kp_b, params)
    # verify against direct computation
    cnt = 0
    for i in range(40):
        for j in range(50):
            if kp_b.laplacian[i] != kp_a.laplacian[j]:
                continue
            s = kp_b.scale[i] / kp_a.scale[j]
            if s > 1.3 or 1 / s > 1.3:
                continue
            if np.sqrt(np.sum((kp_b.desc[i] - kp_a.desc[j]) ** 2)) < 1.2:
                cnt += 1
    assert m.shape[0] == cnt


def test_match_graph_target_mode():
    rng = np.random.default_rng(4)
    kps = [random_keypoints(rng, 60) for _ in range(4)]
    params = MatchParams(max_distance=2.0)
    g = match_graph(kps, params, target=3)
    assert set(k[0] for k in g.matches) <= {0, 1, 2}
    assert all(k[1] == 3 for k in g.matches)
    g_full = match_graph(kps, params)
    assert len(g_full.matches) == 6


def test_match_graph_symmetric():
    rng = np.random.default_rng(5)
    kps = [random_keypoints(rng, 80) for _ in range(2)]
    params = MatchParams(max_distance=2.0, symmetric=True)
    g = match_graph(kps, params)
    m = g.matches[(0, 1)]
    params1 = MatchParams(max_distance=2.0)
    fwd = match_pair(kps[0], kps[1], params1)
    rev = match_pair(kps[1], kps[0], params1)
    assert m.shape[0] == fwd.shape[0] + rev.shape[0]


def test_fast_mode_agreement():
    """bf16 ranking + exact rescore must agree with full-precision mode on
    realistic (planted + noise) descriptors for virtually every point."""
    rng = np.random.default_rng(7)
    kp_a = random_keypoints(rng, 500)
    kp_b = Keypoints(
        xyz=kp_a.xyz.copy(),
        scale=kp_a.scale.copy(),
        laplacian=kp_a.laplacian.copy(),
        response=kp_a.response.copy(),
        desc=(kp_a.desc + rng.normal(scale=0.02, size=kp_a.desc.shape)).astype(
            np.float32
        ),
    )
    exact = match_pair(kp_a, kp_b, MatchParams(max_distance=0.5, second_ratio=0.9, fast=False))
    fast = match_pair(kp_a, kp_b, MatchParams(max_distance=0.5, second_ratio=0.9, fast=True))
    se = set(map(tuple, exact.tolist()))
    sf = set(map(tuple, fast.tolist()))
    overlap = len(se & sf) / max(len(se | sf), 1)
    assert overlap > 0.99, overlap


def test_mesh_sharded_match_equals_single_device():
    """Pair-chunk-sharded matching on a device mesh must reproduce the
    single-device match graph exactly (match.cpp:638-652's all-cores loop,
    per device)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from frog_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(11)
    kps = []
    base = random_keypoints(rng, 220)
    for k in range(5):
        kp = random_keypoints(rng, 200 + 7 * k, planted_from=None)
        kp.desc[:120] = base.desc[:120] + rng.normal(
            scale=0.02, size=(120, 48)
        ).astype(np.float32)
        kp.scale[:120] = base.scale[: 120]
        kp.laplacian[:120] = base.laplacian[:120]
        kps.append(kp)
    params = MatchParams(max_distance=0.6, second_ratio=0.92)
    single = match_graph(kps, params)
    mesh = make_mesh(8)
    sharded = match_graph(kps, params, mesh=mesh)
    assert set(single.matches) == set(sharded.matches)
    for key in single.matches:
        np.testing.assert_array_equal(single.matches[key], sharded.matches[key])


def test_mesh_sharded_match_symmetric_and_target():
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from frog_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(12)
    kps = [random_keypoints(rng, 150 + 11 * k) for k in range(4)]
    params = MatchParams(max_distance=1.5, second_ratio=1.0, symmetric=True)
    mesh = make_mesh(4)
    single = match_graph(kps, params, target=2)
    sharded = match_graph(kps, params, target=2, mesh=mesh)
    assert set(single.matches) == set(sharded.matches)
    for key in single.matches:
        np.testing.assert_array_equal(single.matches[key], sharded.matches[key])
