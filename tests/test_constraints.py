"""Landmark hard constraints (-lc) pull same-name landmarks together."""
import numpy as np

from frog_tpu.registration import GroupConfig, GroupRegistration
from frog_tpu.registration.state import build_group_state
from tests.synthetic import landmark_dict, make_synthetic_group
from tests.test_group_linear import landmark_spread


def test_eval_landmarks_get_no_hard_links():
    graph, truth = make_synthetic_group(n_images=3, n_points=80)
    lms = landmark_dict(graph, truth, n_landmarks=3)
    arrays, meta = build_group_state(graph, landmarks=lms)
    assert not bool(np.asarray(arrays.hard_valid).any())
    assert len(meta.landmarks) == 3


def test_constraint_landmarks_get_hard_links():
    graph, truth = make_synthetic_group(n_images=3, n_points=80)
    lms = landmark_dict(graph, truth, n_landmarks=2)
    arrays, meta = build_group_state(graph, constraint_landmarks=lms)
    # each name: 3 images -> each landmark links to 2 others = 2 per image
    # per name; 2 names -> 4 hard links per image
    hv = np.asarray(arrays.hard_valid)
    assert hv.sum() == 3 * 2 * 2


def test_mixed_eval_and_constraint():
    graph, truth = make_synthetic_group(n_images=3, n_points=80)
    ev = landmark_dict(graph, truth, n_landmarks=2, seed=1)
    co = landmark_dict(graph, truth, n_landmarks=1, seed=2, prefix="c")
    arrays, meta = build_group_state(
        graph, landmarks=ev, constraint_landmarks=co
    )
    hv = np.asarray(arrays.hard_valid)
    assert hv.sum() == 3 * 2  # only the constraint name
    assert len(meta.landmarks) == 3


def test_constraints_tighten_registration():
    graph, truth = make_synthetic_group(
        n_images=4, n_points=200, warp_amp=6.0, noise=0.5, seed=21
    )
    ev = landmark_dict(graph, truth, n_landmarks=6, seed=3)
    co = landmark_dict(graph, truth, n_landmarks=4, seed=4, prefix="c")
    cfg = GroupConfig(
        linear_iterations=20,
        deformable_levels=1,
        deformable_iterations=30,
        initial_grid_size=60.0,
        verbose=False,
    )
    plain = GroupRegistration(graph, cfg, landmarks=ev)
    plain.run()
    constrained = GroupRegistration(graph, cfg, landmarks=ev, constraint_landmarks=co)
    constrained.run()
    # both converge; the constrained run must not be (much) worse on the
    # evaluation landmarks and its own constraint points coincide tightly
    s_plain = landmark_spread(plain)
    s_con = landmark_spread(constrained)
    assert s_con < s_plain * 1.5
