"""Checkpoint/resume: an interrupted run resumed from disk must match an
uninterrupted run."""
import dataclasses

import numpy as np
import pytest

from frog_tpu.registration import GroupConfig, GroupRegistration
from tests.synthetic import make_synthetic_group


def full_config(ckpt=None, li=20, dl=1, di=20):
    return GroupConfig(
        linear_iterations=li,
        deformable_levels=dl,
        deformable_iterations=di,
        initial_grid_size=60.0,
        verbose=False,
        checkpoint_path=ckpt,
    )


def test_resume_matches_uninterrupted(tmp_path):
    graph, _ = make_synthetic_group(n_images=3, n_points=150, warp_amp=4.0, seed=8)

    # Uninterrupted reference run.
    ref = GroupRegistration(graph, full_config())
    ref.run()

    # Interrupted run: checkpointing enabled; simulate a crash by running a
    # truncated config (stops mid-deformable), then resume with the full
    # config from the checkpoint directory.
    ckpt = str(tmp_path / "ckpt")
    short_cfg = dataclasses.replace(
        full_config(ckpt=ckpt), deformable_iterations=10
    )
    interrupted = GroupRegistration(graph, short_cfg)
    # run only linear + part of deformable by catching a deliberate stop
    interrupted.run()  # completes 10 deformable iters, checkpoints on the way

    resumed = GroupRegistration(graph, full_config())
    resumed.run(resume_from=ckpt)

    # Resumed state continues to 20 iterations; the final coordinates must
    # match the uninterrupted run closely (same math, same chunking).
    np.testing.assert_allclose(
        np.asarray(resumed.arrays.xyz2),
        np.asarray(ref.arrays.xyz2),
        atol=1e-3,
    )
    assert len(resumed.measures) == len(ref.measures)
    es_ref = [m.E for m in ref.measures]
    es_res = [m.E for m in resumed.measures]
    np.testing.assert_allclose(es_res, es_ref, rtol=1e-4)


def test_resume_mid_linear(tmp_path):
    graph, _ = make_synthetic_group(n_images=3, n_points=120, seed=9)
    ckpt = str(tmp_path / "ckpt")

    ref = GroupRegistration(graph, full_config(li=20, dl=0))
    ref.run()

    short = GroupRegistration(
        graph, dataclasses.replace(full_config(ckpt=ckpt, dl=0), linear_iterations=10)
    )
    short.run()

    resumed = GroupRegistration(graph, full_config(li=20, dl=0))
    resumed.run(resume_from=ckpt)
    np.testing.assert_allclose(
        np.asarray(resumed.arrays.affine),
        np.asarray(ref.arrays.affine),
        atol=1e-4,
    )
