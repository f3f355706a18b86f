"""Two-process jax.distributed test: coordinator on localhost, pair-
partitioned matching with part-file merge, then a groupwise optimization
on the merged graph — asserted equal to the single-process result.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_match_and_register(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # avoid remote-TPU claim stall
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(tmp_path), coordinator, "2", str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    with open(tmp_path / "result.json") as f:
        result = json.load(f)
    # parts must exist and their union equal a single-process match
    assert (tmp_path / "pairs.bin.part0").exists()
    assert (tmp_path / "pairs.bin.part1").exists()

    from frog_tpu.io.pairs import read_pairs
    from frog_tpu.ops.matcher import MatchParams, match_graph
    from frog_tpu.io.keypoints import read_keypoints

    kps = [read_keypoints(str(tmp_path / f"points{i}.csv.gz")) for i in range(4)]
    single = match_graph(kps, MatchParams(max_distance=1e10, second_ratio=1.0))
    merged = read_pairs(str(tmp_path / "pairs.bin"))
    assert merged.n_matches == single.n_matches
    assert sorted(merged.matches.keys()) == sorted(single.matches.keys())
    for key in single.matches:
        np.testing.assert_array_equal(
            np.sort(merged.matches[key], axis=0), np.sort(single.matches[key], axis=0)
        )

    # process-0 optimization on the merged graph reproduces the
    # single-process trajectory
    from frog_tpu.registration import GroupConfig, GroupRegistration

    cfg = GroupConfig(
        linear_iterations=5, deformable_levels=1, deformable_iterations=4,
        initial_grid_size=50.0, verbose=False, use_ransac=False,
    )
    reg = GroupRegistration(single, cfg)
    reg.run()
    np.testing.assert_allclose(
        result["es"], [m.E for m in reg.measures], rtol=1e-5
    )
