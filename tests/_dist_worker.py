"""Worker for the 2-process jax.distributed test (run via subprocess).

Usage: python _dist_worker.py <workdir> <coordinator> <nproc> <pid>

Each process: initialize jax.distributed -> build the same synthetic
keypoints -> distributed pair-partitioned matching (each writes its
pairs.bin.part<pid>; process 0 merges) -> process 0 runs a short groupwise
optimization and writes its E trajectory.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

workdir, coordinator, nproc, pid = (
    sys.argv[1],
    sys.argv[2],
    int(sys.argv[3]),
    int(sys.argv[4]),
)

import numpy as np


def make_kps(tmp):
    from frog_tpu.io.keypoints import Keypoints, write_keypoints

    rng = np.random.default_rng(11)
    base_desc = rng.normal(size=(60, 48)).astype(np.float32)
    base_xyz = rng.uniform(0, 60, (60, 3)).astype(np.float32)
    files = []
    for i in range(4):
        desc = base_desc + rng.normal(scale=0.02, size=base_desc.shape).astype(
            np.float32
        )
        xyz = base_xyz + rng.normal(scale=0.5, size=base_xyz.shape).astype(
            np.float32
        )
        f = os.path.join(tmp, f"points{i}.csv.gz")
        write_keypoints(
            f,
            Keypoints(
                xyz=xyz,
                scale=np.full(60, 2.0, np.float32),
                laplacian=np.ones(60, np.float32),
                response=rng.uniform(0, 1, 60).astype(np.float32),
                desc=desc,
            ),
        )
        files.append(f)
    return files


def main():
    from frog_tpu.parallel.distributed import initialize

    os.environ["JAX_COORDINATOR_ADDRESS"] = coordinator
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(pid)
    assert initialize()
    import jax

    assert jax.process_count() == nproc

    files = make_kps(workdir)
    from frog_tpu.ops.matcher import MatchParams
    from frog_tpu.pipeline import match_stage_distributed

    out = os.path.join(workdir, "pairs.bin")
    graph = match_stage_distributed(
        files,
        MatchParams(max_distance=1e10, second_ratio=1.0),
        out_file=out,
        verbose=False,
    )
    if jax.process_index() == 0:
        assert graph is not None
        from frog_tpu.registration import GroupConfig, GroupRegistration

        cfg = GroupConfig(
            linear_iterations=5, deformable_levels=1,
            deformable_iterations=4, initial_grid_size=50.0,
            verbose=False, use_ransac=False,
        )
        reg = GroupRegistration(graph, cfg)
        reg.run()
        with open(os.path.join(workdir, "result.json"), "w") as f:
            json.dump(
                {
                    "n_matches": graph.n_matches,
                    "es": [m.E for m in reg.measures],
                },
                f,
            )
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
