"""Multi-host setup and the distribution story.

The reference is single-node shared-memory (OpenMP, SURVEY.md §2.5); here
distribution is first-class:

* **Within a slice** the optimizer shards the image axis over the mesh
  (`GroupRegistration(..., mesh=make_mesh())`).  Per iteration the only
  collectives are one all-gather of transformed keypoints
  (N x P x 3 f32 — ~240 KB per image at FROG defaults) and one all-reduce
  of the grid mean + scalar energies, both riding ICI; everything else is
  image-local, so scaling efficiency stays near 1 until the collectives'
  latency floor.
* **Across hosts** `initialize()` (jax.distributed) makes all hosts'
  devices one mesh; the same program runs SPMD — each host feeds its local
  shard of images.  Matching shards the pair-block list instead
  (`partition_pairs`): pair (i, j) work is independent, so hosts each
  compute a contiguous slice of the N(N-1)/2 list and the graph is
  concatenated at the end (matching the reference's dynamic OpenMP
  schedule over pairs, match.cpp:638-652).
"""
from __future__ import annotations

import os

__all__ = ["initialize", "partition_pairs", "merge_pair_graphs"]


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); no-op
    for single-process runs."""
    import jax

    coordinator = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator:
        return False
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:  # already initialized
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes
        or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=process_id or int(os.environ.get("JAX_PROCESS_ID", "0")),
    )
    return True


def partition_pairs(n_images: int, process_id: int, num_processes: int, target=None):
    """This host's slice of the all-pairs list (contiguous block split)."""
    if target is not None:
        pairs = [(i, target) for i in range(n_images) if i != target]
    else:
        pairs = [
            (i, j) for i in range(n_images) for j in range(i + 1, n_images)
        ]
    per = -(-len(pairs) // num_processes)
    return pairs[process_id * per : (process_id + 1) * per]


def merge_pair_graphs(graphs):
    """Union of per-host PairGraphs over the same image list."""
    from ..io.pairs import PairGraph

    base = graphs[0]
    matches = {}
    for g in graphs:
        for key, m in g.matches.items():
            if key in matches:
                import numpy as np

                matches[key] = np.concatenate([matches[key], m])
            else:
                matches[key] = m
    return PairGraph(images=base.images, matches=matches)
