"""Rigid groupwise registration pipeline — LSRegistration equivalent
(js/lib/LSRegistration.js): pairwise match3d over all pairs, then repeated
rounds of worst-edge removal + Laplacian solve until the edge count drops
to ``final_edges_ratio * N``.

Also the stochastic minibatch scheme from
js/stochasticRigidRegistration.js: random batches registered rigidly, with
positions blended at a learning rate relative to batch means and outlier
ejection when a volume's displacement exceeds ``outlier_ratio`` times the
median — the scaling path for groups too large for all-pairs matching.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..io.keypoints import Keypoints
from .laplace import Edge, RigidGraph, solve_positions
from .match3d import Match3DParams, match3d

__all__ = ["RigidGroupParams", "rigid_groupwise", "StochasticParams", "stochastic_rigid"]


@dataclasses.dataclass(frozen=True)
class RigidGroupParams:
    edge_removal_ratio: float = 0.04  # LSRegistration.js:47
    final_edges_ratio: float = 3.0  # :48
    match: Match3DParams = Match3DParams()


def rigid_groupwise(
    keypoints: list,
    params: RigidGroupParams = RigidGroupParams(),
    verbose: bool = False,
) -> dict:
    """All-pairs match3d + iterated Laplacian solve.

    Returns {"positions": (N, 4) [tx, ty, tz, log s], "valences": (N,),
    "numberOfEdges": int, "matches": per-pair records}.
    """
    n = len(keypoints)
    edges = []
    records = {}
    for i in range(n):
        for j in range(i + 1, n):
            rec = match3d(keypoints[i], keypoints[j], params.match, seed=i * n + j)
            records[(i, j)] = rec
            # match3d's record maps image i onto image j (b = s a + t, so
            # t ~ p_j - p_i); the Laplacian edge term is p_i - p_j, hence
            # the negation (the reference does the same flip when loading
            # pairwise records, js/lib/LSRegistration.js:106-113).
            edges.append(
                Edge(
                    i=i,
                    j=j,
                    translation=-np.asarray(rec["translation"]),
                    scale=1.0 / max(rec["scale"], 1e-6),
                    inliers=rec["inliers"],
                    fail=bool(rec["fail"]),
                )
            )
            if verbose:
                print(f"match3d ({i},{j}): {rec['inliers']} inliers")

    graph = RigidGraph(n, edges)
    positions = None
    while True:
        graph.fix_connectivity()
        graph.remove_edge_batch(params.edge_removal_ratio)
        positions = solve_positions(graph)
        n_edges = graph.n_edges()
        if verbose:
            print(f"solve: {n_edges} edges")
        if n_edges <= n * params.final_edges_ratio:
            break
    return {
        "positions": positions,
        "valences": graph.valences(),
        "numberOfEdges": graph.n_edges(),
        "matches": records,
    }


@dataclasses.dataclass(frozen=True)
class StochasticParams:
    """Defaults from js/stochasticRigidRegistration.js:3-19."""

    batch_size: int = 50
    max_iterations: int = 200
    learning_rate: float = 0.2
    outlier_start: int = 5  # in epochs-equivalent units
    outlier_ratio: float = 10.0
    seed: int = 0
    group: RigidGroupParams = RigidGroupParams()


def stochastic_rigid(
    keypoints: list,
    params: StochasticParams = StochasticParams(),
    verbose: bool = False,
) -> dict:
    """Minibatch rigid groupwise: positions converge to a common layout
    without ever matching all O(N^2) pairs."""
    n = len(keypoints)
    rng = np.random.default_rng(params.seed)
    positions = np.zeros((n, 3))
    registered = np.zeros(n, bool)
    outlier = np.zeros(n, bool)
    displacement = np.zeros(n)
    outlier_after = params.outlier_start * max(n // params.batch_size, 1)

    for it in range(params.max_iterations):
        candidates = np.flatnonzero(~outlier)
        if len(candidates) < 2:
            break
        batch = rng.choice(
            candidates, size=min(params.batch_size, len(candidates)), replace=False
        )
        result = rigid_groupwise([keypoints[i] for i in batch], params.group)
        new_pos = result["positions"][:, :3]

        cur_mean = positions[batch].mean(0)
        new_mean = new_pos.mean(0)
        for k, idx in enumerate(batch):
            alpha = params.learning_rate if registered[idx] else 1.0
            initial = positions[idx] - cur_mean
            final = new_pos[k] - new_mean
            disp = (initial + alpha * (final - initial)) - initial
            positions[idx] = positions[idx] + disp
            displacement[idx] = np.linalg.norm(disp) / alpha
            registered[idx] = True

        # outlier ejection (stochasticRigidRegistration.js:394-418)
        active = registered & ~outlier
        if it >= outlier_after and active.sum() > 2:
            d = displacement[active]
            median = np.median(d)
            worst = np.argmax(displacement * active)
            if displacement[worst] > params.outlier_ratio * max(median, 1e-9):
                outlier[worst] = True
                if verbose:
                    print(f"ejecting outlier volume {worst}")
        if verbose and it % 10 == 0:
            print(
                f"iter {it}: mean displacement"
                f" {displacement[registered & ~outlier].mean():.3f}"
            )
    return {
        "positions": positions,
        "outliers": np.flatnonzero(outlier),
        "registered": registered,
    }
