"""Graph-Laplacian rigid groupwise solver — laplaceSolver equivalent
(js/lib/laplaceSolver.js).

Model: each image i carries 4 DoF (tx, ty, tz, log s).  Every surviving
edge (i, j) contributes a measured relative offset t_ij (+log-scale), and
the solve is the random-walk-normalized Laplacian system

    p_i - mean_{j in N(i)} p_j = mean_{j in N(i)} (+-t_ij)

which the reference iterates with 10*N Jacobi rounds (laplaceSolver.js:
83-121); here it is solved directly (dense, N x N — image counts are
small) with the same gauge fixing p_0 = 0 (:315-323).

Edge bookkeeping matches the reference: connectivity check with automatic
repair (disconnected nodes get a zero edge to the first connected one,
:185-212) and worst-edge batch removal by inlier count with a
connectivity-preserving bisection backtrack (:221-283).
"""
from __future__ import annotations

import dataclasses
import math

import numpy as np

__all__ = ["RigidGraph", "solve_positions"]


@dataclasses.dataclass
class Edge:
    i: int
    j: int
    translation: np.ndarray  # (3,)
    scale: float = 1.0
    inliers: int = 0
    fail: bool = False


class RigidGraph:
    def __init__(self, n: int, edges: list):
        self.n = n
        self.edges = {(e.i, e.j): e for e in edges}

    def active_edges(self):
        return [e for e in self.edges.values() if not e.fail]

    def n_edges(self) -> int:
        return len(self.active_edges())

    def valences(self) -> np.ndarray:
        v = np.zeros(self.n, np.int64)
        for e in self.active_edges():
            v[e.i] += 1
            v[e.j] += 1
        return v

    # ---- connectivity (laplaceSolver.js:131-216)

    def connected_components(self):
        parent = list(range(self.n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for e in self.active_edges():
            a, b = find(e.i), find(e.j)
            if a != b:
                parent[a] = b
        return [find(i) for i in range(self.n)]

    def is_connected(self) -> bool:
        comps = self.connected_components()
        return all(c == comps[0] for c in comps)

    def fix_connectivity(self):
        """Attach every node outside node-0's component to the first
        connected node with a zero edge (laplaceSolver.js:185-212)."""
        comps = self.connected_components()
        root = comps[0]
        for i in range(self.n):
            if comps[i] != root:
                key = (min(0, i), max(0, i)) if i != 0 else None
                if key is None:
                    continue
                self.edges[key] = Edge(
                    i=key[0], j=key[1], translation=np.zeros(3), scale=1.0,
                    inliers=0, fail=False,
                )

    # ---- edge removal (laplaceSolver.js:221-283)

    def remove_edge_batch(self, ratio: float):
        """Remove the worst ``ratio`` fraction of edges by inlier count,
        backing off (bisection) wherever removal would disconnect the
        graph."""
        active = sorted(
            self.active_edges(), key=lambda e: (e.inliers, e.i, e.j)
        )
        k = int(ratio * len(active))
        batch = active[:k]
        stack = [batch]
        while stack:
            edges = stack.pop()
            for e in edges:
                e.fail = True
            if not self.is_connected():
                for e in edges:
                    e.fail = False
                if len(edges) == 1:
                    continue
                half = round(len(edges) / 2)
                stack.append(edges[half:])
                stack.append(edges[:half])


def solve_positions(graph: RigidGraph) -> np.ndarray:
    """Solve for per-image (tx, ty, tz, log s), anchored at image 0.

    Returns (N, 4).
    """
    n = graph.n
    val = np.maximum(graph.valences().astype(np.float64), 1.0)
    b = np.zeros((n, 4))
    a = np.eye(n)
    for e in graph.active_edges():
        t4 = np.asarray(
            [e.translation[0], e.translation[1], e.translation[2], math.log(e.scale)]
        )
        b[e.i] += t4
        b[e.j] -= t4
        a[e.i, e.j] -= 1.0 / val[e.i]
        a[e.j, e.i] -= 1.0 / val[e.j]
    b /= val[:, None]
    # Singular system (translation gauge): pin node 0.
    a[0] = 0.0
    a[0, 0] = 1.0
    b[0] = 0.0
    x = np.linalg.solve(a, b)
    return x - x[0]
