"""Heuristic diameter of symmetric graphs (reference analog:
FourSweepIterativeFringeDiameter.java:104): the four-sweep double-BFS lower
bound plus iterative-fringe upper-bound refinement."""

from __future__ import annotations

import numpy as np

from webgraph_tpu.algo.bfs import bfs_distances
from webgraph_tpu.graph.csr import CSRGraph
from webgraph_tpu.graph.immutable_graph import ImmutableGraph


class FourSweepIterativeFringeDiameter:
    @staticmethod
    def compute(graph: ImmutableGraph, seed: int = 0, max_iterations: int = 100) -> tuple[int, int]:
        """Returns (lower_bound, upper_bound); equal when certified exact.
        The graph must be symmetric."""
        g = CSRGraph.from_graph(graph)
        n = g.num_nodes()
        if n == 0:
            return 0, 0
        rng = np.random.default_rng(seed)
        r = int(rng.integers(n))
        # four sweeps: r -> a1 -> b1 (ecc(a1)), midpoint m1; m1 -> a2 -> b2
        d = bfs_distances(g, r)
        a1 = int(np.argmax(d))
        d1 = bfs_distances(g, a1)
        b1 = int(np.argmax(d1))
        lower = int(d1[b1])
        mid1 = _midpoint(g, a1, b1, d1)
        d2 = bfs_distances(g, mid1)
        a2 = int(np.argmax(d2))
        d3 = bfs_distances(g, a2)
        b2 = int(np.argmax(d3))
        lower = max(lower, int(d3[b2]))
        u = _midpoint(g, a2, b2, d3)
        # iterative fringe: refine upper bound from u
        du = bfs_distances(g, u)
        ecc_u = int(du.max())
        upper = 2 * ecc_u
        fringe_d = ecc_u
        for _ in range(max_iterations):
            if lower >= upper:
                return lower, lower
            fringe = np.flatnonzero(du == fringe_d)
            if len(fringe) == 0 or fringe_d <= 0:
                break
            biggest = 0
            for x in fringe:
                ex = int(bfs_distances(g, int(x)).max())
                biggest = max(biggest, ex)
                lower = max(lower, ex)
            # all fringe eccentricities known: any path through the fringe
            # is bounded by max ecc of the fringe vs 2*(fringe_d - 1)
            upper = min(upper, max(biggest, 2 * (fringe_d - 1)))
            fringe_d -= 1
        return lower, upper


def _midpoint(g, a: int, b: int, dist_from_a: np.ndarray) -> int:
    """A node halfway along a shortest a-b path."""
    target = int(dist_from_a[b]) // 2
    db = bfs_distances(g, b)
    on_path = (dist_from_a + db) == dist_from_a[b]
    cands = np.flatnonzero(on_path & (dist_from_a == target))
    return int(cands[0]) if len(cands) else a
