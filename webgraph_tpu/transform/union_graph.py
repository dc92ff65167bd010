"""Lazy arc-union view of two graphs (reference UnionImmutableGraph.java:31)."""

from __future__ import annotations

import numpy as np

from webgraph_tpu.graph.immutable_graph import ImmutableGraph


class UnionImmutableGraph(ImmutableGraph):
    def __init__(self, g0: ImmutableGraph, g1: ImmutableGraph):
        self.g0 = g0
        self.g1 = g1
        self._n = max(g0.num_nodes(), g1.num_nodes())

    def num_nodes(self) -> int:
        return self._n

    def num_arcs(self) -> int:
        if not hasattr(self, "_m"):
            self._m = int(self.to_csr()[0][-1])
        return self._m

    def successors(self, x: int) -> np.ndarray:
        parts = []
        if x < self.g0.num_nodes():
            parts.append(np.asarray(self.g0.successors(x)))
        if x < self.g1.num_nodes():
            parts.append(np.asarray(self.g1.successors(x)))
        if not parts:
            return np.zeros(0, dtype=np.int32)
        return np.unique(np.concatenate(parts)).astype(np.int32)

    successor_array = successors

    def outdegree(self, x: int) -> int:
        return len(self.successors(x))
