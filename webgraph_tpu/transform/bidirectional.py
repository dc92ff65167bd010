"""Graph + transpose pairing (reference BidirectionalImmutableGraph.java:27)."""

from __future__ import annotations

import numpy as np

from webgraph_tpu.graph.immutable_graph import ImmutableGraph


class BidirectionalImmutableGraph(ImmutableGraph):
    """Pairs a graph with its transpose: successors AND predecessors,
    indegrees, plus transposed/symmetrized views."""

    def __init__(self, graph: ImmutableGraph, transpose: ImmutableGraph):
        if graph.num_nodes() != transpose.num_nodes():
            raise ValueError("graph and transpose must have the same node count")
        self.forward = graph
        self.backward = transpose

    def num_nodes(self) -> int:
        return self.forward.num_nodes()

    def num_arcs(self) -> int:
        return self.forward.num_arcs()

    def outdegree(self, x: int) -> int:
        return self.forward.outdegree(x)

    def indegree(self, x: int) -> int:
        return self.backward.outdegree(x)

    def successors(self, x: int) -> np.ndarray:
        return self.forward.successors(x)

    successor_array = successors

    def predecessors(self, x: int) -> np.ndarray:
        return self.backward.successors(x)

    def to_csr(self):
        return self.forward.to_csr()

    def node_iterator(self, start: int = 0):
        return self.forward.node_iterator(start)

    def transposed(self) -> "BidirectionalImmutableGraph":
        return BidirectionalImmutableGraph(self.backward, self.forward)

    def symmetrized(self):
        from webgraph_tpu.transform.transform import union

        sym = union(self.forward, self.backward)
        return BidirectionalImmutableGraph(sym, sym)
