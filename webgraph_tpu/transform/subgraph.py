"""Induced subgraphs (reference analogs: ImmutableSubgraph.java:82 and
DegreeRangeImmutableSubgraph.java:31)."""

from __future__ import annotations

import os

import numpy as np

from webgraph_tpu.graph.immutable_graph import ImmutableGraph, NodeIterator, load as load_graph
from webgraph_tpu.graph.properties import load_properties, store_properties


class ImmutableSubgraph(ImmutableGraph):
    """The subgraph induced by a sorted subset of nodes; arcs between
    retained nodes survive, renumbered by rank. ``to_supergraph_node`` /
    ``from_supergraph_node`` translate ids (binary search, reference
    ImmutableSubgraph.java:212-222)."""

    def __init__(self, supergraph: ImmutableGraph, subgraph_nodes: np.ndarray):
        nodes = np.asarray(subgraph_nodes, dtype=np.int64)
        if len(nodes) and (np.any(np.diff(nodes) <= 0) or nodes[0] < 0 or nodes[-1] >= supergraph.num_nodes()):
            raise ValueError("subgraph nodes must be a sorted set within the supergraph")
        self.supergraph = supergraph
        self.subgraph_nodes = nodes
        self._n = len(nodes)

    def num_nodes(self) -> int:
        return self._n

    def num_arcs(self) -> int:
        if not hasattr(self, "_m"):
            self._m = int(self.to_csr()[0][-1])
        return self._m

    def to_supergraph_node(self, x: int) -> int:
        return int(self.subgraph_nodes[x])

    def from_supergraph_node(self, x: int) -> int:
        i = int(np.searchsorted(self.subgraph_nodes, x))
        if i >= self._n or self.subgraph_nodes[i] != x:
            raise ValueError(f"node {x} is not in the subgraph")
        return i

    def successors(self, x: int) -> np.ndarray:
        if self._n == 0:
            return np.zeros(0, dtype=np.int32)
        sup = np.asarray(self.supergraph.successors(self.to_supergraph_node(x)))
        idx = np.searchsorted(self.subgraph_nodes, sup)
        valid = idx < self._n
        idx_c = np.where(valid, idx, 0)
        keep = valid & (self.subgraph_nodes[idx_c] == sup)
        return idx[keep].astype(np.int32)

    successor_array = successors

    def outdegree(self, x: int) -> int:
        return len(self.successors(x))

    def random_access(self) -> bool:
        return self.supergraph.random_access()

    # -- persistence (reference: .subgraph file + .properties) ----------

    def save(self, basename: str | os.PathLike, supergraph_basename: str) -> None:
        np.asarray(self.subgraph_nodes, dtype=np.int64).tofile(f"{basename}.subgraph")
        store_properties(
            f"{basename}.properties",
            {
                "graphclass": "it.unimi.dsi.webgraph.ImmutableSubgraph",
                "supergraphbasename": supergraph_basename,
                "subgraphnodes": self._n,
            },
        )

    @classmethod
    def load(cls, basename: str | os.PathLike) -> "ImmutableSubgraph":
        props = load_properties(f"{basename}.properties")
        nodes = np.fromfile(f"{basename}.subgraph", dtype=np.int64)
        supergraph = load_graph(props["supergraphbasename"])
        return cls(supergraph, nodes)


class DegreeRangeImmutableSubgraph(ImmutableSubgraph):
    """Subgraph of the nodes with outdegree in [min_degree, max_degree)
    (reference DegreeRangeImmutableSubgraph.java:31)."""

    def __init__(self, graph: ImmutableGraph, min_degree: int, max_degree: int = 2**31 - 1):
        offsets, _ = graph.to_csr()
        d = np.diff(offsets)
        nodes = np.flatnonzero((d >= min_degree) & (d < max_degree))
        super().__init__(graph, nodes)
