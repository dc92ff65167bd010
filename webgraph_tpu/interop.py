"""Interop with the Python graph ecosystem (reference analog: the JUNG
adapter, jung/JungAdapter.java:56 — NetworkX plays JUNG's role here)."""

from __future__ import annotations

import numpy as np

from webgraph_tpu.graph.csr import CSRGraph
from webgraph_tpu.graph.immutable_graph import ImmutableGraph


def to_networkx(graph: ImmutableGraph):
    """Expose an ImmutableGraph as a networkx.DiGraph."""
    import networkx as nx

    offsets, succ = graph.to_csr()
    n = graph.num_nodes()
    G = nx.DiGraph()
    G.add_nodes_from(range(n))
    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    G.add_edges_from(zip(src.tolist(), succ.tolist()))
    return G


def from_networkx(G) -> CSRGraph:
    """Build a CSRGraph from a networkx graph (nodes must be 0..n-1 ints or
    they are renumbered in sorted order)."""
    nodes = sorted(G.nodes())
    idx = {v: i for i, v in enumerate(nodes)}
    arcs = [(idx[u], idx[v]) for u, v in G.edges()]
    if not G.is_directed():
        arcs += [(b, a) for a, b in arcs]
    if not arcs:
        return CSRGraph.from_lists([[] for _ in nodes])
    src, dst = zip(*arcs)
    return CSRGraph.from_arcs(np.array(src), np.array(dst), n=len(nodes), dedup=True)


def to_scipy_sparse(graph: ImmutableGraph):
    """CSR scipy matrix view of the adjacency."""
    import scipy.sparse as sp

    offsets, succ = graph.to_csr()
    n = graph.num_nodes()
    return sp.csr_matrix((np.ones(len(succ), dtype=np.int8), succ, offsets), shape=(n, n))


def from_scipy_sparse(mat) -> CSRGraph:
    mat = mat.tocsr()
    return CSRGraph(mat.indptr.astype(np.int64), mat.indices.astype(np.int32), mat.shape[0])
