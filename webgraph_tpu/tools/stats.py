"""Graph statistics (reference analog: Stats.java:65): outdegree/indegree
distributions and the ``.stats`` summary (min/max/avg degrees, dangling /
terminal / isolated counts, buckets) computed from a graph and its
transpose."""

from __future__ import annotations

import numpy as np

from webgraph_tpu.algo.components import StronglyConnectedComponents
from webgraph_tpu.graph.csr import CSRGraph
from webgraph_tpu.graph.immutable_graph import ImmutableGraph
from webgraph_tpu.transform.transform import transpose as transpose_graph


class Stats:
    @staticmethod
    def compute(graph: ImmutableGraph, transpose: ImmutableGraph | None = None) -> dict:
        g = CSRGraph.from_graph(graph)
        t = CSRGraph.from_graph(transpose) if transpose is not None else transpose_graph(g)
        n = g.num_nodes()
        outd = g.outdegrees().astype(np.int64)
        ind = t.outdegrees().astype(np.int64)
        m = int(outd.sum())

        offsets, succ = g.to_csr()
        src = np.repeat(np.arange(n, dtype=np.int64), outd)
        loops = int((src == succ).sum())
        dangling = int((outd == 0).sum())
        # terminal: nodes whose only arc (if any) is a loop
        only_loop = np.zeros(n, dtype=bool)
        one_out = outd == 1
        if m:
            first_succ = np.full(n, -1, dtype=np.int64)
            first_succ[one_out] = succ[offsets[:-1][one_out]]
            only_loop = one_out & (first_succ == np.arange(n))
        terminal = int(((outd == 0) | only_loop).sum())
        isolated = int(((outd == 0) & (ind == 0)).sum())

        scc = StronglyConnectedComponents.compute(g, compute_buckets=True)
        bucket_nodes = int(scc.buckets[scc.component].sum()) if scc.buckets is not None else 0

        stats = {
            "nodes": n,
            "arcs": m,
            "loops": loops,
            "minoutdegree": int(outd.min(initial=0)),
            "maxoutdegree": int(outd.max(initial=0)),
            "minindegree": int(ind.min(initial=0)),
            "maxindegree": int(ind.max(initial=0)),
            "avgoutdegree": m / max(n, 1),
            "avgindegree": m / max(n, 1),
            "dangling": dangling,
            "terminal": terminal,
            "isolated": isolated,
            "buckets": bucket_nodes,
            "sccs": scc.number_of_components,
            "maxsccsize": int(scc.compute_sizes().max(initial=0)),
        }
        return stats

    @staticmethod
    def degree_distributions(graph: ImmutableGraph, transpose: ImmutableGraph | None = None):
        g = CSRGraph.from_graph(graph)
        t = CSRGraph.from_graph(transpose) if transpose is not None else transpose_graph(g)
        return np.bincount(g.outdegrees()), np.bincount(t.outdegrees())

    @staticmethod
    def store(graph: ImmutableGraph, basename, transpose: ImmutableGraph | None = None) -> dict:
        """Write ``.stats``, ``.outdegrees`` histogram and ``.indegrees``
        histogram files (reference Stats.main output set)."""
        stats = Stats.compute(graph, transpose)
        outd, ind = Stats.degree_distributions(graph, transpose)
        with open(f"{basename}.stats", "w") as f:
            for k, v in stats.items():
                f.write(f"{k}={v}\n")
        np.savetxt(f"{basename}.outdegrees", outd, fmt="%d")
        np.savetxt(f"{basename}.indegrees", ind, fmt="%d")
        return stats
