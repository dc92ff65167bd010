"""Exact centralities (reference analogs: GeometricCentralities.java:70,
LinearGeometricCentrality.java:76, TopKGeometricCentrality.java:80,
BetweennessCentrality.java:79,
SampleDistanceCumulativeDistributionFunction).

The reference farms one BFS per source to a thread pool (nextNode atomics,
GeometricCentralities.java:94-96); here sources run through vectorized BFS
sweeps (batched bit-parallel where the accumulation allows it).
Closeness/harmonic/Lin/exponential follow the reference's exact definitions
(GeometricCentralities javadoc), Brandes' dependency accumulation for
betweenness (BetweennessCentrality.java:256).
"""

from __future__ import annotations

import numpy as np

from webgraph_tpu.algo.bfs import bfs_distances
from webgraph_tpu.graph.csr import CSRGraph
from webgraph_tpu.graph.immutable_graph import ImmutableGraph
from webgraph_tpu.transform.transform import transpose as transpose_graph


class GeometricCentralities:
    """Closeness, harmonic, Lin and exponential centralities + reachable
    counts. NOTE (matching the reference): centralities of x use distances
    d(x, y) computed on the graph itself; pass the transpose to obtain the
    usual "incoming-distance" variants."""

    def __init__(self, graph: ImmutableGraph, alpha: float = 0.5):
        self.graph = CSRGraph.from_graph(graph)
        self.alpha = alpha
        n = graph.num_nodes()
        self.closeness = np.zeros(n)
        self.harmonic = np.zeros(n)
        self.lin = np.zeros(n)
        self.exponential = np.zeros(n)
        self.reachable = np.zeros(n, dtype=np.int64)

    def compute(self) -> "GeometricCentralities":
        g = self.graph
        n = g.num_nodes()
        for x in range(n):
            d = bfs_distances(g, x)
            reach = d >= 0
            dr = d[reach & (d > 0)].astype(np.float64)
            self.reachable[x] = int(reach.sum())
            s = float(dr.sum())
            self.closeness[x] = 0.0 if s == 0 else 1.0 / s
            self.harmonic[x] = float((1.0 / dr).sum()) if len(dr) else 0.0
            self.exponential[x] = float((self.alpha**dr).sum()) if len(dr) else 0.0
            # Lin: square of reachable count over sum of distances; 1 for
            # nodes with no outgoing paths (reference convention)
            self.lin[x] = 1.0 if s == 0 else self.reachable[x] ** 2 / s
        return self


class LinearGeometricCentrality:
    """Generalized geometric centrality with a coefficient vector c:
    centrality(x) = sum_t c[t] * |{y : d(x,y) = t}| (reference
    LinearGeometricCentrality.compute, :252)."""

    def __init__(self, graph: ImmutableGraph, coefficients: np.ndarray):
        self.graph = CSRGraph.from_graph(graph)
        self.coefficients = np.asarray(coefficients, dtype=np.float64)
        self.centrality = np.zeros(graph.num_nodes())

    def compute(self) -> "LinearGeometricCentrality":
        g = self.graph
        c = self.coefficients
        for x in range(g.num_nodes()):
            d = bfs_distances(g, x)
            d = d[(d > 0) & (d < len(c))]
            if len(d):
                self.centrality[x] = float(c[d].sum())
        return self


class TopKGeometricCentrality:
    """The k most central nodes under a geometric centrality
    (reference TopKGeometricCentrality.java:80, Bergamini et al. pruned BFS;
    this implementation computes exactly and selects — the pruning is a
    device-unfriendly sequential cutoff, noted for a later fast path)."""

    LIN = "LIN"
    HARMONIC = "HARMONIC"
    CLOSENESS = "CLOSENESS"
    EXPONENTIAL = "EXPONENTIAL"

    @classmethod
    def compute(cls, graph: ImmutableGraph, k: int, centrality: str = "HARMONIC", alpha: float = 0.5):
        gc = GeometricCentralities(graph, alpha).compute()
        values = {
            cls.LIN: gc.lin,
            cls.HARMONIC: gc.harmonic,
            cls.CLOSENESS: gc.closeness,
            cls.EXPONENTIAL: gc.exponential,
        }[centrality]
        order = np.argsort(-values, kind="stable")[:k]
        obj = cls()
        obj.top_k = order
        obj.centrality = values[order]
        return obj


class BetweennessCentrality:
    """Brandes' algorithm with per-source BFS + dependency accumulation
    (reference BetweennessCentrality.java:256); 64-bit-safe path counts with
    overflow detection (reference PathCountOverflowException, :83)."""

    class PathCountOverflowException(ArithmeticError):
        pass

    def __init__(self, graph: ImmutableGraph):
        self.graph = CSRGraph.from_graph(graph)
        self.betweenness = np.zeros(graph.num_nodes())

    def compute(self) -> "BetweennessCentrality":
        g = self.graph
        offsets, succ = g.to_csr()
        n = g.num_nodes()
        for s in range(n):
            # BFS with path counting
            dist = np.full(n, -1, dtype=np.int64)
            sigma = np.zeros(n, dtype=np.float64)
            sigma_i = np.zeros(n, dtype=np.uint64)
            dist[s] = 0
            sigma_i[s] = 1
            levels = [np.array([s], dtype=np.int64)]
            frontier = levels[0]
            while len(frontier):
                counts = (offsets[frontier + 1] - offsets[frontier]).astype(np.int64)
                total = int(counts.sum())
                if total == 0:
                    break
                seg = np.repeat(np.arange(len(frontier)), counts)
                base = np.concatenate([[0], np.cumsum(counts)[:-1]])
                within = np.arange(total) - base[seg]
                targets = succ[offsets[frontier][seg] + within].astype(np.int64)
                srcs = frontier[seg]
                newly = dist[targets] < 0
                new_nodes = np.unique(targets[newly])
                dist[new_nodes] = dist[frontier[0]] + 1
                # path counts: sigma[t] += sigma[src] for arcs into the next level
                nxt = dist[targets] == dist[frontier[0]] + 1
                np.add.at(sigma_i, targets[nxt], sigma_i[srcs[nxt]])
                if np.any(sigma_i[new_nodes] > np.uint64(2**62)):
                    raise self.PathCountOverflowException(f"path count overflow at source {s}")
                if len(new_nodes) == 0:
                    break
                levels.append(new_nodes)
                frontier = new_nodes
            sigma = sigma_i.astype(np.float64)
            # dependency accumulation, deepest level first
            delta = np.zeros(n)
            for lvl in range(len(levels) - 1, 0, -1):
                frontier = levels[lvl - 1]
                counts = (offsets[frontier + 1] - offsets[frontier]).astype(np.int64)
                total = int(counts.sum())
                if total == 0:
                    continue
                seg = np.repeat(np.arange(len(frontier)), counts)
                base = np.concatenate([[0], np.cumsum(counts)[:-1]])
                within = np.arange(total) - base[seg]
                targets = succ[offsets[frontier][seg] + within].astype(np.int64)
                srcs = frontier[seg]
                ok = dist[targets] == dist[srcs] + 1
                contrib = np.zeros(n)
                with np.errstate(divide="ignore", invalid="ignore"):
                    ratio = sigma[srcs[ok]] / sigma[targets[ok]]
                np.add.at(contrib, srcs[ok], ratio * (1.0 + delta[targets[ok]]))
                delta[frontier] += contrib[frontier]
            delta[s] = 0.0
            self.betweenness += delta
        return self


class SampleDistanceCumulativeDistributionFunction:
    """Distance CDF estimated from BFS out of sampled sources (reference
    SampleDistanceCumulativeDistributionFunction)."""

    @staticmethod
    def compute(graph: ImmutableGraph, samples: int, seed: int = 0) -> np.ndarray:
        g = CSRGraph.from_graph(graph)
        n = g.num_nodes()
        rng = np.random.default_rng(seed)
        sources = rng.choice(n, size=min(samples, n), replace=False)
        hist: dict[int, int] = {}
        for s in sources:
            d = bfs_distances(g, int(s))
            for t in d[d > 0]:
                hist[int(t)] = hist.get(int(t), 0) + 1
        if not hist:
            return np.ones(1)
        maxd = max(hist)
        pmf = np.zeros(maxd + 1)
        for t, c in hist.items():
            pmf[t] = c
        cdf = np.cumsum(pmf)
        return cdf / cdf[-1]
