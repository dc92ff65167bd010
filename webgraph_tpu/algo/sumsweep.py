"""SumSweep exact diameter/radius/eccentricities (reference analogs:
SumSweepDirectedDiameterRadius.java:137 and
SumSweepUndirectedDiameterRadius.java:115; Borassi, Crescenzi, Habib,
Kosters, Marino, Takes: "Fast diameter and radius BFS-based computation").

Bound-refinement over forward/backward BFS sweeps: each pivot s yields the
exact eccF(s)/eccB(s), raises the lower bounds L_F(x) >= d(x,s),
L_B(x) >= d(s,x) for every x, and caps U_F(x) <= d(x,s) + eccF(s),
U_B(x) <= d(s,x) + eccB(s); pivots are chosen to close the diameter/radius
gaps fastest, and the result is exact on termination (worst case every node
is swept).

Eccentricities are over *reachable* nodes; on strongly connected (or
connected undirected) graphs this is the classical definition.
"""

from __future__ import annotations

import enum

import numpy as np

from webgraph_tpu.algo.bfs import bfs_distances
from webgraph_tpu.graph.csr import CSRGraph
from webgraph_tpu.graph.immutable_graph import ImmutableGraph
from webgraph_tpu.transform.transform import transpose as transpose_graph


class OutputLevel(enum.Enum):
    """Reference analog: SumSweepDirectedDiameterRadius.OutputLevel (:245)."""

    RADIUS = 0
    DIAMETER = 1
    RADIUS_DIAMETER = 2
    ALL_FORWARD = 3
    ALL = 4


class SumSweepDirectedDiameterRadius:
    def __init__(
        self,
        graph: ImmutableGraph,
        output: OutputLevel = OutputLevel.RADIUS_DIAMETER,
        transpose: ImmutableGraph | None = None,
    ):
        self.graph = CSRGraph.from_graph(graph)
        self.transpose = CSRGraph.from_graph(transpose) if transpose is not None else transpose_graph(graph)
        self.output = output
        self.n = graph.num_nodes()
        self.iterations = 0
        self._done = False

    def compute(self) -> None:
        n = self.n
        INF = np.int64(2**31)
        lF = np.zeros(n, dtype=np.int64)
        uF = np.full(n, INF, dtype=np.int64)
        lB = np.zeros(n, dtype=np.int64)
        uB = np.full(n, INF, dtype=np.int64)
        eccF = np.full(n, -1, dtype=np.int64)
        eccB = np.full(n, -1, dtype=np.int64)
        swept = np.zeros(n, dtype=bool)

        # start from the max-outdegree node (reference's first pivot)
        offsets, _ = self.graph.to_csr()
        pivot = int(np.argmax(np.diff(offsets)))

        want_all = self.output in (OutputLevel.ALL, OutputLevel.ALL_FORWARD)
        for it in range(2 * n + 2):
            if swept[pivot]:
                remaining = np.flatnonzero(~swept)
                if len(remaining) == 0:
                    break
                pivot = int(remaining[0])
            fs = bfs_distances(self.graph, pivot)  # d(pivot, x)
            bs = bfs_distances(self.transpose, pivot)  # d(x, pivot)
            self.iterations += 2
            swept[pivot] = True
            reachF = fs >= 0
            reachB = bs >= 0
            eF = int(fs.max())
            eB = int(bs.max())
            eccF[pivot] = eF
            uF[pivot] = lF[pivot] = eF
            eccB[pivot] = eB
            uB[pivot] = lB[pivot] = eB
            # lower bounds (always valid: d(x,s) and d(s,x) are distances)
            np.maximum(lF, np.where(reachB, bs, 0), out=lF)
            np.maximum(lB, np.where(reachF, fs, 0), out=lB)
            # upper bounds via the triangle inequality d(v,x) <= d(v,s)+d(s,x):
            # valid only when s reaches every node v reaches — guaranteed iff
            # s reaches all nodes (always true on strongly connected graphs)
            if bool(reachF.all()):
                np.minimum(uF, np.where(reachB, bs + eF, uF), out=uF)
            if bool(reachB.all()):
                np.minimum(uB, np.where(reachF, fs + eB, uB), out=uB)
            exactF = lF >= uF
            exactB = lB >= uB
            eccF[exactF] = lF[exactF]
            eccB[exactB] = lB[exactB]

            # check termination per output level
            dl = int(max(lF.max(initial=0), lB.max(initial=0)))
            dl = max(dl, int(eccF[swept].max(initial=0)))
            du = int(max(uF.max(initial=0), 0))
            rl_candidates = uF
            rl = int(uF.min())
            ru = int(lF.min())
            diam_done = dl >= du or bool(np.all(exactF))
            rad_done = rl <= ru or bool(np.all(exactF))
            if want_all:
                needed = np.all(exactF) and (self.output != OutputLevel.ALL or np.all(exactB))
                if needed:
                    break
            elif self.output == OutputLevel.DIAMETER and diam_done:
                break
            elif self.output == OutputLevel.RADIUS and rad_done:
                break
            elif self.output == OutputLevel.RADIUS_DIAMETER and diam_done and rad_done:
                break
            # next pivot: biggest forward gap, alternating with radius probes
            gap = np.where(swept, -1, uF - lF)
            if it % 2 == 0:
                pivot = int(np.argmax(np.where(swept, -1, uF)))
            else:
                pivot = int(np.argmax(gap))

        # finalize any remaining bounds exactly if ALL requested
        if want_all:
            for x in np.flatnonzero(eccF < 0):
                fs = bfs_distances(self.graph, int(x))
                eccF[x] = int(fs.max())
                self.iterations += 1
            if self.output == OutputLevel.ALL:
                for x in np.flatnonzero(eccB < 0):
                    bs = bfs_distances(self.transpose, int(x))
                    eccB[x] = int(bs.max())
                    self.iterations += 1

        # exact diameter/radius from (possibly partial) exact eccs
        known = eccF >= 0
        self._eccF = np.where(known, eccF, lF)
        self._eccB = np.where(eccB >= 0, eccB, lB)
        self._diameter = int(max(self._eccF.max(initial=0), self._eccB.max(initial=0)))
        self._radius = int(self._eccF.min()) if n else 0
        # make sure radius/diameter are certified when requested
        if self.output in (OutputLevel.RADIUS, OutputLevel.RADIUS_DIAMETER, OutputLevel.DIAMETER):
            # uncertified entries: sweep them (guarantees exactness)
            while True:
                unc_d = np.flatnonzero((uF > self._diameter) & (eccF < 0))
                unc_r = np.flatnonzero((lF < self._radius) & (eccF < 0))
                todo = set()
                if self.output != OutputLevel.RADIUS:
                    todo.update(unc_d.tolist())
                if self.output != OutputLevel.DIAMETER:
                    todo.update(unc_r.tolist())
                if not todo:
                    break
                x = todo.pop()
                fs = bfs_distances(self.graph, int(x))
                e = int(fs.max())
                eccF[x] = e
                uF[x] = lF[x] = e
                self.iterations += 1
                self._eccF[x] = e
                self._diameter = max(self._diameter, e)
                self._radius = min(self._radius, e)
        self._done = True

    def get_diameter(self) -> int:
        if not self._done:
            self.compute()
        return self._diameter

    def get_radius(self) -> int:
        if not self._done:
            self.compute()
        return self._radius

    def get_eccentricity(self, x: int, forward: bool = True) -> int:
        if not self._done:
            self.compute()
        return int(self._eccF[x] if forward else self._eccB[x])

    @property
    def eccentricities_forward(self) -> np.ndarray:
        if not self._done:
            self.compute()
        return self._eccF

    @property
    def eccentricities_backward(self) -> np.ndarray:
        if not self._done:
            self.compute()
        return self._eccB


class SumSweepUndirectedDiameterRadius(SumSweepDirectedDiameterRadius):
    """Undirected (symmetric) variant (reference
    SumSweepUndirectedDiameterRadius.java:115): the transpose is the graph
    itself."""

    def __init__(self, graph: ImmutableGraph, output: OutputLevel = OutputLevel.RADIUS_DIAMETER):
        super().__init__(graph, output, transpose=graph)
