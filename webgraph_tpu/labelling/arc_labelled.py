"""Arc-labelled graphs (reference analogs: ArcLabelledImmutableGraph.java:69,
ArcRelabelledImmutableGraph.java:49, UnionArcLabelledImmutableGraph.java:47,
LabelMergeStrategy.java:28, LabelSemiring.java:39, IntegerLabelFilter.java:29,
plus the labelled transforms in Transform.java).
"""

from __future__ import annotations

import numpy as np

from webgraph_tpu.graph.csr import CSRGraph
from webgraph_tpu.graph.immutable_graph import ImmutableGraph
from webgraph_tpu.labelling.labels import Label


class ArcLabelledImmutableGraph(ImmutableGraph):
    """A graph whose arcs carry labels. ``prototype()`` returns an exemplar
    label; ``label_array(x)`` gives labels parallel to ``successors(x)``."""

    def prototype(self) -> Label:
        raise NotImplementedError

    def label_array(self, x: int) -> list[Label]:
        raise NotImplementedError

    def labelled_successors(self, x: int):
        return list(zip(self.successors(x).tolist(), self.label_array(x)))

    def __eq__(self, other):
        if not isinstance(other, ArcLabelledImmutableGraph):
            return super().__eq__(other)
        if not super().__eq__(other):
            return False
        for x in range(self.num_nodes()):
            if self.label_array(x) != other.label_array(x):
                return False
        return True

    __hash__ = ImmutableGraph.__hash__


class ArcLabelledCSRGraph(ArcLabelledImmutableGraph):
    """In-memory labelled graph: CSR + a parallel list of labels per arc."""

    def __init__(self, graph: ImmutableGraph, labels: list[Label], prototype: Label | None = None):
        self._csr = CSRGraph.from_graph(graph)
        if len(labels) != self._csr.num_arcs():
            raise ValueError(f"need {self._csr.num_arcs()} labels, got {len(labels)}")
        self._labels = labels
        self._prototype = prototype if prototype is not None else (labels[0].copy() if labels else None)

    @classmethod
    def from_arc_list(cls, arcs_with_labels, n: int | None = None, prototype: Label | None = None):
        """Build from (source, target, label) triples (reference analog:
        examples/IntegerTriplesArcLabelledImmutableGraph.java)."""
        triples = sorted(arcs_with_labels, key=lambda t: (t[0], t[1]))
        src = np.array([t[0] for t in triples], dtype=np.int64)
        dst = np.array([t[1] for t in triples], dtype=np.int64)
        labels = [t[2] for t in triples]
        g = CSRGraph.from_arcs(src, dst, n=n, sort=False)
        return cls(g, labels, prototype)

    def num_nodes(self):
        return self._csr.num_nodes()

    def num_arcs(self):
        return self._csr.num_arcs()

    def outdegree(self, x):
        return self._csr.outdegree(x)

    def successors(self, x):
        return self._csr.successors(x)

    successor_array = successors

    def to_csr(self):
        return self._csr.to_csr()

    def prototype(self) -> Label:
        return self._prototype

    def label_array(self, x: int) -> list[Label]:
        o = self._csr.offsets
        return self._labels[int(o[x]) : int(o[x + 1])]

    def all_labels(self) -> list[Label]:
        return self._labels


class ArcRelabelledImmutableGraph(ArcLabelledCSRGraph):
    """On-the-fly label conversion (reference
    ArcRelabelledImmutableGraph.java:49): wraps a labelled graph, converting
    every label through ``converter(new_prototype, old_label)``."""

    def __init__(self, underlying: ArcLabelledImmutableGraph, prototype: Label, converter):
        labels = []
        for x in range(underlying.num_nodes()):
            for lab in underlying.label_array(x):
                nl = prototype.copy()
                converter(nl, lab)
                labels.append(nl)
        super().__init__(CSRGraph.from_graph(underlying), labels, prototype)

    @staticmethod
    def INT_CONVERTER(new: Label, old: Label) -> None:
        new.set(old.get())


class LabelMergeStrategy:
    """Combines the labels of duplicate arcs in unions (reference
    LabelMergeStrategy.java:28)."""

    def merge(self, first: Label, second: Label) -> Label:
        raise NotImplementedError


class MaxLabelMergeStrategy(LabelMergeStrategy):
    def merge(self, first, second):
        out = first.copy()
        out.set(max(first.get(), second.get()))
        return out


class LabelSemiring:
    """add/multiply with zero/one, for labelled composition (reference
    LabelSemiring.java:39)."""

    def add(self, a: Label, b: Label) -> Label:
        raise NotImplementedError

    def multiply(self, a: Label, b: Label) -> Label:
        raise NotImplementedError

    def zero(self, prototype: Label) -> Label:
        raise NotImplementedError

    def one(self, prototype: Label) -> Label:
        raise NotImplementedError


class MinPlusSemiring(LabelSemiring):
    """Tropical semiring: add=min, multiply=+ (shortest paths)."""

    INF = 2**31 - 1

    def add(self, a, b):
        out = a.copy()
        out.set(min(a.get(), b.get()))
        return out

    def multiply(self, a, b):
        out = a.copy()
        out.set(a.get() + b.get())
        return out

    def zero(self, prototype):
        out = prototype.copy()
        out.set(self.INF)
        return out

    def one(self, prototype):
        out = prototype.copy()
        out.set(0)
        return out


class UnionArcLabelledImmutableGraph(ArcLabelledCSRGraph):
    """Labelled arc union; duplicate arcs merge labels through the strategy
    (reference UnionArcLabelledImmutableGraph.java:47)."""

    def __init__(self, g0: ArcLabelledImmutableGraph, g1: ArcLabelledImmutableGraph, strategy: LabelMergeStrategy):
        n = max(g0.num_nodes(), g1.num_nodes())
        merged: dict[tuple[int, int], Label] = {}
        for g in (g0, g1):
            for x in range(g.num_nodes()):
                for y, lab in zip(g.successors(x).tolist(), g.label_array(x)):
                    key = (x, int(y))
                    if key in merged:
                        merged[key] = strategy.merge(merged[key], lab)
                    else:
                        merged[key] = lab.copy()
        triples = [(x, y, lab) for (x, y), lab in merged.items()]
        tmp = ArcLabelledCSRGraph.from_arc_list(triples, n=n, prototype=g0.prototype())
        super().__init__(tmp._csr, tmp._labels, g0.prototype())


class IntegerLabelFilter:
    """Arc filter keeping arcs whose integer label is among the given values
    (reference IntegerLabelFilter.java:29)."""

    def __init__(self, key: str = "", *values: int):
        self.values = set(int(v) for v in values)

    def accept(self, label: Label) -> bool:
        return int(label.get()) in self.values


def filter_labelled_arcs(g: ArcLabelledImmutableGraph, label_filter) -> ArcLabelledCSRGraph:
    """Keep arcs accepted by the label filter (reference labelled
    filterArcs, Transform.java:346)."""
    triples = []
    for x in range(g.num_nodes()):
        for y, lab in zip(g.successors(x).tolist(), g.label_array(x)):
            if label_filter.accept(lab):
                triples.append((x, int(y), lab.copy()))
    return ArcLabelledCSRGraph.from_arc_list(triples, n=g.num_nodes(), prototype=g.prototype())


def labelled_transpose(g: ArcLabelledImmutableGraph) -> ArcLabelledCSRGraph:
    """Transpose carrying labels along (reference transposeOffline labelled,
    Transform.java:1605-1663)."""
    triples = []
    for x in range(g.num_nodes()):
        for y, lab in zip(g.successors(x).tolist(), g.label_array(x)):
            triples.append((int(y), x, lab.copy()))
    return ArcLabelledCSRGraph.from_arc_list(triples, n=g.num_nodes(), prototype=g.prototype())


def labelled_symmetrize(g: ArcLabelledImmutableGraph, strategy: LabelMergeStrategy) -> ArcLabelledCSRGraph:
    """Union with the labelled transpose (reference symmetrizeOffline
    labelled, Transform.java:734-828)."""
    return UnionArcLabelledImmutableGraph(g, labelled_transpose(g), strategy)


def labelled_compose(
    g0: ArcLabelledImmutableGraph, g1: ArcLabelledImmutableGraph, semiring: LabelSemiring
) -> ArcLabelledCSRGraph:
    """Composition in a label semiring: label(x,z) = SUM over y of
    label0(x,y) * label1(y,z) (reference compose with LabelSemiring,
    Transform.java:2110-2125)."""
    proto = g0.prototype()
    acc: dict[tuple[int, int], Label] = {}
    for x in range(g0.num_nodes()):
        for y, lab0 in zip(g0.successors(x).tolist(), g0.label_array(x)):
            if y >= g1.num_nodes():
                continue
            for z, lab1 in zip(g1.successors(int(y)).tolist(), g1.label_array(int(y))):
                key = (x, int(z))
                term = semiring.multiply(lab0, lab1)
                acc[key] = semiring.add(acc[key], term) if key in acc else term
    n = max(g0.num_nodes(), g1.num_nodes())
    return ArcLabelledCSRGraph.from_arc_list(
        [(x, z, lab) for (x, z), lab in acc.items()], n=n, prototype=proto
    )
