"""Graph well-formedness checks (reference analog: Check.java)."""

from __future__ import annotations

import numpy as np

from webgraph_tpu.graph.csr import CSRGraph
from webgraph_tpu.graph.immutable_graph import ImmutableGraph
from webgraph_tpu.transform.transform import transpose as transpose_graph


class Check:
    @staticmethod
    def symmetry(graph: ImmutableGraph) -> bool:
        """True iff the graph equals its transpose (reference
        Check.symmetry)."""
        g = CSRGraph.from_graph(graph)
        return g == transpose_graph(g)

    symmetry_offline = symmetry

    @staticmethod
    def sorted_successors(graph: ImmutableGraph) -> bool:
        """True iff every successor list is strictly increasing."""
        offsets, succ = graph.to_csr()
        if len(succ) == 0:
            return True
        d = np.diff(succ.astype(np.int64))
        boundaries = offsets[1:-1]
        ok = np.ones(len(succ) - 1, dtype=bool)
        within = np.ones(len(succ) - 1, dtype=bool)
        within[boundaries - 1] = False
        return bool(np.all(d[within] > 0))

    @staticmethod
    def in_range(graph: ImmutableGraph) -> bool:
        """True iff all successors are valid node ids."""
        _, succ = graph.to_csr()
        n = graph.num_nodes()
        return bool(len(succ) == 0 or ((succ >= 0) & (succ < n)).all())
