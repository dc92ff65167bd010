"""Tests for the graph abstraction layer: CSR, builders, iterators, splitting.

Modeled on the reference's universal cross-representation stress check
(WebGraphTestCase.assertGraph, test/.../WebGraphTestCase.java:158-260).
"""

import numpy as np
import pytest

from webgraph_tpu.graph.builders import MutableGraph
from webgraph_tpu.graph.csr import CSRGraph


def assert_graph(g):
    """Cross-representation consistency: sequential iteration vs random access
    vs iterators started at every node vs CSR vs split iterators."""
    n = g.num_nodes()
    # sequential vs random access
    it = g.node_iterator()
    seen = 0
    while it.has_next():
        x = it.next_int()
        seq = np.asarray(it.successor_array()[: it.outdegree()])
        rnd = np.asarray(g.successors(x))
        np.testing.assert_array_equal(seq, rnd, err_msg=f"node {x}")
        assert it.outdegree() == g.outdegree(x)
        assert np.all(np.diff(seq) > 0), f"non-sorted/duplicate successors at {x}"
        seen += 1
    assert seen == n
    # iterators started mid-way
    for start in {0, n // 2, max(n - 1, 0)}:
        it = g.node_iterator(start)
        while it.has_next():
            x = it.next_int()
            np.testing.assert_array_equal(
                np.asarray(it.successor_array()[: it.outdegree()]), np.asarray(g.successors(x))
            )
    # CSR round trip
    offsets, succ = g.to_csr()
    assert offsets[0] == 0 and offsets[-1] == len(succ)
    csr = CSRGraph(offsets, succ)
    assert csr == g
    # split iterators partition exactly (reference assertSplitIterator)
    for pieces in (1, 2, 3, 7):
        its = g.split_node_iterators(pieces)
        nodes = []
        for sub in its:
            while sub.has_next():
                x = sub.next_int()
                nodes.append(x)
                np.testing.assert_array_equal(
                    np.asarray(sub.successor_array()[: sub.outdegree()]),
                    np.asarray(g.successors(x)),
                )
        assert nodes == list(range(n)), f"split into {pieces} lost/dup nodes"


def test_csr_from_lists():
    g = CSRGraph.from_lists([[1, 2], [2], [], [0, 1, 2]])
    assert g.num_nodes() == 4
    assert g.num_arcs() == 6
    assert g.outdegree(3) == 3
    np.testing.assert_array_equal(g.successors(0), [1, 2])
    np.testing.assert_array_equal(g.successors(2), [])
    assert_graph(g)


def test_csr_from_arcs_dedup():
    g = CSRGraph.from_arcs([2, 0, 0, 2, 1], [0, 1, 1, 0, 2], dedup=True)
    assert g.num_arcs() == 3
    np.testing.assert_array_equal(g.successors(0), [1])
    assert g.has_arc(2, 0) and not g.has_arc(0, 2)


def test_mutable_graph():
    g = MutableGraph()
    g.add_arc(0, 5)
    g.add_arc(0, 3)
    g.add_arc(5, 0)
    g.add_arc(0, 3)  # duplicate ignored
    view = g.immutable_view()
    assert view.num_nodes() == 6
    assert view.num_arcs() == 3
    np.testing.assert_array_equal(view.successors(0), [3, 5])
    assert_graph(view)


def test_generators():
    cyc = MutableGraph.directed_cycle(10)
    assert cyc.num_arcs() == 10
    np.testing.assert_array_equal(cyc.successors(9), [0])
    assert_graph(cyc)

    bid = MutableGraph.bidirectional_cycle(8)
    assert bid.num_arcs() == 16
    np.testing.assert_array_equal(bid.successors(0), [1, 7])
    assert_graph(bid)

    comp = MutableGraph.complete_graph(5)
    assert comp.num_arcs() == 25
    comp_nl = MutableGraph.complete_graph(5, loops=False)
    assert comp_nl.num_arcs() == 20
    assert_graph(comp_nl)

    intree = MutableGraph.complete_binary_intree(3)
    assert intree.num_nodes() == 15
    assert intree.outdegree(0) == 0
    assert intree.outdegree(14) == 1
    outtree = MutableGraph.complete_binary_outtree(3)
    assert outtree.outdegree(0) == 2
    assert outtree.outdegree(14) == 0
    assert_graph(outtree)


@pytest.mark.parametrize("n,p,seed", [(50, 0.1, 0), (100, 0.05, 1), (30, 0.5, 2)])
def test_erdos_renyi(n, p, seed):
    g = MutableGraph.erdos_renyi(n, p, seed=seed)
    assert g.num_nodes() == n
    for x in range(n):
        assert not g.has_arc(x, x)
    assert_graph(g)


def test_erdos_renyi_fixed_m():
    g = MutableGraph.erdos_renyi(40, m=100, seed=3)
    assert g.num_arcs() == 100
    assert_graph(g)


def test_graph_equality():
    a = CSRGraph.from_lists([[1], [2], [0]])
    b = MutableGraph(3, arcs=[(0, 1), (1, 2), (2, 0)]).immutable_view()
    c = CSRGraph.from_lists([[1], [2], [1]])
    assert a == b
    assert a != c
