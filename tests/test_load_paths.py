"""Tests for the loading/ingestion paths flagged untested in round 2:
``BVGraph.load_mapped`` (np.memmap word view), the
``ScatteredArcsASCIIGraph`` sorted-spill pipeline, and ``map_offline``.
Reference semantics: BVGraph.java:1551-1554 (loadMapped),
ScatteredArcsASCIIGraph.java:134, Transform.java:1510-1539 (mapOffline).
"""

import gzip
import io
import os

import numpy as np
import pytest

from webgraph_tpu.formats.ascii import ScatteredArcsASCIIGraph
from webgraph_tpu.formats.bvgraph import BVGraph
from webgraph_tpu.graph.builders import MutableGraph
from webgraph_tpu.transform.transform import map_offline


@pytest.fixture()
def stored(tmp_path):
    g = MutableGraph.erdos_renyi(350, 0.04, seed=17)
    base = str(tmp_path / "g")
    BVGraph.store(g, base)
    return g, base


def test_load_mapped_matches_load(stored):
    g, base = stored
    bm = BVGraph.load_mapped(base)
    bl = BVGraph.load(base)
    assert bm.num_nodes() == bl.num_nodes()
    assert bm.num_arcs() == bl.num_arcs()
    toff, tsucc = g.to_csr()
    for x in (0, 1, 77, 200, 349):
        assert list(bm.successors(x)) == list(tsucc[toff[x] : toff[x + 1]])
        assert bm.outdegree(x) == bl.outdegree(x)


def test_load_mapped_sequential_iteration(stored):
    g, base = stored
    bm = BVGraph.load_mapped(base)
    toff, tsucc = g.to_csr()
    it = bm.node_iterator()
    while it.has_next():
        x = it.next_int()
        got = list(it.successor_array()[: it.outdegree()])
        assert got == list(tsucc[toff[x] : toff[x + 1]]), x


def _arc_text(arcs):
    return "\n".join(f"{a} {b}" for a, b in arcs) + "\n"


def test_scattered_arcs_small_batches_spill(tmp_path):
    """batch_size far below the arc count forces the sort-spill-merge path
    through multiple on-disk batches."""
    rng = np.random.default_rng(3)
    arcs = [(int(rng.integers(0, 60)), int(rng.integers(0, 60))) for _ in range(5000)]
    sg = ScatteredArcsASCIIGraph(io.StringIO(_arc_text(arcs)), batch_size=256)
    # oracle: first-appearance interning then dedup
    id2idx, edges = {}, set()
    for a, b in arcs:
        for t in (a, b):
            if t not in id2idx:
                id2idx[t] = len(id2idx)
        edges.add((id2idx[a], id2idx[b]))
    assert sg.graph.num_nodes() == len(id2idx)
    assert sg.graph.num_arcs() == len(edges)
    got = set()
    for x in range(sg.graph.num_nodes()):
        for y in sg.graph.successors(x):
            got.add((x, int(y)))
    assert got == edges
    assert sg.ids == [str(k) for k in dict.fromkeys(t for ab in arcs for t in ab)]


def test_scattered_arcs_symmetrize_noloops(tmp_path):
    arcs = [(5, 5), (1, 2), (2, 1), (3, 1), (5, 5), (4, 4)]
    sg = ScatteredArcsASCIIGraph(
        io.StringIO(_arc_text(arcs)), symmetrize=True, no_loops=True, batch_size=4
    )
    # ids in first-appearance order: 5->0, 1->1, 2->2, 3->3, 4->4
    expect = {(1, 2), (2, 1), (3, 1), (1, 3)}
    got = {
        (x, int(y))
        for x in range(sg.graph.num_nodes())
        for y in sg.graph.successors(x)
    }
    assert got == expect


def test_scattered_arcs_gzip_source(tmp_path):
    path = tmp_path / "arcs.gz"
    with gzip.open(path, "wt") as f:
        f.write(_arc_text([(10, 20), (20, 30), (10, 30)]))
    sg = ScatteredArcsASCIIGraph(str(path))
    assert sg.graph.num_nodes() == 3
    assert sg.graph.num_arcs() == 3


def test_map_offline_matches_map(tmp_path):
    from webgraph_tpu.transform.transform import map_graph as map_inmem

    g = MutableGraph.erdos_renyi(200, 0.05, seed=9)
    rng = np.random.default_rng(0)
    perm = rng.permutation(200).astype(np.int64)
    perm[perm < 20] = -1  # delete some nodes (reference: -1 removes)
    a = map_inmem(g, perm)
    b = map_offline(g, perm, batch_size=128)
    assert a.num_nodes() == b.num_nodes()
    assert a.num_arcs() == b.num_arcs()
    for x in range(a.num_nodes()):
        assert list(a.successors(x)) == list(b.successors(x)), x
