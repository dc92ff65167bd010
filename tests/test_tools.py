"""Tools, stats, CLI, interop, incremental graph and C-utility parity tests."""

import os
import subprocess
import sys
import threading

import numpy as np
import pytest

from webgraph_tpu.formats.binary import (
    IntegerListImmutableGraph,
    IntegerTriplesArcLabelledImmutableGraph,
    crc64,
    normalize_url,
    webbase_to_graph,
)
from webgraph_tpu.formats.bvgraph import BVGraph
from webgraph_tpu.graph.builders import MutableGraph
from webgraph_tpu.graph.csr import CSRGraph
from webgraph_tpu.graph.incremental import END_OF_GRAPH, IncrementalImmutableSequentialGraph
from webgraph_tpu.interop import from_networkx, from_scipy_sparse, to_networkx, to_scipy_sparse
from webgraph_tpu.tools.check import Check
from webgraph_tpu.tools.misc import (
    build_host_map,
    extract_component,
    minimum_redundancy_code_lengths,
    permutation_resilient_checksum,
    to_dot,
    zipf_counts,
)
from webgraph_tpu.tools.speed_test import SpeedTest
from webgraph_tpu.tools.stats import Stats
from webgraph_tpu.transform import symmetrize


@pytest.fixture
def er():
    return MutableGraph.erdos_renyi(60, 0.08, seed=2)


def test_stats(er, tmp_path):
    stats = Stats.store(er, os.path.join(tmp_path, "g"))
    offsets, succ = er.to_csr()
    assert stats["nodes"] == 60
    assert stats["arcs"] == er.num_arcs()
    assert stats["maxoutdegree"] == int(np.diff(offsets).max())
    assert stats["dangling"] == int((np.diff(offsets) == 0).sum())
    assert os.path.exists(os.path.join(tmp_path, "g.stats"))
    outd, ind = Stats.degree_distributions(er)
    assert outd.sum() == 60 and ind.sum() == 60


def test_check(er):
    assert not Check.symmetry(er)
    assert Check.symmetry(symmetrize(er))
    assert Check.sorted_successors(er)
    assert Check.in_range(er)


def test_speedtest(er, tmp_path):
    base = os.path.join(tmp_path, "g")
    BVGraph.store(er, base)
    g = BVGraph.load(base)
    seq = SpeedTest.sequential(g, warmup=0, repeat=1)
    assert seq["links"] == er.num_arcs()
    ra = SpeedTest.random_access(g, 20, warmup=0, repeat=1)
    assert ra["ns_per_node"] > 0
    adj = SpeedTest.adjacency(g, 20, warmup=0, repeat=1)
    assert adj["ns_per_pair"] > 0


def test_integer_list_format(er, tmp_path):
    path = os.path.join(tmp_path, "g.intlist")
    IntegerListImmutableGraph.store(er, path)
    loaded = IntegerListImmutableGraph.load(path)
    assert loaded == er


def test_integer_triples():
    g = IntegerTriplesArcLabelledImmutableGraph.from_triples([(0, 1, 5), (1, 2, 7)], n=3)
    assert g.num_arcs() == 2
    assert g.label_array(0)[0].get() == 5


def test_crc64_and_url():
    assert crc64(b"") == 0
    assert crc64(b"webgraph") != crc64(b"webgraph2")
    assert normalize_url("HTTP://Example.COM:80/path") == "http://example.com/path"
    assert normalize_url("https://example.com:8443/x") == "https://example.com:8443/x"
    assert normalize_url("example.com") == "http://example.com/"


def test_webbase_converter():
    lines = [
        "http://a.com/",
        " http://b.com/",
        " http://c.com/",
        "",
        "http://b.com/",
        " http://a.com/",
    ]
    g, urls = webbase_to_graph(lines)
    assert g.num_nodes() == 3
    assert g.num_arcs() == 3
    assert urls[0] == "http://a.com/"


def test_host_map():
    ids, hosts, counts = build_host_map(
        ["http://a.com/x", "http://b.com/y", "http://a.com/z"]
    )
    np.testing.assert_array_equal(ids, [0, 1, 0])
    assert hosts == ["a.com", "b.com"]
    np.testing.assert_array_equal(counts, [2, 1])


def test_extract_component(er):
    from webgraph_tpu.algo import StronglyConnectedComponents

    scc = StronglyConnectedComponents.compute(er)
    scc.sort_by_size()
    sub = extract_component(er, scc.component, 0)
    assert sub.num_nodes() == scc.compute_sizes()[0]


def test_to_dot(er, tmp_path):
    text = to_dot(er, os.path.join(tmp_path, "g.dot"))
    assert text.startswith("digraph")
    assert text.count("->") == er.num_arcs()


def test_checksum_permutation_resilient():
    a = permutation_resilient_checksum(["x y", "z w", "a b"])
    b = permutation_resilient_checksum(["a b", "x y", "z w"])
    c = permutation_resilient_checksum(["a b", "x y", "z q"])
    assert a == b != c


def _huffman_lengths(freqs):
    """Heap-based Huffman oracle for minimum_redundancy_code_lengths."""
    import heapq

    n = len(freqs)
    if n == 1:
        return np.ones(1, dtype=np.int64)
    heap = [(int(f), i, None) for i, f in enumerate(freqs)]
    heapq.heapify(heap)
    nodes = []
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        node = (a[0] + b[0], n + len(nodes), (a, b))
        nodes.append(node)
        heapq.heappush(heap, node)
    lengths = np.zeros(n, dtype=np.int64)
    stack = [(heap[0], 0)]
    while stack:
        node, depth = stack.pop()
        if node[2] is None:
            lengths[node[1]] = max(depth, 1)
        else:
            stack.append((node[2][0], depth + 1))
            stack.append((node[2][1], depth + 1))
    return lengths


def test_minimum_redundancy_lengths():
    rng = np.random.default_rng(0)
    for trial in range(5):
        freqs = np.sort(rng.integers(1, 1000, size=rng.integers(2, 40)))
        got = minimum_redundancy_code_lengths(freqs)
        expect = _huffman_lengths(freqs)
        # code length multisets must agree and satisfy Kraft with equality
        assert sorted(got.tolist()) == sorted(expect.tolist()), (freqs, got, expect)
        assert abs(sum(2.0 ** -l for l in got) - 1.0) < 1e-9


def test_zipf():
    counts = zipf_counts(10, 1.0, total=1000, seed=1)
    assert counts.sum() == 1000
    assert counts[0] >= counts[-1]


def test_networkx_interop(er):
    G = to_networkx(er)
    assert G.number_of_nodes() == er.num_nodes()
    assert G.number_of_edges() == er.num_arcs()
    back = from_networkx(G)
    assert back == er
    m = to_scipy_sparse(er)
    assert from_scipy_sparse(m) == er


def test_incremental_graph(tmp_path):
    src = MutableGraph.erdos_renyi(40, 0.1, seed=4)
    inc = IncrementalImmutableSequentialGraph()

    def producer():
        for x in range(40):
            inc.add(src.successors(x))
        inc.add(END_OF_GRAPH)

    t = threading.Thread(target=producer)
    t.start()
    base = os.path.join(tmp_path, "inc")
    BVGraph.store(inc, base)
    t.join()
    assert BVGraph.load(base) == src


def test_cli_end_to_end(er, tmp_path):
    base = os.path.join(tmp_path, "g")
    from webgraph_tpu.formats.ascii import ASCIIGraph
    from webgraph_tpu import cli

    ASCIIGraph.store(er, base + ".txt")
    cli.main(["bvgraph", base + ".txt", base, "-g", "ascii"])
    assert os.path.exists(base + ".graph")
    cli.main(["transform", "transpose", base, base + "-t"])
    loaded = BVGraph.load(base + "-t")
    from webgraph_tpu.transform import transpose

    assert loaded == transpose(er)
    cli.main(["stats", base])
    cli.main(["check", base])
    cli.main(["dot", base, str(tmp_path / "g.dot")])
    cli.main(["ascii", base, str(tmp_path / "g2.txt")])
    assert ASCIIGraph.load(str(tmp_path / "g2.txt")) == er


def test_cosin_graph(er, tmp_path):
    from webgraph_tpu.formats.binary import CosinGraph

    base = os.path.join(tmp_path, "cosin")
    CosinGraph.store(er, base)
    assert CosinGraph.num_nodes(base) == er.num_nodes()
    loaded = CosinGraph.load_offline(base)
    assert loaded == er
    # .info layout: 6 native int32s/node, slot 1 = outdegree, slot 0 = indegree
    import numpy as np

    info = np.fromfile(base + ".info", dtype=np.int32).reshape(-1, 6)
    assert int(info[:, 1].sum()) == er.num_arcs()
    assert int(info[:, 0].sum()) == er.num_arcs()
