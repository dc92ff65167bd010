"""Algorithm tests against independent oracles (scipy.sparse.csgraph and
networkx), mirroring the reference's oracle strategy (SequentialHyperBall /
StronglyConnectedComponentsTarjan / ExactNeighbourhoodFunction in test/)."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.csgraph as csgraph

from webgraph_tpu.algo import (
    ParallelBreadthFirstVisit,
    bfs_distances,
    ConnectedComponents,
    StronglyConnectedComponents,
    NeighbourhoodFunction,
    HyperBall,
    SumSweepDirectedDiameterRadius,
    SumSweepUndirectedDiameterRadius,
    FourSweepIterativeFringeDiameter,
    GeometricCentralities,
    LinearGeometricCentrality,
    TopKGeometricCentrality,
    BetweennessCentrality,
)
from webgraph_tpu.algo.sumsweep import OutputLevel
from webgraph_tpu.graph.builders import MutableGraph
from webgraph_tpu.graph.csr import CSRGraph
from webgraph_tpu.transform import symmetrize, transpose


def to_scipy(g):
    offsets, succ = g.to_csr()
    n = g.num_nodes()
    return sp.csr_matrix(
        (np.ones(len(succ)), succ.astype(np.int64), offsets.astype(np.int64)), shape=(n, n)
    )


@pytest.fixture
def er():
    return MutableGraph.erdos_renyi(120, 0.03, seed=1)


@pytest.fixture
def sym(er):
    return symmetrize(er)


def test_bfs_distances(er):
    m = to_scipy(er)
    expect = csgraph.shortest_path(m, method="BF", indices=5, unweighted=True)
    got = bfs_distances(er, 5).astype(np.float64)
    got[got < 0] = np.inf
    np.testing.assert_array_equal(got, expect)


def test_parallel_bfs_visit(er):
    v = ParallelBreadthFirstVisit(er, parent=True)
    visited = v.visit(3)
    d = bfs_distances(er, 3)
    assert visited == int((d >= 0).sum())
    assert set(v.queue) == set(np.flatnonzero(d >= 0).tolist())
    # parents are actual predecessors
    for x in v.queue:
        if x != 3:
            p = v.parent_array[x]
            assert x in set(er.successors(int(p)).tolist())
    # levels in the queue are in distance order
    dist_order = [d[x] for x in v.queue]
    assert dist_order == sorted(dist_order)


def test_visit_all_components(sym):
    v = ParallelBreadthFirstVisit(sym)
    v.visit_all()
    n_comp, labels = csgraph.connected_components(to_scipy(sym), directed=False)
    # same partition (marker values may differ, compare partition structure)
    ours = v.marker
    mapping = {}
    for x in range(sym.num_nodes()):
        mapping.setdefault(ours[x], set()).add(labels[x])
    assert all(len(s) == 1 for s in mapping.values())
    assert len(mapping) == n_comp


def test_connected_components(sym):
    cc = ConnectedComponents.compute(sym)
    n_comp, labels = csgraph.connected_components(to_scipy(sym), directed=False)
    assert cc.number_of_components == n_comp
    cc.sort_by_size()
    sizes = cc.compute_sizes()
    assert np.all(np.diff(sizes) <= 0)
    assert sizes.sum() == sym.num_nodes()


def test_strongly_connected_components(er):
    scc = StronglyConnectedComponents.compute(er, compute_buckets=True)
    n_comp, labels = csgraph.connected_components(to_scipy(er), directed=True, connection="strong")
    assert scc.number_of_components == n_comp
    mapping = {}
    for x in range(er.num_nodes()):
        mapping.setdefault(scc.component[x], set()).add(labels[x])
    assert all(len(s) == 1 for s in mapping.values())
    # buckets: no arcs leave a bucket component
    offsets, succ = er.to_csr()
    src = np.repeat(np.arange(er.num_nodes()), np.diff(offsets))
    for a, b in zip(src, succ):
        if scc.component[a] != scc.component[b]:
            assert not scc.buckets[scc.component[a]]
    scc.sort_by_size()
    assert np.all(np.diff(scc.compute_sizes()) <= 0)


def test_neighbourhood_function_exact(er):
    nf = NeighbourhoodFunction.compute(er)
    # oracle: all-pairs BFS
    m = to_scipy(er)
    dists = csgraph.shortest_path(m, method="D", unweighted=True)
    finite = dists[np.isfinite(dists)]
    expect = [int((finite <= t).sum()) for t in range(int(finite.max()) + 1)]
    np.testing.assert_array_equal(nf.astype(np.int64), expect)


def test_hyperball_vs_sequential_oracle(er):
    """Exact register equality between the vectorized HyperBall and a
    trivially sequential twin (reference HyperBallTest.java:47-54)."""
    from webgraph_tpu.algo.hll import HyperLogLogCounterArray

    hb = HyperBall(er, transpose=transpose(er), log2m=4, seed=7)
    seq = HyperLogLogCounterArray(er.num_nodes(), 4, 7)
    offsets, succ = CSRGraph.from_graph(er).to_csr()
    for it in range(6):
        hb.iterate()
        # sequential oracle: per node, registerwise max with successors
        new = seq.registers.copy()
        for x in range(er.num_nodes()):
            for y in succ[offsets[x] : offsets[x + 1]]:
                np.maximum(new[x], seq.registers[int(y)], out=new[x])
        seq.registers = new
        np.testing.assert_array_equal(hb.counters.registers, seq.registers, err_msg=f"iteration {it}")


def test_hyperball_estimates_nf(sym):
    exact = NeighbourhoodFunction.compute(sym)
    runs = []
    for seed in range(3):
        hb = HyperBall(sym, transpose=sym, log2m=7, seed=seed)
        runs.append(np.asarray(hb.run()))
    from webgraph_tpu.algo.approx_nf import ApproximateNeighbourhoodFunctions

    combined = ApproximateNeighbourhoodFunctions.combine(runs)
    L = min(len(combined), len(exact))
    rel = np.abs(combined[:L] - exact[:L]) / exact[:L]
    assert rel.max() < 0.12, rel


def test_hyperball_systolic_matches_standard(er):
    t = transpose(er)
    a = HyperBall(er, transpose=t, log2m=5, seed=3, systolic_threshold=1.1)  # always systolic
    b = HyperBall(er, transpose=t, log2m=5, seed=3, systolic_threshold=-0.1)  # never
    for _ in range(8):
        a.iterate()
        b.iterate()
        np.testing.assert_array_equal(a.counters.registers, b.counters.registers)


def test_hyperball_sum_of_distances(sym):
    hb = HyperBall(sym, transpose=sym, log2m=8, seed=0, do_sum_of_distances=True, do_sum_of_inverse_distances=True)
    hb.run()
    m = to_scipy(sym)
    dists = csgraph.shortest_path(m, method="D", unweighted=True)
    x = 7
    row = dists[x]
    finite = np.isfinite(row) & (row > 0)
    expect_sum = row[finite].sum()
    got = hb.sum_of_distances[x]
    assert abs(got - expect_sum) / max(expect_sum, 1) < 0.25
    expect_h = (1.0 / row[finite]).sum()
    assert abs(hb.harmonic_centrality()[x] - expect_h) / max(expect_h, 1e-9) < 0.25


def test_sumsweep_directed(er):
    ss = SumSweepDirectedDiameterRadius(er, OutputLevel.ALL)
    ss.compute()
    m = to_scipy(er)
    dists = csgraph.shortest_path(m, method="D", unweighted=True)
    dists[~np.isfinite(dists)] = -1
    ecc = dists.max(axis=1).astype(np.int64)
    np.testing.assert_array_equal(ss.eccentricities_forward, ecc)
    assert ss.get_diameter() >= ecc.max()


def test_sumsweep_undirected(sym):
    ss = SumSweepUndirectedDiameterRadius(sym, OutputLevel.RADIUS_DIAMETER)
    m = to_scipy(sym)
    dists = csgraph.shortest_path(m, method="D", unweighted=True)
    dists[~np.isfinite(dists)] = -1
    ecc = dists.max(axis=1).astype(np.int64)
    assert ss.get_diameter() == int(ecc.max())
    assert ss.get_radius() == int(ecc.min())


def test_four_sweep(sym):
    lo, hi = FourSweepIterativeFringeDiameter.compute(sym, seed=1)
    m = to_scipy(sym)
    dists = csgraph.shortest_path(m, method="D", unweighted=True)
    dists[~np.isfinite(dists)] = -1
    true_diam = int(dists.max())
    assert lo <= true_diam <= max(hi, lo)
    assert lo >= 1


def test_geometric_centralities(er):
    import networkx as nx

    gc = GeometricCentralities(er).compute()
    G = nx.DiGraph()
    G.add_nodes_from(range(er.num_nodes()))
    offsets, succ = er.to_csr()
    src = np.repeat(np.arange(er.num_nodes()), np.diff(offsets))
    G.add_edges_from(zip(src.tolist(), succ.tolist()))
    # harmonic: networkx computes over incoming paths; ours over outgoing ->
    # compare with reversed graph
    nx_h = nx.harmonic_centrality(G.reverse())
    for x in [0, 5, 50]:
        assert abs(gc.harmonic[x] - nx_h[x]) < 1e-9
    # closeness on outgoing distances
    m = to_scipy(er)
    dists = csgraph.shortest_path(m, method="D", unweighted=True)
    x = 5
    row = dists[x]
    fin = np.isfinite(row) & (row > 0)
    s = row[fin].sum()
    expect = 0.0 if s == 0 else 1.0 / s
    assert abs(gc.closeness[x] - expect) < 1e-12
    assert gc.reachable[x] == int((np.isfinite(row)).sum())


def test_linear_geometric(er):
    # coefficients (0,1,0,...) count nodes at distance exactly 1 = outdegree
    c = np.zeros(5)
    c[1] = 1.0
    lg = LinearGeometricCentrality(er, c).compute()
    offsets, _ = er.to_csr()
    np.testing.assert_array_equal(lg.centrality.astype(np.int64), np.diff(offsets))


def test_topk(er):
    gc = GeometricCentralities(er).compute()
    tk = TopKGeometricCentrality.compute(er, 5, "HARMONIC")
    expect = np.argsort(-gc.harmonic, kind="stable")[:5]
    np.testing.assert_array_equal(tk.top_k, expect)


def test_betweenness(er):
    import networkx as nx

    bc = BetweennessCentrality(er).compute()
    G = nx.DiGraph()
    G.add_nodes_from(range(er.num_nodes()))
    offsets, succ = er.to_csr()
    src = np.repeat(np.arange(er.num_nodes()), np.diff(offsets))
    G.add_edges_from(zip(src.tolist(), succ.tolist()))
    expect = nx.betweenness_centrality(G, normalized=False)
    for x in range(er.num_nodes()):
        assert abs(bc.betweenness[x] - expect[x]) < 1e-6, x


def test_topk_cutclos_pruned_matches_exact():
    """CutClos pruned BFS (reference TopKGeometricCentrality BFSCut) must
    return the same top-k values as exact computation, for every supported
    centrality, while actually pruning visits."""
    from webgraph_tpu.algo.centralities import reachability_bounds
    from webgraph_tpu.algo.bfs import bfs_distances
    from webgraph_tpu.graph.builders import MutableGraph
    from webgraph_tpu.graph.csr import CSRGraph

    g = MutableGraph.erdos_renyi(300, 0.01, seed=9)
    c = CSRGraph.from_graph(g)
    rl, ru = reachability_bounds(g)
    for v in range(0, 300, 23):
        true = int((bfs_distances(c, v) >= 0).sum())
        assert rl[v] <= true <= ru[v]
    for cent in ["HARMONIC", "LIN", "EXPONENTIAL"]:
        fast = TopKGeometricCentrality.compute(g, 7, cent)
        exact = TopKGeometricCentrality.compute_exact(g, 7, cent)
        np.testing.assert_allclose(
            np.sort(fast.centrality), np.sort(exact.centrality), rtol=1e-12
        )
        assert fast.pruned > 0


def test_hyperball_checkpoint_resume(tmp_path, er):
    """A resumed run continues bit-exactly from the checkpoint
    (SURVEY §5.4: explicit register-array checkpointing)."""
    t = transpose(er)
    a = HyperBall(er, transpose=t, log2m=4, seed=11, do_sum_of_distances=True)
    a.iterate()
    a.iterate()
    ckpt = tmp_path / "hb.npz"
    a.checkpoint(ckpt)
    # continue the original
    a.iterate()
    # resume a fresh instance and continue the same step
    b = HyperBall(er, transpose=t, log2m=4, seed=0, do_sum_of_distances=True)
    b.restore(ckpt)
    assert b.iteration == 2
    b.iterate()
    np.testing.assert_array_equal(a.counters.registers, b.counters.registers)
    assert a.neighbourhood_function == b.neighbourhood_function
    np.testing.assert_allclose(a.sum_of_distances, b.sum_of_distances)


def test_hyperball_external_mode_matches_inmemory(tmp_path):
    """External mode (disk-backed double-buffered registers, chunked
    candidate streaming; reference HyperBall.java:996-1012) must produce
    byte-identical registers and the same NF as the in-memory step."""
    from webgraph_tpu.algo.hyperball import HyperBall
    from webgraph_tpu.graph.builders import MutableGraph

    g = MutableGraph.erdos_renyi(250, 0.03, seed=12)
    mem = HyperBall(g, log2m=5, seed=4)
    ext = HyperBall(g, log2m=5, seed=4, external_dir=str(tmp_path / "hb"),
                    chunk_nodes=64)
    for _ in range(6):
        mem.iterate()
        ext.iterate()
        np.testing.assert_array_equal(
            np.asarray(ext.counters.registers), mem.counters.registers)
        assert ext.modified_counters() == mem.modified_counters()
    assert np.allclose(ext.neighbourhood_function, mem.neighbourhood_function)
