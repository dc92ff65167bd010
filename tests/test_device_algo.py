"""Device-resident analytics (algo/device.py) vs host oracles.

Reference anchors: ParallelBreadthFirstVisit.java:79,149-181 (level-
synchronous frontier BFS), NeighbourhoodFunction.java:100,118 (exact NF by
parallel sweeps; here 64-source bit-parallel masks).
"""

import numpy as np
import pytest

from webgraph_tpu.graph.builders import MutableGraph

jax = pytest.importorskip("jax")

from webgraph_tpu.algo.device import (  # noqa: E402
    DeviceCSR, bfs_distances, eccentricity, nf64)


def _bfs_host(n, off, succ, src):
    dist = np.full(n, -1, dtype=np.int64)
    dist[src] = 0
    q = [src]
    while q:
        nq = []
        for u in q:
            for v in succ[off[u]:off[u + 1]]:
                if dist[v] < 0:
                    dist[v] = dist[u] + 1
                    nq.append(v)
        q = nq
    return dist


@pytest.fixture(scope="module")
def graph():
    g = MutableGraph.erdos_renyi(300, 0.02, seed=3)
    off, succ = g.to_csr()
    return g, off, succ, DeviceCSR.from_graph(g)


def test_device_bfs_matches_host(graph):
    g, off, succ, csr = graph
    for s in (0, 17, 123, 299):
        got = np.asarray(bfs_distances(csr, s))
        np.testing.assert_array_equal(got, _bfs_host(g.num_nodes(), off, succ, s))


def test_device_bfs_multisource(graph):
    g, off, succ, csr = graph
    srcs = [4, 200]
    got = np.asarray(bfs_distances(csr, srcs))
    a = _bfs_host(g.num_nodes(), off, succ, 4)
    b = _bfs_host(g.num_nodes(), off, succ, 200)
    exp = np.where(a < 0, b, np.where(b < 0, a, np.minimum(a, b)))
    np.testing.assert_array_equal(got, exp)


def test_device_nf64_matches_host(graph):
    g, off, succ, csr = graph
    counts, _masks, it = nf64(csr, np.arange(64))
    it = int(it)
    host = np.zeros(it + 1, dtype=np.int64)
    for s in range(64):
        d = _bfs_host(g.num_nodes(), off, succ, s)
        for t in range(it + 1):
            host[t] += int(((d >= 0) & (d <= t)).sum())
    np.testing.assert_array_equal(np.asarray(counts)[: it + 1], host)


def test_device_eccentricity(graph):
    g, off, succ, csr = graph
    d = _bfs_host(g.num_nodes(), off, succ, 0)
    assert eccentricity(csr, 0) == int(d.max())


def test_sumsweep_device_sweeps_match_host():
    """SumSweep with every forward/backward sweep on the device BFS gives
    identical diameter/radius to the host sweeps
    (SumSweepDirectedDiameterRadius.java:1037 analog)."""
    from webgraph_tpu.algo.sumsweep import (OutputLevel,
                                            SumSweepDirectedDiameterRadius)

    g = MutableGraph.erdos_renyi(300, 0.02, seed=3)
    a = SumSweepDirectedDiameterRadius(g, OutputLevel.RADIUS_DIAMETER)
    a.compute()
    b = SumSweepDirectedDiameterRadius(g, OutputLevel.RADIUS_DIAMETER,
                                       use_device=True)
    b.compute()
    assert (a.get_diameter(), a.get_radius()) == \
        (b.get_diameter(), b.get_radius())


def test_nf_batches_inside_one_jit(graph):
    """make_nf_batches (the fori-inside-jit shape: one dispatch for many
    64-source batches) agrees with per-batch nf64 and with the host NF."""
    from webgraph_tpu.algo.device import make_nf_batches, \
        neighbourhood_function_device
    from webgraph_tpu.algo.nf import NeighbourhoodFunction

    g, off, succ, csr = graph
    n = g.num_nodes()
    cap = 32
    run = make_nf_batches(csr, cap)
    nb = -(-n // 64)
    counts, deepest = run(0, nb)
    counts = np.asarray(counts, dtype=np.float64)
    for b in range(nb):
        srcs = np.arange(b * 64, min(b * 64 + 64, n))
        c1, _, _ = nf64(csr, srcs, max_iters=cap)
        np.testing.assert_array_equal(counts[b], np.asarray(c1))
    total = neighbourhood_function_device(csr, max_iters=cap)
    host = NeighbourhoodFunction.compute(g)
    np.testing.assert_allclose(total, host)


def test_geometric_centralities_device(graph):
    """Bit-parallel device geometric centralities == host per-source BFS
    implementation (GeometricCentralities.java:70 exact definitions)."""
    from webgraph_tpu.algo.centralities import GeometricCentralities
    from webgraph_tpu.algo.device import geometric_centralities_device

    g, off, succ, csr = graph
    host = GeometricCentralities(g, alpha=0.5).compute()
    clo, har, lin, exp, reach = geometric_centralities_device(csr, alpha=0.5)
    np.testing.assert_array_equal(reach, host.reachable)
    np.testing.assert_allclose(clo, host.closeness, rtol=1e-6)
    np.testing.assert_allclose(har, host.harmonic, rtol=1e-5)
    np.testing.assert_allclose(lin, host.lin, rtol=1e-6)
    np.testing.assert_allclose(exp, host.exponential, rtol=1e-4)


def test_betweenness_device(graph):
    """Batched device Brandes == host Brandes oracle
    (BetweennessCentrality.java:256)."""
    from webgraph_tpu.algo.centralities import BetweennessCentrality
    from webgraph_tpu.algo.device import betweenness_device

    g, off, succ, csr = graph
    host = BetweennessCentrality(g).compute().betweenness
    dev = betweenness_device(csr)
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)


def test_centralities_use_device_flag(graph):
    """The host centrality classes dispatch to the device paths via
    use_device=True and agree with the host computation."""
    from webgraph_tpu.algo.centralities import (
        BetweennessCentrality, GeometricCentralities)

    g, off, succ, csr = graph
    h = GeometricCentralities(g).compute()
    d = GeometricCentralities(g, use_device=True).compute()
    np.testing.assert_allclose(d.closeness, h.closeness, rtol=1e-6)
    np.testing.assert_array_equal(d.reachable, h.reachable)
    hb = BetweennessCentrality(g).compute().betweenness
    db = BetweennessCentrality(g, use_device=True).compute().betweenness
    np.testing.assert_allclose(db, hb, rtol=1e-5, atol=1e-5)
