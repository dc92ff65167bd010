"""Device-batched random-access successor queries vs the host oracle.

Reference semantics: BVGraph.successors random access with recursive chain
resolution (BVGraph.java:1032-1133); adjacency via successor membership
(SpeedTest.java:123-156 uses skipTo for the same predicate).
"""

import numpy as np
import pytest

from webgraph_tpu.formats.bvgraph import BVGraph
from webgraph_tpu.graph.builders import MutableGraph

jax = pytest.importorskip("jax")

from webgraph_tpu.formats.bvgraph_query import BatchQuery  # noqa: E402


def _store(g, tmp_path, **kw):
    base = str(tmp_path / "g")
    BVGraph.store(g, base, **kw)
    return BVGraph.load(base)


def _check_batch(g, bv, nodes):
    q = BatchQuery(bv, batch_size=len(nodes))
    counts, rows = q.query(np.asarray(nodes, dtype=np.int32))
    counts = np.asarray(counts)
    rows = np.asarray(rows)
    toff, tsucc = g.to_csr()
    for i, x in enumerate(nodes):
        want = tsucc[toff[x] : toff[x + 1]]
        assert counts[i] == len(want), (x, counts[i], len(want))
        np.testing.assert_array_equal(rows[i, : len(want)], want, err_msg=f"node {x}")
    return q


@pytest.mark.parametrize("seed,n,p,kw", [
    (0, 300, 0.04, {}),
    (1, 200, 0.08, dict(min_interval_length=3)),
    (2, 250, 0.05, dict(window_size=0, max_ref_count=0)),
    (3, 220, 0.05, dict(window_size=7, max_ref_count=7)),
])
def test_batch_query_random_nodes(seed, n, p, kw, tmp_path):
    g = MutableGraph.erdos_renyi(n, p, seed=seed)
    bv = _store(g, tmp_path, **kw)
    rng = np.random.default_rng(seed)
    nodes = rng.integers(0, n, 64).astype(np.int32)
    _check_batch(g, bv, nodes)


def test_batch_query_deep_chains(tmp_path):
    from webgraph_tpu.graph.csr import CSRGraph

    lists = []
    for x in range(200):
        lists.append(sorted(set(range(0, 1 + x % 37)) | {399 - (x % 5)}))
    g = CSRGraph.from_lists(lists + [[]] * 200)
    bv = _store(g, tmp_path, window_size=7, max_ref_count=100,
                min_interval_length=2)
    nodes = np.arange(64, dtype=np.int32) * 3 % 400
    _check_batch(g, bv, nodes)


def test_batch_query_duplicates_and_empty(tmp_path):
    g = MutableGraph.erdos_renyi(150, 0.05, seed=9)
    bv = _store(g, tmp_path)
    nodes = np.array([5] * 10 + [0, 149] * 5 + list(range(44)), dtype=np.int32)
    _check_batch(g, bv, nodes)


def test_adjacency_queries(tmp_path):
    g = MutableGraph.erdos_renyi(300, 0.04, seed=4)
    bv = _store(g, tmp_path)
    toff, tsucc = g.to_csr()
    rng = np.random.default_rng(1)
    src = rng.integers(0, 300, 64).astype(np.int32)
    dst = rng.integers(0, 300, 64).astype(np.int32)
    # make half of them true arcs
    for i in range(0, 64, 2):
        x = src[i]
        if toff[x + 1] > toff[x]:
            dst[i] = tsucc[rng.integers(toff[x], toff[x + 1])]
    q = BatchQuery(bv, batch_size=64)
    got = np.asarray(q.adjacency(src, dst))
    want = np.array([
        dst[i] in set(tsucc[toff[src[i]] : toff[src[i] + 1]]) for i in range(64)
    ])
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_batch_query_cnr2000():
    from tests.conftest import CNR2000_BASENAME, cnr2000_available

    if not cnr2000_available():
        pytest.skip("cnr-2000 fixture not present")
    from webgraph_tpu.formats import bvgraph_np

    bv = BVGraph.load(CNR2000_BASENAME)
    toff, tsucc = bvgraph_np.decode_to_csr(bv)
    rng = np.random.default_rng(7)
    nodes = rng.integers(0, bv.num_nodes(), 256).astype(np.int32)
    q = BatchQuery(bv, batch_size=256)
    counts, rows = q.query(nodes)
    counts = np.asarray(counts)
    rows = np.asarray(rows)
    for i, x in enumerate(nodes):
        want = tsucc[toff[x] : toff[x + 1]]
        assert counts[i] == len(want)
        np.testing.assert_array_equal(rows[i, : len(want)], want)
