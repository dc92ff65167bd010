"""Device EFGraph bulk decoder vs the host vectorized decoder.

Reference: EliasFanoSuccessorReader enumeration, EFGraph.java:1064-1166;
LSB-first longword streams :892-1034.
"""

import os

import numpy as np
import pytest

from webgraph_tpu.formats.efgraph import EFGraph
from webgraph_tpu.graph.builders import MutableGraph

jax = pytest.importorskip("jax")

from webgraph_tpu.formats.efgraph_jax import decode_to_csr_device  # noqa: E402


@pytest.mark.parametrize("n,p,seed", [(400, 0.03, 4), (150, 0.1, 9)])
def test_ef_device_decode_matches_host(n, p, seed, tmp_path):
    g = MutableGraph.erdos_renyi(n, p, seed=seed)
    base = os.path.join(tmp_path, "ef")
    EFGraph.store(g, base)
    ef = EFGraph.load(base)
    hoff, hsucc = ef.decode_to_csr()
    doff, dsucc = decode_to_csr_device(ef)
    np.testing.assert_array_equal(doff, hoff)
    np.testing.assert_array_equal(dsucc, hsucc)
    toff, tsucc = g.to_csr()
    np.testing.assert_array_equal(doff, toff)
    np.testing.assert_array_equal(dsucc, tsucc)


def test_ef_device_decode_quantum_sweep(tmp_path):
    g = MutableGraph.erdos_renyi(200, 0.05, seed=2)
    toff, tsucc = g.to_csr()
    for log2q in (4, 8):
        base = os.path.join(tmp_path, f"ef{log2q}")
        EFGraph.store(g, base, log2_quantum=log2q)
        ef = EFGraph.load(base)
        doff, dsucc = decode_to_csr_device(ef)
        np.testing.assert_array_equal(doff, toff)
        np.testing.assert_array_equal(dsucc, tsucc)


def test_ef_device_decode_skewed_degrees(tmp_path):
    """Web-graph-like degree skew: the bit-parallel decoder has no
    per-outdegree lockstep, so one heavy node must not serialize anything
    (the round-4 max-outdegree fori is gone)."""
    from webgraph_tpu.graph.csr import CSRGraph

    rng = np.random.default_rng(7)
    lists = []
    for x in range(500):
        if x == 250:  # one huge list
            lists.append(sorted(rng.choice(5000, size=2000, replace=False)))
        elif x % 11 == 0:
            lists.append([])
        else:
            lists.append(sorted(set(rng.integers(0, 5000, size=rng.integers(1, 8)))))
    lists += [[] for _ in range(5000 - len(lists))]  # pad to n=5000
    g = CSRGraph.from_lists(lists)
    base = os.path.join(tmp_path, "ef")
    EFGraph.store(g, base)
    ef = EFGraph.load(base)
    hoff, hsucc = ef.decode_to_csr()
    doff, dsucc = decode_to_csr_device(ef)
    np.testing.assert_array_equal(doff, hoff)
    np.testing.assert_array_equal(dsucc, hsucc)


def test_ef_device_skip_to_batch(tmp_path):
    """Device batched adjacency (skip pointers + bounded unary scan) ==
    host skip_to / skip_to_batch (EliasFanoSuccessorReader.skipTo,
    EFGraph.java:1147)."""
    from webgraph_tpu.formats.efgraph_jax import skip_to_batch_device

    g = MutableGraph.erdos_renyi(600, 0.05, seed=3)
    base = os.path.join(tmp_path, "ef")
    EFGraph.store(g, base, log2_quantum=4)  # small quantum: pointers used
    ef = EFGraph.load(base)
    rng = np.random.default_rng(1)
    Q = 512
    xs = rng.integers(0, 600, size=Q)
    bounds = rng.integers(0, 650, size=Q)
    host = ef.skip_to_batch(xs, bounds)
    dev = skip_to_batch_device(ef, xs, bounds)
    np.testing.assert_array_equal(dev, host)
    # scalar oracle spot checks
    for j in range(0, Q, 37):
        assert int(dev[j]) == ef.skip_to(int(xs[j]), int(bounds[j]))


def test_ef_device_skip_to_long_gaps(tmp_path):
    """Unary gaps > 32 in the upper bits (hub-like lists whose first
    successor is far away) — regression for the round-4 window-miss bug
    that dropped 32 zeros per missed window."""
    from webgraph_tpu.formats.efgraph_jax import skip_to_batch_device
    from webgraph_tpu.graph.csr import CSRGraph

    lists = [[] for _ in range(2000)]
    lists[0] = [1500, 1501, 1999]      # first gap >> 32 zeros
    lists[5] = [1900]
    lists[7] = list(range(1990, 2000))
    g = CSRGraph.from_lists(lists)
    base = os.path.join(tmp_path, "ef")
    EFGraph.store(g, base)
    ef = EFGraph.load(base)
    xs = np.array([0, 0, 0, 5, 5, 7, 7, 3])
    bounds = np.array([0, 1501, 1600, 0, 1901, 1995, 0, 10])
    host = ef.skip_to_batch(xs, bounds)
    dev = skip_to_batch_device(ef, xs, bounds)
    np.testing.assert_array_equal(dev, host)
    for j in range(len(xs)):
        assert int(dev[j]) == ef.skip_to(int(xs[j]), int(bounds[j]))
