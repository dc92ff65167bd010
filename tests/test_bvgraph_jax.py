"""Device (JAX) BVGraph decoder vs the scalar oracle (CPU backend)."""

import os

import numpy as np
import pytest

from webgraph_tpu.formats.bvgraph import BVGraph
from webgraph_tpu.graph.builders import MutableGraph

jax = pytest.importorskip("jax")

from webgraph_tpu.formats import bvgraph_jax  # noqa: E402


@pytest.mark.parametrize(
    "window,maxref,minint,seed,n,p",
    [
        (7, 3, 4, 0, 300, 0.03),
        (7, 3, 3, 1, 200, 0.08),
        (0, 0, 4, 2, 150, 0.05),
        (1, 1, 0, 3, 150, 0.05),
        (2, 2, 2, 4, 250, 0.04),
        (7, 7, 2, 5, 400, 0.02),
    ],
)
def test_device_decode_matches_oracle(window, maxref, minint, seed, n, p, tmp_path):
    g = MutableGraph.erdos_renyi(n, p, seed=seed)
    basename = os.path.join(tmp_path, "g")
    BVGraph.store(g, basename, window_size=window, max_ref_count=maxref, min_interval_length=minint)
    bv = BVGraph.load(basename)
    dg = bvgraph_jax.DeviceGraph.from_host(bv)
    offsets, succ, _ = bvgraph_jax.decode_to_csr(dg, lanes=64)
    toff, tsucc = g.to_csr()
    np.testing.assert_array_equal(np.asarray(offsets), toff)
    np.testing.assert_array_equal(np.asarray(succ), tsucc)


def test_device_decode_structures(tmp_path):
    # graph rich in intervals and copies
    lists = []
    for x in range(120):
        base = list(range(x + 1, x + 20)) + [200 + (x % 7), 300 + 2 * (x % 11)]
        lists.append(sorted(set(v for v in base if v < 400)))
    from webgraph_tpu.graph.csr import CSRGraph

    g = CSRGraph.from_lists(lists + [[]] * 280)
    basename = os.path.join(tmp_path, "s")
    BVGraph.store(g, basename)
    bv = BVGraph.load(basename)
    dg = bvgraph_jax.DeviceGraph.from_host(bv)
    offsets, succ, _ = bvgraph_jax.decode_to_csr(dg, lanes=32)
    toff, tsucc = g.to_csr()
    np.testing.assert_array_equal(np.asarray(offsets), toff)
    np.testing.assert_array_equal(np.asarray(succ), tsucc)
