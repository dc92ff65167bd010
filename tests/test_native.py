"""Native C++ codec vs the Python oracle: byte-exact encode, exact decode."""

import os

import numpy as np
import pytest

from webgraph_tpu import native
from webgraph_tpu.bits import codes as C
from webgraph_tpu.formats.bvgraph import BVGraph, BVGraphSettings
from webgraph_tpu.graph.builders import MutableGraph

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def test_decode_offsets_matches(tmp_path):
    g = MutableGraph.erdos_renyi(150, 0.05, seed=1)
    base = os.path.join(tmp_path, "g")
    BVGraph.store(g, base)
    with open(base + ".offsets", "rb") as f:
        data = f.read()
    got = native.decode_offsets(data, 151, C.GAMMA, 3)
    bv = BVGraph.load(base)
    np.testing.assert_array_equal(got, bv.bit_offsets)


@pytest.mark.parametrize("window,maxref,minint", [(7, 3, 4), (0, 0, 4), (2, 2, 0), (7, 3, 3)])
def test_native_encode_byte_exact(window, maxref, minint, tmp_path):
    g = MutableGraph.erdos_renyi(200, 0.04, seed=2)
    base = os.path.join(tmp_path, "py")
    BVGraph.store(g, base, window_size=window, max_ref_count=maxref, min_interval_length=minint)
    with open(base + ".graph", "rb") as f:
        py_graph = f.read()
    with open(base + ".offsets", "rb") as f:
        py_off = f.read()
    offsets, succ = g.to_csr()
    from dataclasses import replace

    s = replace(
        BVGraphSettings(),
        window_size=window,
        max_ref_count=maxref,
        min_interval_length=minint,
    )
    out = native.bvgraph_encode(offsets, succ, s)
    assert out is not None
    graph_bytes, gbits, off_bytes, obits, stats = out
    assert graph_bytes == py_graph
    assert off_bytes == py_off
    # arc-class accounting must sum to numArcs
    assert stats[5] + stats[6] + stats[7] == g.num_arcs()


def test_native_decode_matches(tmp_path):
    g = MutableGraph.erdos_renyi(250, 0.04, seed=3)
    base = os.path.join(tmp_path, "g")
    BVGraph.store(g, base)
    bv = BVGraph.load(base)
    with open(base + ".graph", "rb") as f:
        data = f.read()
    out = native.bvgraph_decode(data, bv.num_nodes(), bv.num_arcs(), bv.settings)
    assert out is not None
    off, succ = out
    toff, tsucc = g.to_csr()
    np.testing.assert_array_equal(off, toff)
    np.testing.assert_array_equal(succ, tsucc)


@pytest.mark.slow
def test_native_cnr2000_roundtrip():
    from conftest import CNR2000_BASENAME, cnr2000_available

    if not cnr2000_available():
        pytest.skip("no fixture")
    import time

    bv = BVGraph.load(CNR2000_BASENAME)
    with open(CNR2000_BASENAME + ".graph", "rb") as f:
        data = f.read()
    t0 = time.time()
    off, succ = native.bvgraph_decode(data, bv.num_nodes(), bv.num_arcs(), bv.settings)
    dt = time.time() - t0
    truth = np.load("/tmp/cnr-2000-truth.npz")
    np.testing.assert_array_equal(off, truth["offsets"])
    np.testing.assert_array_equal(succ, truth["succ"])
    print(f"native decode: {bv.num_arcs() / dt / 1e6:.1f} Medges/s")
    # native re-encode must be byte-exact vs the original Java file
    t0 = time.time()
    out = native.bvgraph_encode(off, succ, bv.settings)
    dt = time.time() - t0
    graph_bytes = out[0]
    assert graph_bytes == data
    print(f"native encode: {bv.num_arcs() / dt / 1e6:.1f} Medges/s")
