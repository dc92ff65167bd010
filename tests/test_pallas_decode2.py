"""Streaming lane-range (v6) Pallas decoder vs the scalar oracle.

Runs the Mosaic kernel in interpret mode on CPU.  The scalar codec
(bits/bitstream.py) produced the stored fixtures; ``MutableGraph.to_csr``
is the ground truth.  Reference semantics: BVGraph.java:139-196 (record
layout), :1136-1281 (sequential window decode).
"""

import os

import numpy as np
import pytest

from webgraph_tpu.formats.bvgraph import BVGraph
from webgraph_tpu.graph.builders import MutableGraph

jax = pytest.importorskip("jax")

from webgraph_tpu.pallas import decode2 as D2  # noqa: E402


def _roundtrip(g, tmp_path, **store_kw):
    basename = os.path.join(tmp_path, "g")
    BVGraph.store(g, basename, **store_kw)
    bv = BVGraph.load(basename)
    offsets, succ = D2.decode_to_csr(bv, interpret=True)
    toff, tsucc = g.to_csr()
    np.testing.assert_array_equal(offsets, toff)
    np.testing.assert_array_equal(succ, tsucc)


def test_streaming_decode_default(tmp_path):
    g = MutableGraph.erdos_renyi(300, 0.03, seed=0)
    _roundtrip(g, tmp_path,
               window_size=7, max_ref_count=3, min_interval_length=4)


@pytest.mark.slow
@pytest.mark.parametrize(
    "window,maxref,minint,seed,n,p",
    [
        (7, 3, 3, 1, 200, 0.08),
        (0, 0, 4, 2, 150, 0.05),   # no references at all
        (1, 1, 0, 3, 150, 0.05),   # no intervals (minint 0)
        (2, 2, 2, 4, 250, 0.04),
        (7, 7, 2, 5, 400, 0.02),   # deep chains within window
    ],
)
def test_streaming_decode_matches_oracle(window, maxref, minint, seed, n, p,
                                         tmp_path):
    g = MutableGraph.erdos_renyi(n, p, seed=seed)
    _roundtrip(g, tmp_path, window_size=window, max_ref_count=maxref,
               min_interval_length=minint)


@pytest.mark.slow
def test_streaming_decode_structures(tmp_path):
    """Interval- and copy-rich lists (runs, long references, empty nodes)."""
    lists = []
    for x in range(120):
        if x % 17 == 0:
            lists.append([])
        elif x % 3 == 0:
            lists.append(list(range(x, x + 40)))           # pure interval
        elif x % 3 == 1:
            lists.append(list(range(x, x + 40)) + [200 + x, 400 + x])
        else:
            lists.append([1, 5, 9, 200 + 2 * x])           # residual-ish
    from webgraph_tpu.graph.csr import CSRGraph

    g = CSRGraph.from_lists(lists)
    _roundtrip(g, tmp_path,
               window_size=7, max_ref_count=3, min_interval_length=4)


@pytest.mark.slow
def test_streaming_decode_delta_codes(tmp_path):
    from webgraph_tpu.bits import codes as C
    from webgraph_tpu.formats.bvgraph import BVGraphSettings

    g = MutableGraph.erdos_renyi(200, 0.05, seed=9)
    s = BVGraphSettings(window_size=4, max_ref_count=2,
                        min_interval_length=2)
    s.codings["OUTDEGREES"] = C.DELTA
    s.codings["BLOCKS"] = C.DELTA
    s.codings["RESIDUALS"] = C.GAMMA
    _roundtrip(g, tmp_path, settings=s)


def test_decode_auto_dispatch(tmp_path):
    """decode_to_csr_auto picks a working path for every configuration:
    streaming kernel for standard configs, host fallback for GOLOMB
    residuals (no window reader, BVGraph.java:791-849) and for unbounded
    reference chains whose ancestor reach exceeds the overlap budget."""
    from webgraph_tpu.bits import codes as Cd
    from webgraph_tpu.formats.bvgraph import BVGraphSettings

    g = MutableGraph.erdos_renyi(250, 0.04, seed=12)
    toff, tsucc = g.to_csr()

    # standard config -> streaming kernel
    base = os.path.join(tmp_path, "std")
    BVGraph.store(g, base)
    bv = BVGraph.load(base)
    assert D2.supports(bv)
    off, succ = D2.decode_to_csr_auto(bv, interpret=True)
    np.testing.assert_array_equal(succ, tsucc)

    # GOLOMB residuals -> no window reader, host fallback
    s = BVGraphSettings(window_size=4, max_ref_count=2)
    s.codings["RESIDUALS"] = Cd.GOLOMB
    base2 = os.path.join(tmp_path, "gol")
    BVGraph.store(g, base2, settings=s)
    bv2 = BVGraph.load(base2)
    assert not D2.supports(bv2)
    off2, succ2 = D2.decode_to_csr_auto(bv2)
    np.testing.assert_array_equal(succ2, tsucc)


def test_tiled_decode_matches_oracle(tmp_path):
    """Forced multi-tile decode (tile_arcs below the graph size) is
    bit-identical to the oracle and to the single-invocation path — the
    mechanism that scales the streaming kernel past its VMEM slab
    (reference analog: unbounded sequential decode, BVGraph.java:1136-1281)."""
    from webgraph_tpu.formats import bvgraph_np
    from webgraph_tpu.pallas.plan import scan_structure

    g = MutableGraph.erdos_renyi(3000, m=30000, seed=11)
    base = os.path.join(tmp_path, "g")
    BVGraph.store(g, base)
    bv = BVGraph.load(base)
    toff, tsucc = bvgraph_np.decode_to_csr(bv)

    scan = scan_structure(bv)
    tiles = D2.plan_tiles(bv, scan, tile_arcs=5000)
    assert len(tiles) >= 5
    # common compiled shape across tiles
    assert len({(p.slabw, p.lw, p.sb) for p in tiles}) == 1
    # contiguous full cover
    assert tiles[0].lo == 0 and tiles[-1].hi == bv.num_nodes()
    assert all(a.hi == b.lo for a, b in zip(tiles, tiles[1:]))

    off, succ = D2.decode_to_csr(bv, interpret=True, tile_arcs=5000)
    np.testing.assert_array_equal(off, toff)
    np.testing.assert_array_equal(succ, tsucc)
