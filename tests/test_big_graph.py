"""Large-synthetic scale regression (reference BVGraphSlowTest analog,
slow/.../BVGraphSlowTest.java:31,88): a multi-million-arc graph through
native store -> load -> decode, plus the single-invocation capacity
boundary of the streaming kernel (its VMEM output slab bounds one call;
beyond it, decode_to_csr tiles the node range through one compiled
kernel)."""

import os

import numpy as np
import pytest

from webgraph_tpu.formats.bvgraph import BVGraph
from webgraph_tpu.graph.builders import MutableGraph

pytestmark = pytest.mark.slow


def test_big_graph_roundtrip_and_capacity(tmp_path):
    jax = pytest.importorskip("jax")
    from webgraph_tpu.formats import bvgraph_np
    from webgraph_tpu.pallas import decode2 as D2

    n, m = 2_000_000, 20_000_000
    g = MutableGraph.erdos_renyi(n, m=m, seed=17)
    toff, tsucc = g.to_csr()
    base = os.path.join(tmp_path, "big")
    BVGraph.store(g, base, num_shards=4)
    bv = BVGraph.load(base)
    assert bv.num_nodes() == n and bv.num_arcs() == m
    # int64 bit offsets monotone and consistent with the stream length
    bo = bv.bit_offsets.astype(np.int64)
    assert (np.diff(bo) > 0).all()
    assert 0 <= bv._bit_length - int(bo[-1]) < 8  # byte-rounded padding

    # full oracle decode equals the generator CSR
    off, succ = bvgraph_np.decode_to_csr(bv)
    np.testing.assert_array_equal(off, toff)
    np.testing.assert_array_equal(succ, tsucc)

    # the streaming kernel's single-invocation slab cannot hold 20 M arcs:
    # a single-range plan must refuse loudly (not hang or mis-partition)…
    assert D2.supports(bv)
    from webgraph_tpu.pallas.plan import scan_structure

    scan = scan_structure(bv)
    with pytest.raises(ValueError, match="too large"):
        D2.plan_lanes(bv, scan)
    # …and decode_to_csr must tile it through ONE compiled kernel — the
    # flagship decode path at every scale (the unbounded-size analog of
    # the reference's sequential decode, BVGraph.java:1136-1281)
    tiles = D2.plan_tiles(bv, scan)
    assert len(tiles) >= 3
    assert tiles[0].lo == 0 and tiles[-1].hi == n
    assert all(a.hi == b.lo for a, b in zip(tiles, tiles[1:]))
    koff, ksucc = D2.decode_to_csr(bv, interpret=True)
    np.testing.assert_array_equal(koff, toff)
    np.testing.assert_array_equal(ksucc, tsucc)

    # random access spot checks at the far end of the stream
    for x in (0, n // 2, n - 1):
        np.testing.assert_array_equal(
            np.asarray(list(bv.successors(x))), tsucc[toff[x]:toff[x + 1]])


@pytest.mark.slow
def test_bit_cursor_past_2p31(tmp_path):
    """Scale boundary: a stream whose bit length exceeds 2^31 (the int32
    bit-cursor limit; 256 MiB).  The reference's BigGraph slow test
    (slow/.../BVGraphSlowTest.java:31,88) exercises the int-node boundary;
    here the BIT-cursor boundary: int64 offsets end-to-end, random access
    and oracle decode correct in the >2^31-bit region, and the tile planner
    derives in-range per-lane word cursors."""
    import numpy as np

    from webgraph_tpu.graph.csr import CSRGraph

    n, k = 6_000_000, 16
    step = 311_111  # k*step << n and gcd-safe: rows are distinct mod n
    x = np.arange(n, dtype=np.int64)[:, None]
    j = np.arange(k, dtype=np.int64)[None, :]
    succ2d = (x * 2654435761 % n + 1 + j * step) % n
    succ2d.sort(axis=1)
    assert (np.diff(succ2d, axis=1) > 0).all()
    offsets = np.arange(n + 1, dtype=np.int64) * k
    g = CSRGraph(offsets, succ2d.reshape(-1).astype(np.int32))

    base = os.path.join(tmp_path, "big")
    BVGraph.store(g, base, num_shards=4)
    bv = BVGraph.load(base)
    bo = bv.bit_offsets.astype(np.int64)
    assert int(bv._bit_length) > 2**31, int(bv._bit_length)
    # _bit_length is the byte-rounded file length: up to 7 bits of padding
    assert bo.dtype == np.int64
    assert 0 <= bv._bit_length - int(bo[-1]) < 8
    first_over = int(np.searchsorted(bo, 2**31))

    # random access straddling and beyond the 2^31-bit boundary
    for xq in (first_over - 1, first_over, first_over + 1, n - 1):
        np.testing.assert_array_equal(
            np.asarray(list(bv.successors(xq))), succ2d[xq])

    # tile planning: per-lane word cursors must be in-range for every tile
    from webgraph_tpu.pallas import decode2 as D2
    from webgraph_tpu.pallas.plan import scan_structure

    scan = scan_structure(bv)
    tiles = D2.plan_tiles(bv, scan)
    assert tiles[-1].hi == n
    boundary_tiles = [t for t in tiles
                      if t.lo <= first_over < t.hi or t.hi == first_over]
    assert boundary_tiles
    for t in tiles:
        # lane word rows: relative cursors fit int32 even though the
        # absolute bit cursor is past 2^31
        assert int(t.bit0.max(initial=0)) < 2**31
        assert int(t.bit0b.max(initial=0)) < 2**31
        assert (t.word0 >= 0).all()

    # oracle decode of a window past the boundary (sequential iterator
    # primed mid-graph, BVGraph.java:1173-1183 semantics)
    it = bv.node_iterator(first_over)
    for xq in range(first_over, first_over + 50):
        assert it.next_int() == xq
        np.testing.assert_array_equal(it.successor_array(), succ2d[xq])
