"""BVGraph codec tests: round-trip sweeps, accounting invariants, interop.

Modeled on the reference's BVGraphTest.testCompression sweep
(test/.../BVGraphTest.java:51-72): generator type x size x window x maxref x
minInterval, store + reload in all modes, assert graph equality AND that the
per-component bit counters sum exactly to the stream size and the per-class
arc counters sum to the arc count.
"""

import os

import numpy as np
import pytest

from webgraph_tpu.bits import codes as C
from webgraph_tpu.formats.bvgraph import BVGraph, BVGraphSettings
from webgraph_tpu.graph.builders import MutableGraph
from webgraph_tpu.graph.csr import CSRGraph
from webgraph_tpu.graph import immutable_graph

from test_graph import assert_graph


def roundtrip(g, tmp_path, name="g", **kwargs):
    basename = os.path.join(tmp_path, name)
    props = BVGraph.store(g, basename, **kwargs)
    # accounting invariants
    component_bits = sum(
        int(props[k])
        for k in ("bitsforoutdegrees", "bitsforreferences", "bitsforblocks", "bitsforintervals", "bitsforresiduals")
    )
    assert component_bits == int(props["graphbits"]), "component bits must sum to stream bits"
    arcs = sum(int(props[k]) for k in ("copiedarcs", "intervalisedarcs", "residualarcs"))
    assert arcs == int(props["arcs"]) == g.num_arcs(), "arc classes must sum to numArcs"
    loaded = BVGraph.load(basename)
    assert loaded.num_nodes() == g.num_nodes()
    assert loaded.num_arcs() == g.num_arcs()
    assert loaded == g
    return loaded, props


GENERATORS = [
    lambda: MutableGraph.erdos_renyi(80, 0.08, seed=5),
    lambda: MutableGraph.erdos_renyi(120, 0.03, seed=7),
    lambda: MutableGraph.directed_cycle(64),
    lambda: MutableGraph.complete_graph(20),
    lambda: MutableGraph.complete_binary_outtree(5),
    lambda: CSRGraph.from_lists([[], [], []]),  # all-empty lists
    lambda: CSRGraph.from_lists([list(range(1, 50))] + [[] for _ in range(49)]),  # long intervals
]


@pytest.mark.parametrize("gen_idx", range(len(GENERATORS)))
@pytest.mark.parametrize("window,maxref,minint", [(7, 3, 4), (0, 0, 4), (1, 1, 0), (2, 2, 2), (7, 1, 3)])
def test_compression_sweep(gen_idx, window, maxref, minint, tmp_path):
    g = GENERATORS[gen_idx]()
    loaded, _ = roundtrip(
        g, tmp_path, window_size=window, max_ref_count=maxref, min_interval_length=minint
    )
    if loaded.num_nodes() <= 150:
        assert_graph(loaded)


@pytest.mark.parametrize(
    "residual_coding", [C.GAMMA, C.DELTA, C.ZETA, C.GOLOMB, C.NIBBLE]
)
def test_residual_code_sweep(residual_coding, tmp_path):
    g = MutableGraph.erdos_renyi(60, 0.1, seed=11)
    settings = BVGraphSettings(codings={**dict(
        OUTDEGREES=C.GAMMA, BLOCKS=C.GAMMA, RESIDUALS=residual_coding,
        REFERENCES=C.UNARY, BLOCK_COUNT=C.GAMMA, OFFSETS=C.GAMMA)})
    loaded, props = roundtrip(g, tmp_path, settings=settings, zeta_k=4)
    # flags string must round-trip through the properties file
    assert loaded.settings.residual_coding == residual_coding


def test_code_flags_roundtrip():
    s = BVGraphSettings.from_flags_string("OUTDEGREES_DELTA | RESIDUALS_GOLOMB|BLOCK_COUNT_UNARY")
    assert s.outdegree_coding == C.DELTA
    assert s.residual_coding == C.GOLOMB
    assert s.block_count_coding == C.UNARY
    assert s.block_coding == C.GAMMA
    s2 = BVGraphSettings.from_flags_string(s.flags_string())
    assert s2.codings == s.codings
    s3 = BVGraphSettings.from_flags_mask(s.flags_mask())
    assert s3.codings == s.codings


def test_multi_shard_store_equals(tmp_path):
    g = MutableGraph.erdos_renyi(200, 0.05, seed=13)
    a, _ = roundtrip(g, tmp_path, name="a", num_shards=1)
    b, _ = roundtrip(g, tmp_path, name="b", num_shards=4)
    assert a == b == g


def test_load_dispatch(tmp_path):
    g = MutableGraph.erdos_renyi(50, 0.1, seed=17)
    basename = os.path.join(tmp_path, "disp")
    BVGraph.store(g, basename)
    loaded = immutable_graph.load(basename)
    assert isinstance(loaded, BVGraph)
    assert loaded == g
    seq = immutable_graph.load(basename, immutable_graph.LoadMethod.OFFLINE)
    assert CSRGraph.from_graph(seq) == g


def test_random_access_matches_sequential(tmp_path):
    g = MutableGraph.erdos_renyi(100, 0.07, seed=19)
    basename = os.path.join(tmp_path, "ra")
    BVGraph.store(g, basename)
    loaded = BVGraph.load(basename)
    rng = np.random.default_rng(0)
    for x in rng.integers(0, 100, size=30):
        np.testing.assert_array_equal(loaded.successors(int(x)), g.successors(int(x)))
        assert loaded.outdegree(int(x)) == g.outdegree(int(x))
    assert_graph(loaded)


def test_mid_start_iterator_priming(tmp_path):
    g = MutableGraph.erdos_renyi(100, 0.1, seed=23)
    basename = os.path.join(tmp_path, "mid")
    BVGraph.store(g, basename)
    loaded = BVGraph.load(basename)
    it = loaded.node_iterator(37)
    x = it.next_int()
    assert x == 37
    np.testing.assert_array_equal(it.successor_array(), g.successors(37))


def test_offsets_regeneration(tmp_path):
    g = MutableGraph.erdos_renyi(60, 0.1, seed=29)
    basename = os.path.join(tmp_path, "off")
    BVGraph.store(g, basename)
    with open(f"{basename}.offsets", "rb") as f:
        original = f.read()
    loaded = BVGraph.load(basename)
    os.remove(f"{basename}.offsets")
    loaded.write_offsets(basename)
    with open(f"{basename}.offsets", "rb") as f:
        regenerated = f.read()
    assert regenerated == original


def test_outdegrees_stream(tmp_path):
    from webgraph_tpu.bits.bitstream import InputBitStream

    g = MutableGraph.erdos_renyi(60, 0.1, seed=31)
    basename = os.path.join(tmp_path, "outd")
    BVGraph.store(g, basename)
    loaded = BVGraph.load(basename)
    loaded.write_outdegrees(basename)
    with open(f"{basename}.outdegrees", "rb") as f:
        ibs = InputBitStream(f.read())
    for x in range(60):
        assert ibs.read_gamma() == g.outdegree(x)


def test_parallel_native_sharded_store_matches_serial(tmp_path):
    """num_shards > 1 now compresses shards CONCURRENTLY via the native
    codec (ctypes releases the GIL) and bit-concatenates the streams
    (reference CompressionThread + copyTo merge, BVGraph.java:2469-2550);
    output must be byte-identical to the serial Python sharded encoder."""
    import numpy as np

    from webgraph_tpu import native
    from webgraph_tpu.formats import bvgraph_np

    if not native.available():
        import pytest

        pytest.skip("native codec unavailable")
    # (2500, 4) divides evenly; (1000, 3) does not — round(i*n/S) bounds
    # (667) differ from floor/linspace bounds (666), so the second case
    # guards the split_node_iterators bound parity (immutable_graph.py:209)
    for case, (nn, shards, seed) in enumerate(
            [(2500, 4, 6), (1000, 3, 7)]):
        g = MutableGraph.erdos_renyi(nn, 0.012, seed=seed)
        ser = str(tmp_path / f"ser{case}")
        par = str(tmp_path / f"par{case}")
        BVGraph.store(g, ser, num_shards=shards, use_native=False)
        BVGraph.store(g, par, num_shards=shards, use_native=True)
        for ext in (".graph", ".offsets"):
            with open(ser + ext, "rb") as f:
                a = f.read()
            with open(par + ext, "rb") as f:
                b = f.read()
            assert a == b, (case, ext)
    off, succ = bvgraph_np.decode_to_csr(BVGraph.load(par))
    toff, tsucc = g.to_csr()
    np.testing.assert_array_equal(off, toff)
    np.testing.assert_array_equal(succ, tsucc)
