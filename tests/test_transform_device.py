"""Device sort-based transforms vs the host oracle (transform/transform.py).

Reference anchors: Transform.java:964-1052 (transpose), :654-723 (map),
:913-951 (symmetrize); device formulation = one lax.sort over arcs.
"""

import numpy as np
import pytest

from webgraph_tpu.graph.builders import MutableGraph
from webgraph_tpu.graph.csr import CSRGraph

jax = pytest.importorskip("jax")

from webgraph_tpu.transform import transform as T  # noqa: E402
from webgraph_tpu.transform.device import (  # noqa: E402
    map_device, symmetrize_device, transpose_device)


@pytest.fixture(scope="module")
def g():
    return MutableGraph.erdos_renyi(400, 0.02, seed=8)


def test_transpose_device_matches_host(g):
    off, succ = transpose_device(g)
    ref = T.transpose(g)
    roff, rsucc = ref.to_csr()
    np.testing.assert_array_equal(off, roff)
    np.testing.assert_array_equal(succ, rsucc)


def test_map_device_matches_host(g):
    rng = np.random.default_rng(5)
    perm = rng.permutation(g.num_nodes()).astype(np.int64)
    perm[perm % 7 == 0] = -1  # deletions
    off, succ = map_device(g, perm)
    ref = T.map_graph(g, perm)
    roff, rsucc = ref.to_csr()
    np.testing.assert_array_equal(off, roff)
    np.testing.assert_array_equal(succ, rsucc)


def test_symmetrize_device_matches_host(g):
    off, succ = symmetrize_device(g)
    ref = T.symmetrize(g)
    roff, rsucc = ref.to_csr()
    np.testing.assert_array_equal(off, roff)
    np.testing.assert_array_equal(succ, rsucc)


def test_config4_pipeline_device(g, tmp_path):
    """BASELINE config 4 composition with the data path on device:
    decode -> device transpose -> device gray-permute apply -> device
    recompress; byte-identical to the host pipeline (Transform.java
    transpose/permutations + BVGraph.store).  Permutation KEY GENERATION
    (the Gray column-refinement sort) stays host-side planning."""
    import os

    from webgraph_tpu.formats import bvgraph_jax_encode as E
    from webgraph_tpu.formats.bvgraph import BVGraph
    from webgraph_tpu.graph.csr import CSRGraph

    # device transpose leg
    off_t, succ_t = transpose_device(g)
    gt_host = T.transpose(g)
    roff, rsucc = gt_host.to_csr()
    np.testing.assert_array_equal(off_t, roff)
    np.testing.assert_array_equal(succ_t, rsucc)

    # device permute-apply leg (gray keys from host planning)
    perm = T.gray_code_permutation(g)
    off_p, succ_p = map_device(g, perm)
    gp_host = T.map_graph(g, perm)
    poff, psucc = gp_host.to_csr()
    np.testing.assert_array_equal(off_p, poff)
    np.testing.assert_array_equal(succ_p, psucc)

    # device recompress leg: bytes == host encoder bytes
    base = os.path.join(tmp_path, "host")
    BVGraph.store(CSRGraph(poff, psucc), base)
    host_bytes = open(base + ".graph", "rb").read()
    from webgraph_tpu.formats.bvgraph import BVGraphSettings

    gb, _gbits, _ob, _obits, _st = E.encode_device(
        off_p, succ_p, BVGraphSettings())
    assert gb == host_bytes
