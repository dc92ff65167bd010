"""Mesh-sharded device encode vs the serial encoders (byte parity).

Reference: parallel compression + bit-concatenation of per-thread streams,
BVGraph.java:2469-2550; per-thread window priming :1173-1183 (references
cross shard boundaries, output identical to single-threaded).
"""

import os

import numpy as np
import pytest

from webgraph_tpu.graph.builders import MutableGraph

jax = pytest.importorskip("jax")

from webgraph_tpu.formats import bvgraph_jax_encode as E  # noqa: E402
from webgraph_tpu.formats.bvgraph import BVGraphSettings  # noqa: E402
from webgraph_tpu.parallel.shard_encode import encode_sharded  # noqa: E402


class _W:
    def __init__(self, offsets, succ, n, settings):
        self._o, self._s, self._n = offsets, succ, n
        self.settings = settings

    def to_csr(self):
        return self._o, self._s

    def num_nodes(self):
        return self._n


@pytest.mark.parametrize("shards", [3, 4])
def test_sharded_encode_matches_serial(shards):
    """Non-divisible and divisible shard counts, vmapped cost pass."""
    g = MutableGraph.erdos_renyi(1000, 0.02, seed=6)
    offsets, succ = g.to_csr()
    s = BVGraphSettings()
    ser_gb, ser_bits, ser_ob, ser_obits, _ = E.encode_device(
        offsets, succ, s)
    gb, gbits, ob, obits = encode_sharded(
        _W(offsets, succ, g.num_nodes(), s), shards)
    assert (gb, gbits) == (ser_gb, ser_bits)
    assert (ob, obits) == (ser_ob, ser_obits)


@pytest.mark.slow
def test_sharded_encode_cnr2000_fixture_bytes():
    """8-shard mesh encode (shard_map cost pass) reproduces the cnr-2000
    fixture's .graph and .offsets byte-for-byte."""
    from jax.sharding import Mesh

    from webgraph_tpu.formats.bvgraph import BVGraph

    cnr = "/root/reference/slow/it/unimi/dsi/webgraph/cnr-2000"
    if not os.path.exists(cnr + ".graph"):
        pytest.skip("cnr-2000 fixture not available")
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("shards",))
    bv = BVGraph.load(cnr)
    gb, _gbits, ob, _obits = encode_sharded(bv, 8, mesh=mesh)
    assert gb == open(cnr + ".graph", "rb").read()
    assert ob == open(cnr + ".offsets", "rb").read()
