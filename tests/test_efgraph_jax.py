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
