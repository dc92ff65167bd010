"""Device (JAX) BVGraph encoder: byte-exactness against the host oracle.

The device encoder must produce .graph and .offsets streams byte-identical
to the host scalar encoder (which itself re-encodes cnr-2000 byte-exactly),
plus identical per-component statistics.
"""

import os

import numpy as np
import pytest

from webgraph_tpu.bits import codes as C
from webgraph_tpu.formats.bvgraph import BVGraph, BVGraphSettings
from webgraph_tpu.formats import bvgraph_jax_encode as E
from webgraph_tpu.graph.builders import MutableGraph


def _host_bytes(g, tmp_path, name, **kw):
    base = str(tmp_path / name)
    props = BVGraph.store(g, base, use_native=False, **kw)
    with open(base + ".graph", "rb") as f:
        gb = f.read()
    with open(base + ".offsets", "rb") as f:
        ob = f.read()
    return gb, ob, props


def _check(g, tmp_path, name, **kw):
    gb, ob, props = _host_bytes(g, tmp_path, name, **kw)
    offsets, succ = g.to_csr()
    s = BVGraphSettings(**{k: v for k, v in kw.items() if k != "settings"}) if "settings" not in kw else kw["settings"]
    dgb, gbits, dob, obits, stats = E.encode_device(offsets, succ, s)
    assert dgb == gb, f"{name}: .graph bytes differ"
    assert dob == ob, f"{name}: .offsets bytes differ"
    assert gbits == int(props["graphbits"])
    assert obits == int(props["offsetbits"])
    assert stats["copied_arcs"] == int(props["copiedarcs"])
    assert stats["intervalised_arcs"] == int(props["intervalisedarcs"])
    assert stats["residual_arcs"] == int(props["residualarcs"])
    assert stats["bits_residuals"] == int(props["bitsforresiduals"])
    assert stats["bits_blocks"] == int(props["bitsforblocks"])
    assert stats["bits_intervals"] == int(props["bitsforintervals"])
    return stats


GENERATORS = [
    ("cycle", lambda: MutableGraph.directed_cycle(40)),
    ("complete", lambda: MutableGraph.complete_graph(24, loops=False)),
    ("er-sparse", lambda: MutableGraph.erdos_renyi(120, 0.04, seed=7)),
    ("er-dense", lambda: MutableGraph.erdos_renyi(60, 0.3, seed=11)),
    ("outtree", lambda: MutableGraph.complete_binary_outtree(5)),
]


@pytest.mark.parametrize("gname,gen", GENERATORS)
@pytest.mark.parametrize("window,maxref,minint", [
    (7, 3, 4),
    (0, 0, 2),
    (2, 1, 0),
    (4, 10**9, 3),
    (1, 0, 1),
])
def test_device_encode_matches_host(tmp_path, gname, gen, window, maxref, minint):
    g = gen()
    if g.num_arcs() == 0:
        pytest.skip("empty graph handled by host path")
    _check(
        g, tmp_path, f"{gname}-{window}-{maxref}-{minint}",
        window_size=window, max_ref_count=maxref, min_interval_length=minint,
    )


@pytest.mark.parametrize("codings", [
    {"RESIDUALS": C.GAMMA},
    {"RESIDUALS": C.DELTA},
    {"RESIDUALS": C.ZETA},
    {"RESIDUALS": C.GOLOMB},
    {"RESIDUALS": C.NIBBLE},
    {"OUTDEGREES": C.DELTA, "BLOCKS": C.DELTA, "BLOCK_COUNT": C.UNARY, "OFFSETS": C.DELTA},
    {"REFERENCES": C.GAMMA, "BLOCK_COUNT": C.DELTA},
])
def test_device_encode_codings(tmp_path, codings):
    from webgraph_tpu.formats.bvgraph import _DEFAULT_CODINGS

    full = dict(_DEFAULT_CODINGS)
    full.update(codings)
    s = BVGraphSettings(codings=full, zeta_k=3, window_size=3, max_ref_count=2, min_interval_length=2)
    g = MutableGraph.erdos_renyi(90, 0.08, seed=3)
    name = "-".join(f"{k}{v}" for k, v in codings.items())
    _check(g, tmp_path, name, settings=s)


def test_device_encode_zeta_k_sweep(tmp_path):
    g = MutableGraph.erdos_renyi(80, 0.1, seed=5)
    for k in (1, 2, 4, 7):
        s = BVGraphSettings(zeta_k=k)
        _check(g, tmp_path, f"zk{k}", settings=s)


def test_device_encode_first_gap_negative(tmp_path):
    # successors far below the node id exercise the zigzag first-gap path
    g = MutableGraph(50)
    for x in range(40, 50):
        for ysucc in (0, 1, 2, 3, x - 1):
            g.add_arc(x, ysucc)
    _check(g.immutable_view(), tmp_path, "neg-first-gap")


def test_device_store_roundtrip(tmp_path):
    g = MutableGraph.erdos_renyi(150, 0.05, seed=13)
    base = str(tmp_path / "dev")
    E.store_device(g, base)
    bv = BVGraph.load(base)
    off, succ = g.to_csr()
    off2, succ2 = bv.to_csr()
    np.testing.assert_array_equal(np.asarray(off, dtype=np.int64), np.asarray(off2, dtype=np.int64))
    np.testing.assert_array_equal(succ, succ2)


@pytest.mark.slow
def test_device_encode_cnr2000_bytes():
    cnr = "/root/reference/slow/it/unimi/dsi/webgraph/cnr-2000"
    if not os.path.exists(cnr + ".graph"):
        pytest.skip("cnr-2000 fixture not available")
    bv = BVGraph.load(cnr)
    offsets, succ = bv.to_csr()
    s = bv.settings
    dgb, gbits, _dob, _obits, stats = E.encode_device(offsets, succ, s)
    with open(cnr + ".graph", "rb") as f:
        ref = f.read()
    assert dgb == ref, "device re-encode of cnr-2000 is not byte-identical"
