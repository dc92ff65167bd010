"""In-kernel (Pallas) BVGraph decoder vs the scalar oracle.

Runs the Mosaic kernel in interpret mode on CPU; the scalar codec
(bits/bitstream.py) produced the stored fixture, and ``MutableGraph.to_csr``
is the ground truth (same oracle structure as tests/test_bvgraph_jax.py).
"""

import os

import numpy as np
import pytest

from webgraph_tpu.formats.bvgraph import BVGraph
from webgraph_tpu.graph.builders import MutableGraph
from webgraph_tpu.graph.csr import CSRGraph

jax = pytest.importorskip("jax")

from webgraph_tpu.pallas import decode as D  # noqa: E402


def _roundtrip(g, tmp_path, lanes=1024, **store_kw):
    basename = os.path.join(tmp_path, "g")
    BVGraph.store(g, basename, **store_kw)
    bv = BVGraph.load(basename)
    offsets, succ = D.decode_to_csr(bv, interpret=True, lanes=lanes)
    toff, tsucc = g.to_csr()
    np.testing.assert_array_equal(offsets, toff)
    np.testing.assert_array_equal(succ, tsucc)


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
def test_pallas_decode_matches_oracle(window, maxref, minint, seed, n, p, tmp_path):
    g = MutableGraph.erdos_renyi(n, p, seed=seed)
    _roundtrip(
        g, tmp_path,
        window_size=window, max_ref_count=maxref, min_interval_length=minint,
    )


def test_pallas_decode_multiblock(tmp_path):
    """Several grid blocks: exercises halo priming + CSR carry rows."""
    g = MutableGraph.erdos_renyi(400, 0.03, seed=11)
    _roundtrip(g, tmp_path, lanes=96)


def test_pallas_decode_structures(tmp_path):
    """Interval- and copy-rich lists (same fixture as the XLA decoder)."""
    lists = []
    for x in range(120):
        base = list(range(x + 1, x + 20)) + [200 + (x % 7), 300 + 2 * (x % 11)]
        lists.append(sorted(set(v for v in base if v < 400)))
    g = CSRGraph.from_lists(lists + [[]] * 280)
    _roundtrip(g, tmp_path)


def test_pallas_decode_deep_chains(tmp_path):
    """maxref far beyond the reference default (VERDICT: deep-chain gap):
    long same-prefix lists force reference chains limited only by maxref."""
    lists = []
    for x in range(200):
        lists.append(sorted(set(range(0, 1 + x % 37)) | {399 - (x % 5)}))
    g = CSRGraph.from_lists(lists + [[]] * 200)
    _roundtrip(g, tmp_path, window_size=7, max_ref_count=100,
               min_interval_length=2)


def test_pallas_decode_empty_and_single(tmp_path):
    lists = [[], [0], [], [1, 2], []]
    g = CSRGraph.from_lists(lists)
    _roundtrip(g, tmp_path)


def test_need_bits_scales_with_n_and_threads_into_p2(tmp_path):
    """ADVICE r2 (medium): _p2_extras hardcoded NEED=48 window bits; codes
    can span up to 2*bitlen(2n)+1 > 48 once n >= ~2^23.  need_bits must
    come from the config — checked structurally for large n, and the
    kernel must still decode exactly when forced to the maximum need."""
    from dataclasses import replace

    from webgraph_tpu.pallas import decode as D
    from webgraph_tpu.pallas.plan import plan_blocks, scan_structure

    # structural: a plan for a large-n graph must demand > 48 bits
    class FakePlan:
        n = 1 << 24
        max_d = 4
        halo_arcs = 128
        pool_arcs = 16384
        extra_arcs = 128
        runs_pairs = 8
        max_bc = 2
        max_ic = 2
        max_depth = 1
        num_blocks = 0
        window_words = 4096
        m = 0
        csr_start = np.zeros(0, dtype=np.int64)

    g = MutableGraph.erdos_renyi(50, 0.1, seed=0)
    basename = os.path.join(tmp_path, "g")
    BVGraph.store(g, basename)
    bv = BVGraph.load(basename)
    cfg_big = D.make_cfg(bv, FakePlan())
    assert cfg_big.need_bits > 48

    # behavioural: decoding with the maximal need threads through P2
    cfg, plan, meta, offs, words = D.prepare(bv)
    fn = D._compiled(replace(cfg, need_bits=64), True)
    offs_out, succ = fn(meta, offs, words)
    toff, tsucc = g.to_csr()
    got = np.asarray(succ).reshape(-1)[: plan.m]
    np.testing.assert_array_equal(got.astype(np.int32), tsucc)
