#!/usr/bin/env python
"""Interpret-mode smoke test of the in-kernel Pallas decoder."""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from webgraph_tpu.formats.bvgraph import BVGraph
from webgraph_tpu.graph.builders import MutableGraph
from webgraph_tpu.pallas import decode as D


def check(name, g, bv, lanes=1024, **kw):
    toff, tsucc = g.to_csr()
    try:
        offsets, succ = D.decode_to_csr(bv, interpret=True, lanes=lanes, **kw)
    except Exception as e:  # noqa: BLE001
        import traceback

        traceback.print_exc()
        print(f"[FAIL-EXC] {name}: {type(e).__name__}")
        return False
    ok_off = np.array_equal(offsets, toff)
    ok_succ = np.array_equal(succ, tsucc)
    if ok_off and ok_succ:
        print(f"[ok] {name}")
        return True
    print(f"[FAIL] {name}: offsets={'ok' if ok_off else 'BAD'} succ={'ok' if ok_succ else 'BAD'}")
    if not ok_off:
        bad = np.flatnonzero(offsets != toff)
        print("  first bad offsets at nodes", bad[:10], offsets[bad[:5]], toff[bad[:5]])
    if not ok_succ:
        bad = np.flatnonzero(succ != tsucc)
        print("  first bad succ at arcs", bad[:10])
        print("  got:", succ[bad[0] - 3 : bad[0] + 8])
        print("  exp:", tsucc[bad[0] - 3 : bad[0] + 8])
    return False


def main():
    cases = [
        ("er50-w0", 50, 0.08, dict(window_size=0, max_ref_count=0, min_interval_length=4), 1024),
        ("er50-w1-nomerge", 50, 0.08, dict(window_size=1, max_ref_count=1, min_interval_length=0), 1024),
        ("er80-w7", 80, 0.08, dict(window_size=7, max_ref_count=3, min_interval_length=4), 1024),
        ("er300-default", 300, 0.03, dict(), 1024),
        ("er300-multiblock", 300, 0.03, dict(), 64),
        ("er200-minint3", 200, 0.08, dict(min_interval_length=3), 1024),
        ("er150-w1", 150, 0.05, dict(window_size=1, max_ref_count=1, min_interval_length=0), 1024),
        ("er250-w2", 250, 0.04, dict(window_size=2, max_ref_count=2, min_interval_length=2), 1024),
        ("er400-w7m7", 400, 0.02, dict(window_size=7, max_ref_count=7, min_interval_length=2), 1024),
        ("er400-multiblock", 400, 0.02, dict(window_size=7, max_ref_count=7, min_interval_length=2), 96),
    ]
    sel = sys.argv[1:] or None
    nfail = 0
    for name, n, p, kw, lanes in cases:
        if sel and not any(s in name for s in sel):
            continue
        g = MutableGraph.erdos_renyi(n, p, seed=sum(map(ord, name)) % 1000)
        with tempfile.TemporaryDirectory() as td:
            basename = os.path.join(td, "g")
            BVGraph.store(g, basename, **kw)
            bv = BVGraph.load(basename)
            if not check(name, g, bv, lanes=lanes):
                nfail += 1
    print("FAILURES:", nfail)
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
