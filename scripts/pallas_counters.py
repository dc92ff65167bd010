#!/usr/bin/env python
"""On-chip trip/refetch counter probe for the in-kernel decoder (cnr-2000).

Compiles the kernel with KernelCfg.debug_counters=True; per-block SMEM
counters are exported and summed on the host.  The timing of this variant
also bounds the counter overhead.

Usage: python scripts/pallas_counters.py [small|cnr]
"""
import os
import sys
import tempfile
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CNR = "/root/reference/slow/it/unimi/dsi/webgraph/cnr-2000"
NAMES = ["p1b_trips", "p2_trips", "p3_trips", "p3_cq_refetch",
         "p3_eq_refetch", "p3_rq_refetch", "flushes", "p1a_code_trips"]


def main():
    import jax
    import jax.numpy as jnp

    from webgraph_tpu.formats.bvgraph import BVGraph
    from webgraph_tpu.pallas import decode as D

    which = sys.argv[1] if len(sys.argv) > 1 else "cnr"
    if which == "small":
        from webgraph_tpu.graph.builders import MutableGraph

        g = MutableGraph.erdos_renyi(300, 0.03, seed=0)
        td = tempfile.mkdtemp()
        BVGraph.store(g, td + "/g")
        bv = BVGraph.load(td + "/g")
    else:
        bv = BVGraph.load(CNR)

    cfg0, plan, meta, offs, words = D.prepare(bv)
    cfg = replace(cfg0, debug_counters=True)
    interp = jax.default_backend() == "cpu"
    pallas_fn = D._compiled(cfg, interp)

    @jax.jit
    def fn(meta, offs, words, salt):
        offs_out, succ, stats = pallas_fn(meta, offs, words)
        chk = jnp.sum(succ.reshape(-1).astype(jnp.uint32) + salt,
                      dtype=jnp.uint32)
        return chk, jnp.sum(stats.astype(jnp.int64).reshape(
            stats.shape[0], -1), axis=0)

    meta, offs, words = jnp.asarray(meta), jnp.asarray(offs), jnp.asarray(words)
    t0 = time.perf_counter()
    chk, stats = fn(meta, offs, words, jnp.uint32(0))
    stats = np.asarray(stats)
    print(f"first run {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    chk, _ = fn(meta, offs, words, jnp.uint32(1))
    int(chk)
    print(f"rep (incl fetch): {(time.perf_counter()-t0)*1e3:.1f} ms")
    total = dict(zip(NAMES, stats[:8].tolist()))
    for k, v in total.items():
        print(f"  {k:16s} {v}")
    m = plan.m
    tt = total["p1b_trips"] + total["p2_trips"] + total["p3_trips"] + total["p1a_code_trips"]
    print(f"  total loop trips {tt}  ({m/max(tt,1):.1f} edges/trip)")


if __name__ == "__main__":
    main()
