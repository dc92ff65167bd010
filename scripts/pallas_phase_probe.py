#!/usr/bin/env python
"""On-chip per-phase timing of the in-kernel decoder (cnr-2000).

Compiles kernel variants with phases stubbed out (KernelCfg.phase_mask) and
times each; differences isolate phase costs.  Partial variants produce
garbage output — timing only, checksum ignored (the scalar fetch still
forces completion; the salt makes every rep a distinct execution).

Usage: python scripts/pallas_phase_probe.py [mask ...]   (default 8 9 11 15)
"""
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CNR = "/root/reference/slow/it/unimi/dsi/webgraph/cnr-2000"


def main():
    import jax
    import jax.numpy as jnp

    from webgraph_tpu.formats.bvgraph import BVGraph
    from webgraph_tpu.pallas import decode as D

    masks = [int(a) for a in sys.argv[1:]] or [8, 9, 11, 15]
    bv = BVGraph.load(CNR)
    cfg0, plan, meta, offs, words = D.prepare(bv)
    meta, offs, words = jnp.asarray(meta), jnp.asarray(offs), jnp.asarray(words)

    triv = jax.jit(lambda x: x + 1)
    int(triv(jnp.uint32(0)))
    t0 = time.perf_counter()
    for i in range(5):
        int(triv(jnp.uint32(i)))
    overhead = (time.perf_counter() - t0) / 5
    print(f"dispatch overhead {overhead*1e3:.1f} ms")

    results = {}
    for mask in masks:
        cfg = replace(cfg0, phase_mask=mask)
        pallas_fn = D._compiled(cfg, False)

        @jax.jit
        def fn(meta, offs, words, salt):
            offs_out, succ = pallas_fn(meta, offs, words)
            s = succ.reshape(-1).astype(jnp.uint32)
            i = jnp.arange(s.shape[0], dtype=jnp.uint32)
            return jnp.sum(s * (i + salt), dtype=jnp.uint32) + jnp.sum(
                offs_out.astype(jnp.uint32), dtype=jnp.uint32)

        t0 = time.perf_counter()
        int(np.uint32(fn(meta, offs, words, jnp.uint32(0))))
        print(f"mask={mask:2d} first run {time.perf_counter()-t0:.1f}s")
        best = float("inf")
        for rep in range(1, 4):
            t0 = time.perf_counter()
            int(np.uint32(fn(meta, offs, words, jnp.uint32(rep))))
            best = min(best, time.perf_counter() - t0)
        eff = best - overhead
        results[mask] = eff
        print(f"mask={mask:2d}: eff {eff*1e3:.1f} ms")

    print("\nphase costs (differences):")
    if 8 in results:
        print(f"  P1a+fixed  : {results[8]*1e3:.1f} ms")
    if 9 in results and 8 in results:
        print(f"  P1b        : {(results[9]-results[8])*1e3:.1f} ms")
    if 11 in results and 9 in results:
        print(f"  P2         : {(results[11]-results[9])*1e3:.1f} ms")
    if 15 in results and 11 in results:
        print(f"  P3         : {(results[15]-results[11])*1e3:.1f} ms")


if __name__ == "__main__":
    main()
