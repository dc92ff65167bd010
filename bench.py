#!/usr/bin/env python
"""Benchmark entry point: BVGraph decode throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: steady-state full-graph decode of cnr-2000 (bitstream + offsets in
device HBM -> CSR successor arrays in device HBM) by the in-kernel
Pallas/Mosaic decoder, edges/second.

Verification is UNCONDITIONAL: the host oracle (formats/bvgraph_np, itself
tested bit-exact against the Java-documented format) decodes the graph
first (cached across runs), and every timed repetition folds a
position-weighted, salted checksum of the decoded successors + CSR offsets
in-program; the fetched scalar must equal the oracle's.  This both forces
completion on the fully-asynchronous axon backend (block_until_ready does
not wait) and proves each rep was a distinct, correct execution.  The
~25 ms dispatch+fetch round trip is measured separately and subtracted.

Baseline: the reference Java BVGraph sequential scan on one CPU core.  The
reference repo publishes no numbers (BASELINE.md); we anchor on the commonly
reported ~4 ns/link for BVGraph sequential enumeration on modern x86 =>
250 M edges/s single core.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

JAVA_SINGLE_CORE_EDGES_PER_SEC = 250e6
CNR = "/root/reference/slow/it/unimi/dsi/webgraph/cnr-2000"
TRUTH_CACHE = "/tmp/cnr-2000-truth2.npz"
MULT = 2654435761  # Knuth multiplicative hash


def truth_arrays(bv):
    import numpy as np

    if os.path.exists(TRUTH_CACHE):
        z = np.load(TRUTH_CACHE)
        return z["off"], z["succ"]
    from webgraph_tpu.formats import bvgraph_np

    toff, tsucc = bvgraph_np.decode_to_csr(bv)
    try:
        np.savez(TRUTH_CACHE, off=toff, succ=tsucc)
    except OSError:
        pass
    return toff, tsucc


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from webgraph_tpu.formats.bvgraph import BVGraph
    from webgraph_tpu.pallas import decode as D

    bv = BVGraph.load(CNR)
    toff, tsucc = truth_arrays(bv)

    cfg, plan, meta, offs, words = D.prepare(bv)
    n, m = plan.n, plan.m
    pallas_fn = D._compiled(cfg, jax.default_backend() == "cpu")

    # host-built per-lane offset weights (0 for invalid lanes)
    nb = plan.num_blocks
    wo = np.zeros((max(nb, 1), D.LANES), dtype=np.uint32)
    for t in range(nb):
        a, c = int(plan.node_start[t]), int(plan.node_count[t])
        ids = np.arange(a, a + c, dtype=np.uint64)
        wo[t, :c] = ((ids * MULT + 7) & 0xFFFFFFFF).astype(np.uint32)

    @jax.jit
    def fn(meta, offs, words, wo, salt):
        offs_out, succ = pallas_fn(meta, offs, words)
        s = succ.reshape(-1).astype(jnp.uint32)
        i = jnp.arange(s.shape[0], dtype=jnp.uint32)
        chk1 = jnp.sum(
            jnp.where(i < m, s * (i * jnp.uint32(MULT) + 1), jnp.uint32(0)),
            dtype=jnp.uint32,
        )
        oo = offs_out.reshape(offs_out.shape[0], -1).astype(jnp.uint32)
        chk2 = jnp.sum(oo * wo, dtype=jnp.uint32)
        return chk1 + chk2 + salt

    # expected checksum from the oracle arrays (order-sensitive)
    i = np.arange(m, dtype=np.uint64)
    w = ((i * MULT + 1) & 0xFFFFFFFF).astype(np.uint64)
    chk1 = int((tsucc.astype(np.uint64) * w).sum() & 0xFFFFFFFF)
    nodes = np.arange(n, dtype=np.uint64)
    won = ((nodes * MULT + 7) & 0xFFFFFFFF).astype(np.uint64)
    chk2 = int((toff[:n].astype(np.uint64) * won).sum() & 0xFFFFFFFF)
    expect = (chk1 + chk2) & 0xFFFFFFFF

    meta, offs, words, wo = (jnp.asarray(a) for a in (meta, offs, words, wo))

    # warm-up / compile + UNCONDITIONAL truth check
    s0 = int(np.uint32(fn(meta, offs, words, wo, jnp.uint32(0))))
    assert s0 == expect, f"decode checksum mismatch: {s0} vs {expect}"

    # dispatch+fetch overhead
    triv = jax.jit(lambda x: x + 1)
    int(triv(jnp.uint32(0)))
    t0 = time.perf_counter()
    for k in range(5):
        int(triv(jnp.uint32(k)))
    overhead = (time.perf_counter() - t0) / 5

    reps = 5
    best = float("inf")
    for rep in range(1, reps + 1):
        t0 = time.perf_counter()
        s = int(np.uint32(fn(meta, offs, words, wo, jnp.uint32(rep))))
        dt = time.perf_counter() - t0
        best = min(best, dt)
        assert s == (expect + rep) % (1 << 32), "salted checksum mismatch"

    eff = max(best - overhead, 1e-9)
    edges_per_sec = m / eff

    print(
        json.dumps(
            {
                "metric": "cnr-2000 full decode throughput (in-kernel Pallas, verified vs oracle)",
                "value": round(edges_per_sec / 1e6, 2),
                "unit": "Medges/s",
                "vs_baseline": round(edges_per_sec / JAVA_SINGLE_CORE_EDGES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
