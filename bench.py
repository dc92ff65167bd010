#!/usr/bin/env python
"""Benchmark entry point: BVGraph decode throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: steady-state full-graph decode of cnr-2000 (bitstream in device
memory -> per-lane successor slab + exact row pointers) by the v6
streaming lane-range Pallas decoder (pallas/decode2.py), edges/second.

Verification is UNCONDITIONAL: the host oracle (formats/bvgraph_np, itself
tested bit-exact against the Java-documented format) decodes the graph
first (cached across runs), and every timed repetition folds a
position-weighted, salted checksum of the decoded successors in-program
over exactly the real (non-padding) slab slots; the fetched scalar must
equal the oracle's.  This both forces completion on the fully-asynchronous
axon backend (block_until_ready does not wait) and proves each rep was a
distinct, correct execution.  The ~25 ms dispatch+fetch round trip is
measured separately and subtracted.

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
    from webgraph_tpu.pallas import decode2 as D2

    bv = BVGraph.load(CNR)
    toff, tsucc = truth_arrays(bv)

    cfg, plan, meta, words = D2.prepare2(bv)
    n, m = plan.n, plan.m
    pallas_fn = D2._compiled2(cfg, jax.default_backend() == "cpu")

    # position-weighted checksum over exactly the real slab slots
    w = np.zeros((D2.LANES, cfg.slabw), dtype=np.uint32)
    d = np.diff(toff).astype(np.int64)
    gpos = np.arange(m, dtype=np.uint64)
    wv = ((gpos * MULT + 1) & 0xFFFFFFFF).astype(np.uint32)
    take = np.repeat(plan.prow[:n], d) + (
        gpos.astype(np.int64) - np.repeat(toff[:n], d))
    w.reshape(-1)[take] = wv
    expect = int((tsucc.astype(np.uint64) * wv.astype(np.uint64)).sum()
                 & 0xFFFFFFFF)

    @jax.jit
    def fn(meta, words, w, salt):
        slab, wp, dbg, dump = pallas_fn(meta, words)
        chk = jnp.sum(slab.astype(jnp.uint32) * w, dtype=jnp.uint32)
        return chk + salt, wp

    # R decodes inside ONE program: per-iteration salt lands in an unused
    # meta row so every iteration is a distinct computation (XLA cannot
    # hoist it), and the accumulated checksum still proves all R ran
    # correctly.  Needed because one decode is now of the same order as
    # the ~27 ms dispatch+fetch round trip on this backend.
    R = 8

    @jax.jit
    def fnR(meta, words, w, salt):
        def body(i, acc):
            m2 = meta.at[31, 0, 0].set(salt + i)
            slab, wp, dbg, dump = pallas_fn(m2, words)
            return acc + jnp.sum(slab.astype(jnp.uint32) * w,
                                 dtype=jnp.uint32)
        return jax.lax.fori_loop(0, R, body, jnp.uint32(0))

    meta_j, words_j, w_j = (jnp.asarray(a) for a in (meta, words, w))

    # warm-up / compile + UNCONDITIONAL truth check
    s0, wp = fn(meta_j, words_j, w_j, jnp.uint32(0))
    s0 = int(np.uint32(s0))
    assert np.array_equal(np.asarray(wp).reshape(-1), plan.exp_wp), \
        "lane emission counts disagree with the plan"
    assert s0 == expect, f"decode checksum mismatch: {s0} vs {expect}"

    # dispatch+fetch overhead
    triv = jax.jit(lambda x: x + 1)
    int(triv(jnp.uint32(0)))
    t0 = time.perf_counter()
    for k in range(5):
        int(triv(jnp.uint32(k)))
    overhead = (time.perf_counter() - t0) / 5

    expectR = (R * expect) % (1 << 32)
    int(np.uint32(fnR(meta_j, words_j, w_j, jnp.uint32(0))))  # compile
    best = float("inf")
    for rep in range(1, 4):
        # distinct salts per repetition: every kernel execution is a
        # distinct computation (the salt rides in an unused meta row)
        t0 = time.perf_counter()
        s = int(np.uint32(fnR(meta_j, words_j, w_j, jnp.uint32(rep * R))))
        dt = time.perf_counter() - t0
        best = min(best, dt)
        assert s == expectR, "salted checksum mismatch"

    eff = max((best - overhead) / R, 1e-9)
    edges_per_sec = m / eff

    print(
        json.dumps(
            {
                "metric": "cnr-2000 full decode throughput (streaming lane-range Pallas kernel, verified vs oracle)",
                "value": round(edges_per_sec / 1e6, 2),
                "unit": "Medges/s",
                "vs_baseline": round(edges_per_sec / JAVA_SINGLE_CORE_EDGES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
