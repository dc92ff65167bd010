"""cnr-2000 on-chip timing of the v6 streaming decoder (decode2).

Salted dependent-scalar-fetch methodology (CLAUDE.md): every rep folds a
position-weighted checksum of the slab in-program; the fetched scalar must
match the host oracle's expectation.  Run with the default env (axon TPU).

Usage: python scripts/v6_chip.py [--counters]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from webgraph_tpu.formats.bvgraph import BVGraph
from webgraph_tpu.pallas import decode2 as D2

MULT = 2654435761
CNR = "/root/reference/slow/it/unimi/dsi/webgraph/cnr-2000"


def main():
    counters = "--counters" in sys.argv
    bv = BVGraph.load(CNR)
    cfg, plan, meta, words = D2.prepare2(bv, debug_counters=counters)
    print(f"cfg: lw={cfg.lw} slabw={cfg.slabw} sb={cfg.sb} "
          f"need={cfg.need_bits} cap={cfg.trip_cap} max_steps={plan.max_steps}")

    # oracle truth + slab weight mask
    z = np.load("/tmp/cnr-2000-truth2.npz")
    toff, tsucc = z["off"], z["succ"]
    n, m = plan.n, plan.m
    w = np.zeros((D2.LANES, cfg.slabw), dtype=np.uint32)
    d = np.diff(toff).astype(np.int64)
    gpos = np.arange(m, dtype=np.uint64)
    wv = ((gpos * MULT + 1) & 0xFFFFFFFF).astype(np.uint32)
    take = np.repeat(plan.prow[:n], d) + (gpos.astype(np.int64)
                                          - np.repeat(toff[:n], d))
    w.reshape(-1)[take] = wv
    expect = int((tsucc.astype(np.uint64) * wv.astype(np.uint64)).sum()
                 & 0xFFFFFFFF)

    pallas_fn = D2._compiled2(cfg, False)

    @jax.jit
    def fn(meta, words, w, salt):
        slab, wp, dbg, dump = pallas_fn(meta, words)
        chk = jnp.sum(slab.astype(jnp.uint32) * w, dtype=jnp.uint32)
        return chk + salt, wp, dbg

    meta_j, words_j, w_j = jnp.asarray(meta), jnp.asarray(words), jnp.asarray(w)
    t0 = time.time()
    s0, wp, dbg = fn(meta_j, words_j, w_j, jnp.uint32(0))
    s0 = int(np.uint32(s0))
    print(f"first run (compile) {time.time()-t0:.1f}s")
    wp = np.asarray(wp).reshape(-1)
    ok_wp = np.array_equal(wp, plan.exp_wp)
    print("lane wp ok:", ok_wp, " checksum:", s0 == expect,
          f"({s0} vs {expect})")
    dbg = np.asarray(dbg).reshape(-1)
    if counters:
        print(f"trips={dbg[8]} sdump_ev={dbg[1]} flush_ev={dbg[2]} "
              f"cfetch_ev={dbg[3]} wfetch_ev={dbg[4]} sfetch_ev={dbg[5]} "
              f"far_fires={dbg[6]}")
    else:
        print("trips:", dbg[0])
    if not (ok_wp and s0 == expect):
        bad = np.flatnonzero(wp != plan.exp_wp)[:8]
        print("bad lanes:", bad, wp[bad], plan.exp_wp[bad])
        return

    triv = jax.jit(lambda x: x + 1)
    int(triv(jnp.uint32(0)))
    t0 = time.perf_counter()
    for k in range(5):
        int(triv(jnp.uint32(k)))
    over = (time.perf_counter() - t0) / 5
    best = 1e9
    for rep in range(1, 6):
        t0 = time.perf_counter()
        s, _, _ = fn(meta_j, words_j, w_j, jnp.uint32(rep))
        s = int(np.uint32(s))
        dt = time.perf_counter() - t0
        assert s == (expect + rep) % (1 << 32), "salted checksum mismatch"
        best = min(best, dt)
    eff = max(best - over, 1e-9)
    print(f"decode: {eff*1e3:.2f} ms  = {m/eff/1e6:.1f} Medges/s  "
          f"(overhead {over*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
