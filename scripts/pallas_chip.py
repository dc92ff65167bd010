#!/usr/bin/env python
"""On-chip runs of the in-kernel Pallas decoder.

Usage:
  python scripts/pallas_chip.py small   # er-300 verify (compile + correctness)
  python scripts/pallas_chip.py cnr     # cnr-2000 verify + timing

Verification is an ORDER-SENSITIVE salted checksum computed in-program
(device->host bulk pulls are ~10 KB/s on this relay): each successor is
weighted by a position-dependent multiplier, and the block CSR offsets are
folded in with host-built per-lane weights.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CNR = "/root/reference/slow/it/unimi/dsi/webgraph/cnr-2000"
MULT = 2654435761  # Knuth multiplicative hash


def expected_checksum(toff, tsucc, plan, salt=0):
    n, m = plan.n, plan.m
    i = np.arange(m, dtype=np.uint64)
    w = ((i * MULT + 1) & 0xFFFFFFFF).astype(np.uint64)
    chk1 = int((tsucc.astype(np.uint64) * w).sum() & 0xFFFFFFFF)
    # offsets: per valid lane, weight by global node id hash
    nodes = np.arange(n, dtype=np.uint64)
    wo = ((nodes * MULT + 7) & 0xFFFFFFFF).astype(np.uint64)
    chk2 = int((toff[:n].astype(np.uint64) * wo).sum() & 0xFFFFFFFF)
    return (chk1 + chk2 + salt) & 0xFFFFFFFF


def build_fn(bv, interpret=False):
    import jax
    import jax.numpy as jnp

    from webgraph_tpu.pallas import decode as D

    cfg, plan, meta, offs, words = D.prepare(bv)
    pallas_fn = D._compiled(cfg, interpret)
    m = plan.m
    n = plan.n

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

    return fn, (meta, offs, words, wo), plan


def run(bv, toff, tsucc, label, time_it=False):
    import jax
    import jax.numpy as jnp

    fn, args, plan = build_fn(bv, interpret=jax.default_backend() == "cpu")
    meta, offs, words, wo = (jnp.asarray(a) for a in args)

    t0 = time.perf_counter()
    s0 = int(np.uint32(fn(meta, offs, words, wo, jnp.uint32(0))))
    t_first = time.perf_counter() - t0
    exp = expected_checksum(toff, tsucc, plan, 0)
    status = "OK" if s0 == exp else f"MISMATCH got={s0} exp={exp}"
    print(f"[{label}] first run {t_first:.1f}s checksum {status}")
    if not time_it or s0 != exp:
        return s0 == exp

    triv = jax.jit(lambda x: x + 1)
    int(triv(jnp.uint32(0)))
    t0 = time.perf_counter()
    for i in range(5):
        int(triv(jnp.uint32(i)))
    overhead = (time.perf_counter() - t0) / 5
    print(f"[{label}] dispatch overhead {overhead*1e3:.1f} ms")

    best = float("inf")
    for rep in range(1, 6):
        t0 = time.perf_counter()
        s = int(np.uint32(fn(meta, offs, words, wo, jnp.uint32(rep))))
        dt = time.perf_counter() - t0
        assert s == (exp + rep) % (1 << 32), f"salted rep {rep} wrong"
        best = min(best, dt)
        print(f"[{label}] rep {rep}: {dt*1e3:.1f} ms")
    eff = max(best - overhead, 1e-9)
    print(
        f"[{label}] best {best*1e3:.1f} ms, eff {eff*1e3:.1f} ms "
        f"=> {plan.m/eff/1e6:.1f} Medges/s"
    )
    return True


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "small"
    from webgraph_tpu.formats.bvgraph import BVGraph

    if which == "small":
        from webgraph_tpu.graph.builders import MutableGraph

        g = MutableGraph.erdos_renyi(300, 0.03, seed=0)
        with tempfile.TemporaryDirectory() as td:
            basename = os.path.join(td, "g")
            BVGraph.store(g, basename)
            bv = BVGraph.load(basename)
            toff, tsucc = g.to_csr()
            ok = run(bv, toff, tsucc, "er300", time_it=True)
    else:
        bv = BVGraph.load(CNR)
        cache = "/tmp/cnr-2000-truth2.npz"
        if os.path.exists(cache):
            z = np.load(cache)
            toff, tsucc = z["off"], z["succ"]
        else:
            from webgraph_tpu.formats import bvgraph_np

            toff, tsucc = bvgraph_np.decode_to_csr(bv)
            np.savez(cache, off=toff, succ=tsucc)
        ok = run(bv, toff, tsucc, "cnr-2000", time_it=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
