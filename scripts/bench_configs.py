#!/usr/bin/env python
"""BASELINE.json benchmark configs 1-5 (one JSON line per config).

  1. default compress + decompress, cnr-2000 (zeta_3, w=7, maxref=3)
  2. code sweep: gamma/delta/zeta_k residual coding x window 0 / 7
  3. deep reference chains + intervalization: synthetic deep-chain graph,
     maxref=inf, min-interval sweep (uk-2002 is not redistributable in-repo;
     the synthetic graph reproduces the regime: long same-prefix lists)
  4. transpose + Gray/lex permutation + recompress
  5. device random-access successor queries + adjacency (BatchQuery)
  6. er-200k synthetic streaming-kernel decode (second on-chip datapoint)

Configs 1-4 exercise the host compression pipeline (the production
compress path, optionally the native C++ codec); configs 5-6 run on
jax.devices().  Results MERGE into BENCH_CONFIGS.json keyed by config
(a partial run never destroys other configs' rows).

Usage: python scripts/bench_configs.py [1 2 3 4 5 6]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CNR = "/root/reference/slow/it/unimi/dsi/webgraph/cnr-2000"
OUT = []


def emit(rec):
    print(json.dumps(rec), flush=True)
    OUT.append(rec)


def load_cnr():
    from webgraph_tpu.formats.bvgraph import BVGraph
    from webgraph_tpu.formats import bvgraph_np
    from webgraph_tpu.graph.csr import CSRGraph

    bv = BVGraph.load(CNR)
    off, succ = bvgraph_np.decode_to_csr(bv)
    return bv, CSRGraph(off, succ)


def time_store(g, tmp, **kw):
    from webgraph_tpu.formats.bvgraph import BVGraph

    base = os.path.join(tmp, "g")
    t0 = time.perf_counter()
    stats = BVGraph.store(g, base, **kw)
    dt = time.perf_counter() - t0
    return base, stats, dt


def config1():
    from webgraph_tpu.formats import bvgraph_np
    from webgraph_tpu.formats.bvgraph import BVGraph

    bv, g = load_cnr()
    m = g.num_arcs()
    with tempfile.TemporaryDirectory() as tmp:
        base, stats, enc_t = time_store(g, tmp, min_interval_length=3)
        bv2 = BVGraph.load(base)
        t0 = time.perf_counter()
        bvgraph_np.decode_to_csr(bv2)
        dec_t = time.perf_counter() - t0
        emit({
            "config": 1,
            "metric": "cnr-2000 default compress+decompress (host)",
            "encode_Medges_s": round(m / enc_t / 1e6, 2),
            "decode_Medges_s": round(m / dec_t / 1e6, 2),
            "bits_per_link": float(stats["bitsperlink"]),
        })


def config2():
    from webgraph_tpu.bits import codes as C
    from webgraph_tpu.formats.bvgraph import BVGraphSettings

    bv, g = load_cnr()
    m = g.num_arcs()
    rows = []
    for name, coding, k in (("gamma", C.GAMMA, 3), ("delta", C.DELTA, 3),
                            ("zeta3", C.ZETA, 3), ("zeta5", C.ZETA, 5)):
        for w in (0, 7):
            st = BVGraphSettings(
                window_size=w, max_ref_count=3 if w else 0,
                min_interval_length=3, zeta_k=k)
            st.codings["RESIDUALS"] = coding
            with tempfile.TemporaryDirectory() as tmp:
                base, stats, enc_t = time_store(g, tmp, settings=st)
                rows.append({
                    "residuals": name, "window": w,
                    "bits_per_link": float(stats["bitsperlink"]),
                    "encode_Medges_s": round(m / enc_t / 1e6, 2),
                })
    emit({"config": 2, "metric": "cnr-2000 code sweep (residual coding x window)",
          "rows": rows})


def deep_chain_graph(n=60000, period=37):
    from webgraph_tpu.graph.csr import CSRGraph

    lists = []
    for x in range(n // 2):
        lists.append(sorted(set(range(0, 1 + x % period))
                            | {n - 1 - (x % 5), n // 2 + (x % 97)}))
    return CSRGraph.from_lists(lists + [[]] * (n - n // 2))


def config3():
    g = deep_chain_graph()
    m = g.num_arcs()
    rows = []
    for minint in (0, 2, 4, 8):
        with tempfile.TemporaryDirectory() as tmp:
            base, stats, enc_t = time_store(
                g, tmp, window_size=7, max_ref_count=2**31 - 1,
                min_interval_length=minint)
            rows.append({
                "min_interval": minint,
                "bits_per_link": float(stats["bitsperlink"]),
                "avgref": float(stats.get("avgref", 0)),
                "encode_Medges_s": round(m / enc_t / 1e6, 2),
            })
    emit({"config": 3,
          "metric": "deep-chain synthetic (maxref=inf, minint sweep)",
          "n": g.num_nodes(), "m": m, "rows": rows})


def config4():
    from webgraph_tpu.transform.transform import (
        gray_code_permutation, lexicographical_permutation, map_graph,
        transpose)

    bv, g = load_cnr()
    m = g.num_arcs()
    t0 = time.perf_counter()
    gt = transpose(g)
    t_transpose = time.perf_counter() - t0
    rows = [{"step": "transpose", "Medges_s": round(m / t_transpose / 1e6, 2)}]
    for name, permfn in (("gray", gray_code_permutation),
                         ("lex", lexicographical_permutation)):
        t0 = time.perf_counter()
        perm = permfn(g)
        t_perm = time.perf_counter() - t0
        t0 = time.perf_counter()
        gp = map_graph(g, perm)
        t_map = time.perf_counter() - t0
        with tempfile.TemporaryDirectory() as tmp:
            base, stats, enc_t = time_store(gp, tmp, min_interval_length=3)
        rows.append({
            "step": f"{name}-permute+recompress",
            "perm_s": round(t_perm, 2), "map_s": round(t_map, 2),
            "encode_Medges_s": round(m / enc_t / 1e6, 2),
            "bits_per_link": float(stats["bitsperlink"]),
        })
    emit({"config": 4, "metric": "cnr-2000 transpose + permute + recompress",
          "rows": rows})


def config5():
    """Batched random access through the streaming (v6) kernel: one query
    ancestor-closure per lane, 1024 queries per invocation, verified
    against the host oracle (pallas/query2.py; reference successors(x)
    random access, BVGraph.java:853-888)."""
    import jax
    import jax.numpy as jnp

    from webgraph_tpu.formats.bvgraph import BVGraph
    from webgraph_tpu.pallas import decode2 as D2
    from webgraph_tpu.pallas.query2 import QueryPlanner
    from webgraph_tpu.formats import bvgraph_np

    MULT = 2654435761
    bv = BVGraph.load(CNR)
    n = bv.num_nodes()
    toff, tsucc = bvgraph_np.decode_to_csr(bv)
    qp = QueryPlanner(bv)
    rng = np.random.default_rng(3)
    Q = 1024
    nodes = rng.integers(0, n, size=Q)
    cfg, meta, words, row_off, counts = qp.plan(nodes)
    fn = D2._compiled2(cfg, jax.default_backend() == "cpu")

    w = np.zeros((Q, cfg.slabw), dtype=np.uint32)
    expect = 0
    for i, x in enumerate(nodes):
        d = int(counts[i])
        pos = np.arange(d, dtype=np.uint64)
        wv = (((i * 131071 + pos) * MULT + 1) & 0xFFFFFFFF).astype(np.uint32)
        w[i, row_off[i] : row_off[i] + d] = wv
        expect = (expect + int((tsucc[toff[x] : toff[x] + d]
                                .astype(np.uint64)
                                * wv.astype(np.uint64)).sum())) & 0xFFFFFFFF

    @jax.jit
    def f(meta, words, w, salt):
        slab, wp, dbg, dump = fn(meta, words)
        return jnp.sum(slab.astype(jnp.uint32) * w,
                       dtype=jnp.uint32) + salt

    m_j, w_j, ww_j = jnp.asarray(meta), jnp.asarray(words), jnp.asarray(w)
    s0 = int(np.uint32(f(m_j, w_j, ww_j, jnp.uint32(0))))
    assert s0 == expect, "query checksum mismatch"
    triv = jax.jit(lambda x: x + 1)
    int(triv(jnp.uint32(0)))
    t0 = time.perf_counter()
    for k in range(5):
        int(triv(jnp.uint32(k)))
    over = (time.perf_counter() - t0) / 5
    best = float("inf")
    for rep in range(1, 6):
        t0 = time.perf_counter()
        s = int(np.uint32(f(m_j, w_j, ww_j, jnp.uint32(rep))))
        assert s == (expect + rep) % (1 << 32)
        best = min(best, time.perf_counter() - t0)
    eff = max(best - over, 1e-9)
    emit({
        "config": 5,
        "metric": "batched random-access successors, streaming kernel "
                  "(cnr-2000, salted-checksum verified)",
        "backend": jax.default_backend(),
        "batch": Q,
        "ns_per_node": round(eff / Q * 1e9, 1),
        "nodes_per_s": round(Q / eff, 1),
    })


def _timed_streaming_decode(bv, toff, tsucc, reps=5):
    """Salted-checksum timing of a full streaming-kernel decode (the
    methodology of bench.py / CLAUDE.md); returns (seconds, plan)."""
    import jax
    import jax.numpy as jnp

    from webgraph_tpu.pallas import decode2 as D2

    MULT = 2654435761
    cfg, plan, meta, words = D2.prepare2(bv)
    n, m = plan.n, plan.m
    fn = D2._compiled2(cfg, jax.default_backend() == "cpu")
    w = np.zeros((D2.LANES, cfg.slabw), dtype=np.uint32)
    d = np.diff(toff).astype(np.int64)
    gpos = np.arange(m, dtype=np.uint64)
    wv = ((gpos * MULT + 1) & 0xFFFFFFFF).astype(np.uint32)
    take = np.repeat(plan.prow[:n], d) + (gpos.astype(np.int64)
                                          - np.repeat(toff[:n], d))
    w.reshape(-1)[take] = wv
    expect = int((tsucc.astype(np.uint64) * wv.astype(np.uint64)).sum()
                 & 0xFFFFFFFF)

    @jax.jit
    def f(meta, words, w, salt):
        slab, wp, dbg, dump = fn(meta, words)
        return jnp.sum(slab.astype(jnp.uint32) * w,
                       dtype=jnp.uint32) + salt, wp

    m_j, w_j, ww_j = jnp.asarray(meta), jnp.asarray(words), jnp.asarray(w)
    s0, wp = f(m_j, w_j, ww_j, jnp.uint32(0))
    assert np.array_equal(np.asarray(wp).reshape(-1), plan.exp_wp)
    assert int(np.uint32(s0)) == expect
    triv = jax.jit(lambda x: x + 1)
    int(triv(jnp.uint32(0)))
    t0 = time.perf_counter()
    for k in range(5):
        int(triv(jnp.uint32(k)))
    over = (time.perf_counter() - t0) / 5
    best = 1e9
    for rep in range(1, reps + 1):
        t0 = time.perf_counter()
        s, _ = f(m_j, w_j, ww_j, jnp.uint32(rep))
        assert int(np.uint32(s)) == (expect + rep) % (1 << 32)
        best = min(best, time.perf_counter() - t0)
    return max(best - over, 1e-9), plan


def config6():
    """Second on-chip decode datapoint: er-200k synthetic (near-zero copy
    chains — the kernel's balanced-input ceiling), streaming kernel,
    salted-checksum verified."""
    import jax

    from webgraph_tpu.formats import bvgraph_np
    from webgraph_tpu.formats.bvgraph import BVGraph
    from webgraph_tpu.graph.builders import MutableGraph

    base = "/tmp/er200k/g"
    if not os.path.exists(base + ".graph"):
        os.makedirs("/tmp/er200k", exist_ok=True)
        g = MutableGraph.erdos_renyi(200_000, m=2_000_000, seed=42)
        BVGraph.store(g, base)
    bv = BVGraph.load(base)
    toff, tsucc = bvgraph_np.decode_to_csr(bv)
    eff, plan = _timed_streaming_decode(bv, toff, tsucc)
    emit({
        "config": 6,
        "metric": "er-200k synthetic decode, streaming kernel (second "
                  "on-chip datapoint; salted-checksum verified)",
        "backend": jax.default_backend(),
        "n": plan.n, "m": plan.m,
        "decode_ms": round(eff * 1e3, 2),
        "decode_Medges_s": round(plan.m / eff / 1e6, 1),
    })


def main():
    which = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4, 5, 6]
    for c in which:
        globals()[f"config{c}"]()
    # merge-update keyed by config: never destroy rows from other runs
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_CONFIGS.json")
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    merged[rec.get("config")] = rec
    for rec in OUT:
        merged[rec.get("config")] = rec
    with open(path, "w") as f:
        for key in sorted(merged, key=lambda k: (k is None, k)):
            f.write(json.dumps(merged[key]) + "\n")


if __name__ == "__main__":
    main()
